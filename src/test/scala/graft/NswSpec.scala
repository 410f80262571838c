package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** NSW-lite graph-ANN contracts (q198 / the 7th q189 card row): the
  * bounded-degree edge table, the fixed-round frontier expansion's
  * superset chain, and reachability of every returned candidate. */
class NswSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def emb = Tables.load(spark, dir, "embeddings")
  private def queries = emb.filter(col("vec_id") < 4)

  test("nswEdges: bounded degree, no self loops, every edge stays " +
      "within its coarse cluster") {
    val assigned = Similarity.assignToCentroids(emb).persist()
    try {
      val edges = Similarity.nswEdges(assigned, m = 6).persist()
      try {
        assert(edges.filter(col("src") === col("dst")).count() === 0L)
        assert(edges.groupBy(col("src")).count()
          .filter(col("count") > 6).count() === 0L)
        val clus = assigned.select(col("vec_id"), col("cluster"))
        val cross = edges
          .join(clus.select(col("vec_id").as("src"),
            col("cluster").as("cs")), Seq("src"))
          .join(clus.select(col("vec_id").as("dst"),
            col("cluster").as("cd")), Seq("dst"))
          .filter(col("cs") =!= col("cd"))
        assert(cross.count() === 0L)
      } finally { edges.unpersist(); () }
    } finally { assigned.unpersist(); () }
  }

  test("maxPerCluster cap: on a degenerate all-one-cluster corpus the " +
      "candidate side is the hash-first sample (linear fan-out, not " +
      "quadratic), and a cap >= cluster size is exact") {
    import spark.implicits._
    val n = 40
    val cap = 8L
    // all n vectors in ONE cluster — the skew hazard the cap guards
    val assigned = (0 until n).map { i =>
      (i.toLong, Array.tabulate(4)(d => ((i * 7 + d) % 11).toDouble), 0)
    }.toDF("vec_id", "e", "cluster").persist()
    try {
      val capped = Similarity.nswEdgesRanked(assigned, mMax = 6,
        maxPerCluster = cap).persist()
      try {
        // the candidate sample the cap admits: first `cap` ids in
        // (md5(vec_id), vec_id) order
        val sample = assigned
          .select(col("vec_id"),
            md5(col("vec_id").cast("string")).as("h"))
          .orderBy(col("h"), col("vec_id"))
          .limit(cap.toInt)
          .select(col("vec_id")).as[Long].collect().toSet
        // every dst across ALL srcs comes from that sample — the join's
        // candidate side was bounded, so fan-out is n·cap, never n²
        val dsts = capped.select(col("dst")).distinct()
          .as[Long].collect().toSet
        assert(dsts.subsetOf(sample), s"dsts $dsts outside sample $sample")
        // every src still gets edges (degree ≤ min(m, cap-ish))
        assert(capped.select(col("src")).distinct().count() === n.toLong)
        assert(capped.groupBy(col("src")).count()
          .filter(col("count") > 6).count() === 0L)
        // a cap that fits the cluster is EXACT: identical to uncapped
        val wide = Similarity.nswEdgesRanked(assigned, mMax = 6,
          maxPerCluster = n.toLong)
        val bare = Similarity.nswEdgesRanked(assigned, mMax = 6)
        assert(wide.except(bare).count() === 0L)
        assert(bare.except(wide).count() === 0L)
      } finally { capped.unpersist(); () }
    } finally { assigned.unpersist(); () }
  }

  test("expansion is a superset chain in rounds: every candidate " +
      "surfaced at r rounds is still scanned at r+1, so adding rounds " +
      "never loses a scanned candidate; candidate counts respect the " +
      "entries·(1+m+m²) bound") {
    val assigned = Similarity.assignToCentroids(emb).persist()
    try {
      val edges = Similarity.nswEdges(assigned, m = 6).persist()
      try {
        val clus = assigned.select(col("vec_id"), col("cluster"))
        def scanned(rounds: Int) =
          Similarity.nswTopK(queries, emb, edges, clus,
            entries = 2, rounds = rounds, k = 1000)
            .select(col("qid"), col("vec_id"))
        val r0 = scanned(0); val r1 = scanned(1); val r2 = scanned(2)
        assert(r0.except(r1).count() === 0L)
        assert(r1.except(r2).count() === 0L)
        // per-query candidate bound: 2 · (1 + 6 + 36)
        val maxCands = r2.groupBy(col("qid")).count()
          .agg(max(col("count"))).collect()(0).getLong(0)
        assert(maxCands <= 2L * (1 + 6 + 36), s"bound broken: $maxCands")
        // zero rounds returns only entry nodes (≤ entries per query)
        assert(r0.groupBy(col("qid")).count()
          .filter(col("count") > 2).count() === 0L)
      } finally { edges.unpersist(); () }
    } finally { assigned.unpersist(); () }
  }

  test("degree curve: edge sets nest in m (rank filter == standalone " +
      "build), candidate sets form a superset chain, mean recall is " +
      "monotone at the graded geometry, and the m=6 point equals the " +
      "standalone q198 gauge") {
    val sfDir = dir
    val curve = SparkEntry.queries("q201_nsw_degree_curve")(spark, sfDir)
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(rs => (rs.map(_.getLong(3)).sum,
        rs.map(_.getDouble(4)).sum / rs.length)).toMap
    val degrees = curve.keys.toSeq.sorted
    assert(degrees === Seq(2L, 6L, 12L))
    val means = degrees.map(curve(_)._2)
    assert(means === means.sorted, s"mean recall not monotone: $means")
    // per-point equality with the standalone gauge at the operating m
    val standalone = SparkEntry.queries("q198_nsw_lite")(spark, sfDir)
      .agg(sum(col("hits"))).collect()(0).getLong(0)
    assert(curve(6L)._1 === standalone)
    // rank-filtered edges == edges built standalone at that m
    val assigned = Similarity.assignToCentroids(emb).persist()
    try {
      val ranked = Similarity.nswEdgesRanked(assigned, mMax = 12)
        .persist()
      try {
        val viaFilter = ranked.filter(col("rnk") <= 2)
          .select(col("src"), col("dst"))
        val direct = Similarity.nswEdges(assigned, m = 2)
        assert(viaFilter.except(direct).count() === 0L)
        assert(direct.except(viaFilter).count() === 0L)
      } finally { ranked.unpersist(); () }
    } finally { assigned.unpersist(); () }
  }

  test("takedown: purged edges are a SUBSET of the rebuilt graph's " +
      "(removal only removes ranking competitors), so the rebuild's " +
      "recall is the ceiling — and the q203 card orders that way") {
    val assigned = Similarity.assignToCentroids(emb).persist()
    try {
      val tomb = col("vec_id") % 23 === 9
      val tombs = assigned.filter(tomb).select(col("vec_id"))
      val full = Similarity.nswEdges(assigned, m = 6)
      val purged = graft.operators.Takedown.purge(
        graft.operators.Takedown.purge(full,
          tombs.select(col("vec_id").as("src")), "src"),
        tombs.select(col("vec_id").as("dst")), "dst")
      val rebuilt = Similarity.nswEdges(assigned.filter(!tomb), m = 6)
      assert(purged.except(rebuilt).count() === 0L,
        "a purged edge must survive the rebuild (rank can only improve)")
      // no condemned endpoint anywhere after either night
      assert(purged.join(tombs.select(col("vec_id").as("src")),
        Seq("src"), "left_semi").count() === 0L)
      assert(rebuilt.join(tombs.select(col("vec_id").as("dst")),
        Seq("dst"), "left_semi").count() === 0L)
      // the graded card: rebuilt recall >= purged recall
      val card = SparkEntry.queries("q203_nsw_takedown")(spark, dir)
        .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
      assert(card("rebuilt") >= card("purged"))
    } finally { assigned.unpersist(); () }
  }

  test("takedown-rate curve (q209): per rate the edge sets CHAIN " +
      "purged ⊆ repaired ⊆ rebuilt (a survivor inside the stored rank " +
      "horizon always outranks one beyond it), debts order " +
      "0 ≤ repair_debt ≤ purge_debt, and purge_debt is weakly monotone " +
      "in the rate at the graded geometry") {
    // edge-set chain at the 30% rate, replicated from the q209
    // construction (stored horizon 12, degree 6)
    val assigned = Similarity.assignToCentroids(emb).persist()
    try {
      val ranked = Similarity.nswEdgesRanked(assigned, mMax = 12).persist()
      try {
        val tomb = (col("vec_id") % 20).isin(9, 11, 13, 15, 17, 19)
        val tombs = assigned.filter(tomb).select(col("vec_id"))
        def dropEnds(edges: org.apache.spark.sql.DataFrame) =
          edges.join(tombs.select(col("vec_id").as("src")), Seq("src"),
              "left_anti")
            .join(tombs.select(col("vec_id").as("dst")), Seq("dst"),
              "left_anti")
        val purged = dropEnds(ranked.filter(col("rnk") <= 6))
          .select(col("src"), col("dst"))
        val repaired = dropEnds(ranked)
          .withColumn("__rr", row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy(col("src")).orderBy(col("rnk"))))
          .filter(col("__rr") <= 6)
          .select(col("src"), col("dst"))
        val rebuilt = Similarity.nswEdges(assigned.filter(!tomb), m = 6)
        assert(purged.except(repaired).count() === 0L,
          "purged must be a subset of repaired")
        assert(repaired.except(rebuilt).count() === 0L,
          "repaired must be a subset of rebuilt")
      } finally { ranked.unpersist(); () }
    } finally { assigned.unpersist(); () }
    // debts from the graded card itself
    val rows = SparkEntry.queries("q209_nsw_takedown_curve")(spark, dir)
      .collect().sortBy(_.getAs[Long]("rate_pct"))
    assert(rows.map(_.getAs[Long]("rate_pct")).toSeq === Seq(5L, 15L, 30L))
    rows.foreach { r =>
      val (pd, rd) = (r.getAs[Double]("purge_debt"),
        r.getAs[Double]("repair_debt"))
      assert(rd >= 0.0 && pd >= rd,
        s"debts must order 0 <= repair <= purge at rate ${r.get(0)}: $rd $pd")
    }
    val debts = rows.map(_.getAs[Double]("purge_debt")).toSeq
    assert(debts === debts.sorted,
      s"purge_debt must be weakly monotone in the rate: $debts")
  }

  test("every candidate is graph-reachable from an entry node within " +
      "the round budget (driver replay over the collected edge table)") {
    val assigned = Similarity.assignToCentroids(emb).persist()
    try {
      val edges = Similarity.nswEdges(assigned, m = 6).persist()
      try {
        val adj = edges.collect()
          .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet)
          .toMap
        val clus = assigned.select(col("vec_id"), col("cluster"))
        val entryByCluster = clus.groupBy(col("cluster"))
          .agg(min(col("vec_id")).as("v")).collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
        val got = Similarity.nswTopK(queries, emb, edges, clus,
            entries = 2, rounds = 2, k = 1000)
          .select(col("qid"), col("vec_id")).collect()
          .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet)
          .toMap
        val allEntries = entryByCluster.values.toSet
        got.foreach { case (qid, cands) =>
          // expand every possible entry pair's 2-hop ball; candidates
          // must sit inside the union ball (minus the query itself)
          val ball0 = allEntries
          val ball1 = ball0 ++ ball0.flatMap(adj.getOrElse(_, Set.empty))
          val ball2 = ball1 ++ ball1.flatMap(adj.getOrElse(_, Set.empty))
          assert(cands.subsetOf(ball2 - qid),
            s"query $qid returned unreachable candidates: " +
              (cands -- ball2).take(5))
        }
      } finally { edges.unpersist(); () }
    } finally { assigned.unpersist(); () }
  }

  test("nswCap geometry assertion: the cap is NON-BINDING at the " +
      "oracle-checked scale (sf0.01) — the q198/q201/q203/q209 DuckDB " +
      "oracles do not model the per-cluster sample, so this fails " +
      "loudly if testdata geometry ever makes the cap bite there") {
    val sf001 = Tables.load(spark, "/root/testdata/sf0.01", "embeddings")
    val hottest = Similarity.assignToCentroids(sf001)
      .groupBy(col("cluster")).count()
      .agg(max(col("count"))).head().getLong(0)
    assert(hottest < graft.queries.EvalQueries.nswCap,
      s"hottest ivf_coarse cluster ($hottest) >= nswCap " +
        s"(${graft.queries.EvalQueries.nswCap}) at the oracle-checked " +
        "sf0.01 — the cap now binds and the SQL oracles (which do not " +
        "model the (md5(vec_id), vec_id)-ordered sample) would " +
        "silently diverge; either mirror the cap in the oracles or " +
        "raise it above this geometry")
  }
}
