package graft

import org.apache.spark.sql.functions._

import graft.operators.{Affinity, FuzzyMatch, GapFill, Graphs, Robust,
  Sampling, Scd}

/** Wave-8 operators: basket affinity, deletion-neighborhood fuzzy match,
  * robust stats, grid resample, weighted priority sampling, k-hop
  * reachability, SCD-2 history. */
class WranglingSpec extends SparkSpec {
  import sqlImplicits._

  // --- Affinity ------------------------------------------------------------

  private def baskets = Seq(
    (1L, "a"), (1L, "b"), (1L, "c"),
    (2L, "a"), (2L, "b"),
    (3L, "a"), (3L, "c"),
    (4L, "d"), (4L, "d") // duplicate membership must not inflate support
  ).toDF("bk", "it")

  test("pairSupport counts baskets, not row products, and scores exactly") {
    val got = Affinity.pairSupport(baskets, "bk", "it", minSupport = 1L)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    // (a,b) in baskets 1,2; (a,c) in 1,3; (b,c) in 1 only
    assert(got(("a", "b")).getAs[Long]("support") === 2L)
    assert(got(("a", "c")).getAs[Long]("support") === 2L)
    assert(got(("b", "c")).getAs[Long]("support") === 1L)
    // a in 3 baskets, b in 2 → conf1 = 2/3, conf2 = 2/2; N = 4 baskets
    val ab = got(("a", "b"))
    assert(ab.getAs[Double]("conf1") === 2.0 / 3.0)
    assert(ab.getAs[Double]("conf2") === 1.0)
    assert(ab.getAs[Double]("lift") === (2.0 * 4.0) / (3.0 * 2.0))
  }

  test("pairSupport drops oversized baskets whole, before fan-out") {
    val mega = (1 to 10).map(i => (9L, s"x$i")).toDF("bk", "it")
    val out = Affinity.pairSupport(baskets.unionAll(mega), "bk", "it",
      minSupport = 1L, maxBasketSize = 5)
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(!out.exists { case (a, b) => a.startsWith("x") || b.startsWith("x") })
    assert(out.toSet === Set(("a", "b"), ("a", "c"), ("b", "c")))
  }

  // --- FuzzyMatch ----------------------------------------------------------

  test("distance1Join finds exact, substitution, insertion and deletion " +
    "matches — and nothing at distance 2") {
    val dirty = Seq((1L, "kitten"), (2L, "kitxen"), (3L, "kittens"),
      (4L, "kiten"), (5L, "kixxen")).toDF("d_id", "d_s")
    val clean = Seq((10L, "kitten")).toDF("c_id", "c_s")
    val got = FuzzyMatch.distance1Join(dirty, "d_id", "d_s",
      clean, "c_id", "c_s")
      .collect().map(r => r.getAs[Long]("d_id") -> r.getAs[Long]("dist"))
      .toMap
    assert(got === Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
  }

  test("distance1Join candidate generation is complete vs the naive join") {
    val words = Seq("grid", "grad", "rid", "grids", "gird", "raid", "brig",
      "grip", "drip", "rig").zipWithIndex.map { case (w, i) => (i.toLong, w) }
    val l = words.toDF("l_id", "l_s")
    val r = words.map { case (i, w) => (i + 100L, w) }.toDF("r_id", "r_s")
    val fast = FuzzyMatch.distance1Join(l, "l_id", "l_s", r, "r_id", "r_s")
      .select("l_id", "r_id").collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    val naive = l.crossJoin(r)
      .filter(levenshtein(col("l_s"), col("r_s")) <= 1)
      .select("l_id", "r_id").collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(fast === naive)
  }

  // --- Robust --------------------------------------------------------------

  test("groupRobustStats: lower median, MAD and the outlier gate") {
    // group g: values 1..5 plus an extreme 1000 (n=6, even)
    // sorted: 1,2,3,4,5,1000 → lower median = rank 3 → 3.0
    // devs: 2,1,0,1,2,997 → sorted 0,1,1,2,2,997 → MAD = rank 3 → 1.0
    // outliers: dev > 3·1 → dev ∈ {997} → 1 (devs of 2 are not > 3)
    val df = Seq(1.0, 2.0, 3.0, 4.0, 5.0, 1000.0).zipWithIndex
      .map { case (v, i) => ("g", v, i.toLong) }.toDF("k", "v", "id")
    val r = Robust.groupRobustStats(df, "k", "v", tie = col("id")).collect()
    assert(r.length === 1)
    assert(r.head.getAs[Long]("n") === 6L)
    assert(r.head.getAs[Double]("median") === 3.0)
    assert(r.head.getAs[Double]("mad") === 1.0)
    assert(r.head.getAs[Long]("n_outliers") === 1L)
  }

  test("groupRobustStats median ignores the magnitude of extremes") {
    val clean = (1 to 9).map(i => ("g", i.toDouble, i.toLong))
    val wild = clean.updated(8, ("g", 1e12, 9L))
    val m1 = Robust.groupRobustStats(clean.toDF("k", "v", "id"), "k", "v",
      col("id")).head().getAs[Double]("median")
    val m2 = Robust.groupRobustStats(wild.toDF("k", "v", "id"), "k", "v",
      col("id")).head().getAs[Double]("median")
    assert(m1 === 5.0 && m2 === 5.0)
  }

  // --- gridLocf ------------------------------------------------------------

  test("gridLocf builds the full spine, picks last-per-bucket, fills LOCF") {
    val ev = Seq(
      ("u1", 10L, 1L, 1.0), ("u1", 11L, 2L, 2.0), // bucket 1: last = 2.0
      ("u1", 30L, 3L, 9.0),                       // bucket 3
      ("u2", 25L, 4L, 5.0)                        // bucket 2 only
    ).toDF("k", "t", "id", "v")
    val out = GapFill.gridLocf(ev, Seq("k"), expr("t DIV 10"),
      Seq(col("t"), col("id")), "v")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getBoolean(2), Option(r.get(3)).map(_.asInstanceOf[Double])))
      .toMap
    // global span = buckets 1..3 for BOTH keys
    assert(out.keySet === Set(("u1", 1L), ("u1", 2L), ("u1", 3L),
      ("u2", 1L), ("u2", 2L), ("u2", 3L)))
    assert(out(("u1", 1L)) === (true, Some(2.0)))  // last of the bucket
    assert(out(("u1", 2L)) === (false, Some(2.0))) // filled
    assert(out(("u1", 3L)) === (true, Some(9.0)))
    assert(out(("u2", 1L)) === (false, None))      // leading gap stays null
    assert(out(("u2", 2L)) === (true, Some(5.0)))
    assert(out(("u2", 3L)) === (false, Some(5.0)))
  }

  // --- weightedPrioritySample ----------------------------------------------

  test("weightedPrioritySample is invariant under repartitioning and " +
    "matches the priority formula") {
    val df = (1 to 500).map(i => (i.toLong, (i % 7 + 1).toLong))
      .toDF("id", "w")
    val a = Sampling.weightedPrioritySample(df, col("id").cast("string"),
      col("w"), k = 50, tie = col("id"))
      .select("id").collect().map(_.getLong(0)).toSet
    val b = Sampling.weightedPrioritySample(df.repartition(13),
      col("id").cast("string"), col("w"), k = 50, tie = col("id"))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(a === b)
    // brute-force the same top-50 on the driver
    val exp = df.withColumn("p",
        Sampling.md5Hash48(col("id").cast("string")).cast("double") /
          col("w").cast("double"))
      .orderBy(col("p"), col("id")).limit(50)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(a === exp)
  }

  test("weightedPrioritySample over-represents heavy rows") {
    val df = (1 to 2000).map(i => (i.toLong, if (i % 2 == 0) 100L else 1L))
      .toDF("id", "w")
    val picked = Sampling.weightedPrioritySample(df,
      col("id").cast("string"), col("w"), k = 200, tie = col("id"))
      .select("id", "w").collect()
    val heavy = picked.count(_.getLong(1) == 100L)
    assert(heavy > 150, s"expected heavy rows to dominate, got $heavy/200")
  }

  // --- kHopCounts ----------------------------------------------------------

  test("kHopCounts on a path and a cycle") {
    // path 1→2→3→4, cycle 10→11→10
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 10L))
      .toDF("src", "dst")
    val k2 = Graphs.kHopCounts(e, 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(k2 === Map(1L -> 2L, 2L -> 2L, 3L -> 1L,
      10L -> 2L, 11L -> 2L)) // 10 reaches {11, 10(self via cycle)}
    val k3 = Graphs.kHopCounts(e, 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(k3(1L) === 3L) // {2,3,4}
    assert(k3(10L) === 2L) // still {11, 10} — sets, not paths
  }

  // --- Scd -----------------------------------------------------------------

  test("scd2History builds contiguous versions with one open interval") {
    val snaps = Seq(
      (1L, "A", 0L), (1L, "A", 1L), (1L, "B", 2L), (1L, "B", 3L),
      (2L, "X", 0L), (2L, "X", 1L), (2L, "X", 2L), (2L, "X", 3L),
      (3L, null.asInstanceOf[String], 0L), (3L, "C", 1L), (3L, null, 2L)
    ).toDF("k", "attr", "b")
    val h = Scd.scd2History(snaps, "k", Seq("attr"), "b")
      .orderBy("k", "ver").collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[Long]("ver"),
        r.getAs[String]("attr"), r.getAs[Long]("valid_from"),
        Option(r.getAs[Any]("valid_to")), r.getAs[Boolean]("is_current")))
    assert(h.toSeq === Seq(
      (1L, 1L, "A", 0L, Some(2L), false),
      (1L, 2L, "B", 2L, None, true),
      (2L, 1L, "X", 0L, None, true),
      (3L, 1L, null, 0L, Some(1L), false),
      (3L, 2L, "C", 1L, Some(2L), false),
      (3L, 3L, null, 2L, None, true)))
  }

  test("sortedNeighborhoodPairs equals the naive rank-window join") {
    val words = Seq("apple", "apply", "appla", "banana", "bananb", "cherry",
      "cherrz", "date", "datf", "datg").zipWithIndex
      .map { case (w, i) => (i.toLong, w) }
    val df = words.toDF("id", "s")
    val fast = FuzzyMatch.sortedNeighborhoodPairs(df, "id", "s",
      sortKey = col("s"), window = 2, maxDist = 1, parts = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // naive: rank by (s, id), all pairs within rank distance 2, lev <= 1
    val ranked = words.sortBy { case (i, w) => (w, i) }.zipWithIndex
    val naive = (for {
      (a, ra) <- ranked; (b, rb) <- ranked
      if rb > ra && rb <= ra + 2
      if levenshteinDist(a._2, b._2) <= 1
    } yield (a._1, b._1)).toSet
    assert(fast === naive)
    assert(fast.nonEmpty)
  }

  private def levenshteinDist(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = Seq(d(i - 1)(j) + 1, d(i)(j - 1) + 1,
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1)).min
    d(a.length)(b.length)
  }

  test("lookupAsOf attaches the version valid at the fact time — " +
    "pre-history facts stay NULL, the open version catches the tail") {
    val snaps = Seq(
      (1L, "A", 10L), (1L, "B", 20L), (1L, "B", 30L)
    ).toDF("k", "attr", "b")
    val hist = Scd.scd2History(snaps, "k", Seq("attr"), "b")
    val facts = Seq((1L, 5L), (1L, 10L), (1L, 25L), (1L, 99L), (2L, 10L))
      .toDF("k", "t")
    val got = Scd.lookupAsOf(hist, facts, "k", "t")
      .collect().map(r => (r.getAs[Long]("k"), r.getAs[Long]("t")) ->
        Option(r.getAs[String]("attr"))).toMap
    assert(got === Map(
      (1L, 5L) -> None,        // before the first version
      (1L, 10L) -> Some("A"),
      (1L, 25L) -> Some("B"),
      (1L, 99L) -> Some("B"),  // open current version
      (2L, 10L) -> None))      // unknown key
  }

  test("kAnonymity verdict flips exactly at k") {
    import graft.functions.Quality
    val df = (Seq.fill(5)(("seg1", 1)) ++ Seq.fill(4)(("seg2", 2)))
      .toDF("seg", "nat")
    val got = Quality.kAnonymity(df, Seq("seg", "nat"), k = 5)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("group_sz"), r.getAs[Boolean]("anonymous"))).toMap
    assert(got("seg1") === ((5L, true)))
    assert(got("seg2") === ((4L, false)))
  }

  // --- incremental aggregate state -----------------------------------------

  test("incremental states merge associatively and equal from-scratch") {
    import graft.operators.Incremental
    val rows = (1 to 90).map(i => (s"g${i % 3}", i.toLong))
    val df = rows.toDF("g", "v")
    val Seq(b1, b2, b3) = (0 to 2).map(k =>
      Incremental.aggState(
        rows.zipWithIndex.filter(_._2 % 3 == k).map(_._1).toDF("g", "v"),
        "g", "v"))
    def snap(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val leftAssoc = snap(Incremental.mergeStates("g",
      Seq(Incremental.mergeStates("g", Seq(b1, b2)), b3)))
    val allAtOnce = snap(Incremental.mergeStates("g", Seq(b1, b2, b3)))
    val scratch = snap(Incremental.aggState(df, "g", "v"))
    assert(leftAssoc === scratch)
    assert(allAtOnce === scratch)
  }

  test("aggState rejects float value columns (merge would not be exact)") {
    import graft.operators.Incremental
    val df = Seq(("g", 1.5)).toDF("g", "v")
    val e = intercept[IllegalArgumentException] {
      Incremental.aggState(df, "g", "v")
    }
    assert(e.getMessage.contains("integral"))
  }

  test("histogram states merge to the from-scratch histogram; tails clamp " +
    "into the edge bins") {
    import graft.operators.Incremental
    val vals = Seq(-50L, 0L, 5L, 15L, 25L, 99L, 100L, 250L, 999L)
    val df = vals.map(Tuple1(_)).toDF("v")
    val scratch = Incremental.histState(df, col("v"), 0L, 10L, 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val parts = (0 to 1).map(k =>
      Incremental.histState(
        vals.zipWithIndex.filter(_._2 % 2 == k).map(x => Tuple1(x._1))
          .toDF("v"), col("v"), 0L, 10L, 10))
    val merged = Incremental.mergeHistStates(parts)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(merged === scratch)
    // -50 clamps to bin 0; 100/250/999 clamp to bin 9
    assert(scratch(0L) === 3L) // -50, 0, 5
    assert(scratch(9L) === 4L) // 99 (bin 9 proper) + 100, 250, 999 clamped
  }

  test("quantilesFromHist: rank arithmetic is ⌈q·N⌉, the estimate " +
    "interpolates inside the owning bin and lands within one bin width " +
    "of the exact quantile") {
    import graft.operators.Incremental
    val vals = (1L to 1000L)
    val df = vals.map(Tuple1(_)).toDF("v")
    val st = Incremental.histState(df, col("v"), 0L, 100L, 10)
    val got = Incremental.quantilesFromHist(st, 0L, 100L,
      Seq(("p50", 1L, 2L), ("p90", 9L, 10L)))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(6))).toMap
    assert(got("p50")._1 === 500L)
    assert(got("p90")._1 === 900L)
    // uniform data: the interpolated estimate tracks the exact value
    assert(math.abs(got("p50")._2 - 500.0) <= 100.0)
    assert(math.abs(got("p90")._2 - 900.0) <= 100.0)
  }

  // --- prefix-filtered Jaccard ---------------------------------------------

  test("prefix filtering collapses the candidate set on a hot-shingle corpus") {
    import graft.operators.NearDup
    // 60 docs, ALL sharing one ubiquitous boilerplate line (the hot
    // shingle), otherwise pairwise-distinct content. The plain inverted
    // index fans out C(60,2) = 1770 candidate pairs from the hot shingle
    // alone; rarity-ordered prefixes skip it for every doc whose prefix
    // is satisfied by rarer shingles.
    val docs = (1 to 60).map { i =>
      (i.toLong, s"click here to subscribe now w${i}a w${i}b w${i}c w${i}d w${i}e w${i}f")
    }.toDF("doc_id", "text")
    val sh = NearDup.shinglePostings(docs, "doc_id", "text", k = 3).persist()
    try {
      // replicate the operator's candidate stage: plain vs prefix index
      val plain = sh.as("a").join(sh.as("b"),
          col("a.g") === col("b.g") && col("a.id") < col("b.id"))
        .select(col("a.id"), col("b.id")).distinct().count()
      val dfreq = sh.groupBy(col("g")).agg(count(lit(1)).as("df"))
      val ranked = sh.join(dfreq, Seq("g")).withColumn("rnk",
        org.apache.spark.sql.functions.row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("id"))
            .orderBy(col("df"), col("g"))))
      val ceil = (col("n") * 1 + 1) - pmod(col("n") * 1 + 1, lit(2L))
      val prefix = ranked.filter(col("rnk") <=
        col("n") - (ceil / 2).cast("long") + 1)
      val pref = prefix.as("a").join(prefix.as("b"),
          col("a.g") === col("b.g") && col("a.id") < col("b.id"))
        .select(col("a.id"), col("b.id")).distinct().count()
      assert(plain >= 1770L, s"hot shingle should fan out, got $plain")
      assert(pref < plain / 10,
        s"prefix candidates $pref vs plain $plain — filter not biting")
      // and the final answers agree regardless
      val full = NearDup.exactJaccardPairs(sh, 0.5).count()
      val filt = NearDup.prefixFilteredJaccardPairs(sh, 1L, 2L).count()
      assert(full === filt)
    } finally sh.unpersist()
  }

  test("prefixFilteredJaccardPairs equals the full inverted-index join") {
    import graft.operators.NearDup
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val sh = NearDup.shinglePostings(docs, "doc_id", "text", k = 3)
      .persist()
    try {
      val full = NearDup.exactJaccardPairs(sh, threshold = 0.5)
        .collect().map(r => (r.getLong(0), r.getLong(1),
          r.getDouble(2))).toSet
      val pref = NearDup.prefixFilteredJaccardPairs(sh, 1L, 2L)
        .collect().map(r => (r.getLong(0), r.getLong(1),
          r.getDouble(2))).toSet
      assert(pref === full)
      assert(full.nonEmpty) // the comparison must not pass vacuously
    } finally sh.unpersist()
  }
}
