package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph analytics for web-corpus assembly. Crawl pipelines rank hosts
  * and pages by link structure (a PageRank-family score is the classic
  * page-quality prior used when deciding what to keep from a crawl) before
  * any content-level filtering — the graph is available long before the
  * text is parsed.
  *
  * The rank iteration here is FIXED-POINT INTEGER arithmetic, not floats:
  * ranks are scaled longs, per-edge shares are floor divisions and the sum
  * over in-edges is an integer sum — associative and therefore independent
  * of partitioning, accumulation order and engine. The same iteration in
  * doubles is order-sensitive (float addition does not associate), so two
  * runs of the SAME plan could differ in the last ulp and a DuckDB oracle
  * could legitimately disagree. With scaled longs, results are bit-exact
  * everywhere, at any parallelism. Precision: one part in `scale` per
  * iteration — for ranking (the use case) that is far below any decision
  * threshold.
  *
  * Scale shape per iteration: one equi-join of the edge table with the
  * rank table on src (the rank table is |V| rows — broadcastable for
  * host-level graphs, shuffle-joined for page-level) and one integer-sum
  * aggregation keyed by dst (map-side partials). The edge table is never
  * reshuffled if it is pre-partitioned by src: persist it once and every
  * iteration reuses the layout. Lineage is truncated per round
  * (localCheckpoint, same discipline as NearDup.connectedComponents) so a
  * deep iteration does not stack plans.
  */
object Graphs {

  /** Deterministic scaled-integer PageRank.
    *
    * Semantics (documented, cross-engine reproducible):
    *   - nodes = distinct endpoints of `edges` (cols `src`, `dst`);
    *   - every node starts at `scale` (rank 1.0 scaled);
    *   - each iteration: share(v) = rank(v) div outdeg(v) flows along each
    *     out-edge; rank'(v) = base + damp × Σ incoming shares, with
    *     base = scale·(dampDen−dampNum) div dampDen and damp applied as
    *     (dampNum · Σ) div dampDen — all floor divisions on longs;
    *   - dangling nodes (no out-edges) leak their mass (the common
    *     "no redistribution" variant); multi-edges must be deduplicated by
    *     the caller if 1-vote-per-link semantics are wanted.
    *
    * Overflow guard: dampNum · V · scale must stay below 2^53 (the exact-
    * long window of the portable floor-div below) — require()d.
    *
    * @return (node, rank_fp) — rank scaled by `scale`, bit-exact across
    *         engines and partitionings
    */
  def pageRankFixedPoint(edges: DataFrame, iters: Int,
      scale: Long = 1000000L, dampNum: Long = 85L,
      dampDen: Long = 100L): DataFrame = {
    require(iters >= 1 && iters <= 64, "iters must be in [1, 64]")
    require(scale > 0 && dampNum > 0 && dampDen > dampNum,
      "need 0 < dampNum < dampDen and scale > 0")

    val e = edges.select(col("src"), col("dst")).localCheckpoint(true)
    val nodes = e.select(col("src").as("node"))
      .unionAll(e.select(col("dst").as("node")))
      .distinct().localCheckpoint(true)
    val nNodes = nodes.count()
    require(BigInt(dampNum) * BigInt(nNodes) * BigInt(scale) < BigInt(1L << 53),
      s"dampNum*V*scale must stay under 2^53 (V=$nNodes, scale=$scale)")
    val outdeg = e.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("od")).localCheckpoint(true)

    // floor(a/b) for 0 <= a < 2^53, b >= 1, exactly and portably:
    // a - pmod(a,b) is exactly divisible by b; both operands and the
    // quotient are exact doubles, so IEEE division returns the integer
    // exactly. (Equivalent to SQL `a // b` in DuckDB, `a div b` in Spark.)
    def idiv(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      ((a - pmod(a, b)) / b).cast("long")

    val base = scale * (dampDen - dampNum) / dampDen // pure long floor-div

    var ranks = nodes.withColumn("pr", lit(scale)).localCheckpoint(true)
    for (_ <- 1 to iters) {
      val shares = ranks.join(outdeg, Seq("node"))
        .select(col("node").as("src"), idiv(col("pr"), col("od")).as("share"))
      val contrib = e.join(shares, Seq("src"))
        .groupBy(col("dst").as("node"))
        .agg(sum(col("share")).as("in_share"))
      val next = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(base) +
            idiv(lit(dampNum) * coalesce(col("in_share"), lit(0L)),
              lit(dampDen))).as("pr"))
        .localCheckpoint(true)
      ranks = next
    }
    ranks.select(col("node"), col("pr").as("rank_fp"))
  }

  /** Personalized (topic-sensitive) PageRank, same fixed-point integer
    * contract as [[pageRankFixedPoint]]: the teleport term lands ONLY on
    * the `seeds` (each seed gets the full base — the unnormalized form,
    * ranks proportional to seeded PPR), so scores measure proximity to
    * the seed set along links — "rank every domain by closeness to these
    * known-good domains", the trust/quality propagation used to extend a
    * small curated allowlist over a crawl graph.
    *
    * r0 = scale on seeds, 0 elsewhere; per iteration
    * r' = base·1_seed + damp × Σ incoming shares — all floor-div longs,
    * bit-exact anywhere. Non-seed nodes unreachable from the seeds stay
    * at 0 forever (exactly the semantics an allowlist extension wants).
    */
  def personalizedPageRank(edges: DataFrame, seeds: Seq[Long], iters: Int,
      scale: Long = 1000000L, dampNum: Long = 85L,
      dampDen: Long = 100L): DataFrame = {
    require(seeds.nonEmpty, "need at least one seed")
    require(iters >= 1 && iters <= 64, "iters must be in [1, 64]")
    require(scale > 0 && dampNum > 0 && dampDen > dampNum,
      "need 0 < dampNum < dampDen and scale > 0")
    val e = edges.select(col("src"), col("dst")).localCheckpoint(true)
    val nodes = e.select(col("src").as("node"))
      .unionAll(e.select(col("dst").as("node")))
      .distinct()
      .withColumn("is_seed", col("node").isin(seeds: _*))
      .localCheckpoint(true)
    val nNodes = nodes.count()
    require(BigInt(dampNum) * BigInt(nNodes) * BigInt(scale) < BigInt(1L << 53),
      s"dampNum*V*scale must stay under 2^53 (V=$nNodes, scale=$scale)")
    val outdeg = e.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("od")).localCheckpoint(true)
    def idiv(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      ((a - pmod(a, b)) / b).cast("long")
    val base = scale * (dampDen - dampNum) / dampDen
    var ranks = nodes
      .withColumn("pr", when(col("is_seed"), lit(scale)).otherwise(lit(0L)))
      .localCheckpoint(true)
    for (_ <- 1 to iters) {
      val shares = ranks.join(outdeg, Seq("node"))
        .select(col("node").as("src"), idiv(col("pr"), col("od")).as("share"))
      val contrib = e.join(shares, Seq("src"))
        .groupBy(col("dst").as("node"))
        .agg(sum(col("share")).as("in_share"))
      ranks = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"), col("is_seed"),
          (when(col("is_seed"), lit(base)).otherwise(lit(0L)) +
            idiv(lit(dampNum) * coalesce(col("in_share"), lit(0L)),
              lit(dampDen))).as("pr"))
        .localCheckpoint(true)
    }
    ranks.select(col("node"), col("pr").as("rank_fp"))
  }

  /** Per-node triangle participation counts over the UNDIRECTED skeleton
    * of `edges` — the local-density signal behind clustering-coefficient
    * spam-farm / link-ring detection (organic neighborhoods close
    * triangles; bought links rarely do).
    *
    * Canonical a<b edges, then the ordered-wedge join (a<b<c paths
    * closed by the (a,c) edge) so each triangle is generated exactly
    * once; the closing check is an equi-join, never a filter over a
    * cartesian. The canonical edge table is materialized once and feeds
    * all three join roles. Fan-out is Σ deg(v)² (wedges) — at corpus
    * scale, cap or sample super-hubs first (the standard mitigation;
    * same spirit as NearDup's maxDocsPerFp).
    *
    * @return (node, n_tri) — nodes in no triangle are absent
    */
  def triangleCounts(edges: DataFrame): DataFrame = {
    val und = edges.filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct().localCheckpoint(true)
    val tri = und.as("e1")
      .join(und.as("e2"), col("e2.a") === col("e1.b"))
      .join(und.as("e3"),
        col("e3.a") === col("e1.a") && col("e3.b") === col("e2.b"))
      .select(col("e1.a").as("x"), col("e1.b").as("y"), col("e2.b").as("z"))
    tri.select(explode(array(col("x"), col("y"), col("z"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_tri"))
  }

  /** Per-node count of DISTINCT nodes reachable within ≤ k directed hops —
    * the bounded-horizon BFS behind "how much of the graph does this page
    * influence" and crawl frontier sizing. Exact set semantics (a node
    * reachable at distances 2 AND 3 counts once); a node on a cycle
    * through itself counts itself.
    *
    * Iterative frontier expansion with a DISTINCT after every round, so
    * the working set is bounded by reachable PAIRS (never paths — an
    * unDISTINCTed expansion enumerates exponentially many paths on dense
    * graphs). Each round: one equi-join of the reach set with the edge
    * table on the frontier node + one dedup shuffle; lineage truncated per
    * round. At web scale the pair set itself is the cost driver (k small,
    * e.g. 2–3, or run on the host graph, not the page graph — standard
    * practice).
    *
    * @return (src, n_reach) — nodes with out-degree 0 are absent
    */
  def kHopCounts(edges: DataFrame, k: Int): DataFrame = {
    require(k >= 1 && k <= 8, "k must be in [1, 8]")
    val e = edges.select(col("src"), col("dst")).distinct()
      .localCheckpoint(true)
    var reach = e
    for (_ <- 2 to k) {
      reach = reach
        .unionAll(reach.as("r")
          .join(e.as("n"), col("r.dst") === col("n.src"))
          .select(col("r.src"), col("n.dst")))
        .distinct()
        .localCheckpoint(true)
    }
    reach.groupBy(col("src")).agg(count(lit(1)).as("n_reach"))
  }
}
