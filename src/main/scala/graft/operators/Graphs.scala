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
}
