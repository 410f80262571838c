package graft

import org.apache.spark.sql.functions._

import graft.operators.Graphs

/** Fixed-point PageRank: hand-graph agreement with an independent in-memory
  * reimplementation of the recurrence, partitioning invariance (integer
  * sums are associative — the whole point of the fixed-point design), and
  * the documented dangling / overflow-guard semantics. */
class GraphsSpec extends SparkSpec {
  import sqlImplicits._

  // A -> B, A -> C, B -> C, C -> A, D -> A; E appears only as a target
  // (A -> E), so E is dangling: it receives rank but sends none.
  private val edgeList = Seq(
    (1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L), (4L, 1L), (1L, 5L))

  /** The same recurrence on scala.collection Maps — an implementation with
    * no Spark in it, so agreement is evidence about the math, not the
    * plumbing. */
  private def referenceRanks(edges: Seq[(Long, Long)], iters: Int,
      scale: Long = 1000000L): Map[Long, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val outdeg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val base = scale * 15L / 100L
    var r = nodes.map(_ -> scale).toMap
    for (_ <- 1 to iters) {
      val in = edges.groupBy(_._2).view.mapValues(
        _.map { case (s, _) => r(s) / outdeg(s) }.sum).toMap
      r = nodes.map(n => n -> (base + 85L * in.getOrElse(n, 0L) / 100L)).toMap
    }
    r
  }

  test("hand graph matches the independent in-memory recurrence") {
    val got = Graphs.pageRankFixedPoint(edgeList.toDF("src", "dst"), iters = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == referenceRanks(edgeList, 5))
  }

  test("result is invariant under repartitioning (associative integer sums)") {
    val a = Graphs.pageRankFixedPoint(
      edgeList.toDF("src", "dst").repartition(7), iters = 5)
      .orderBy("node").collect().toSeq
    val b = Graphs.pageRankFixedPoint(
      edgeList.toDF("src", "dst").coalesce(1), iters = 5)
      .orderBy("node").collect().toSeq
    assert(a == b)
  }

  test("dangling node receives base + damped inflow but leaks its own mass") {
    val r = referenceRanks(edgeList, 5)
    val got = Graphs.pageRankFixedPoint(edgeList.toDF("src", "dst"), 5)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    // E (=5) has no out-edges yet holds rank above the floor: it received
    // inflow from A. Total mass strictly below V*scale — the leak.
    assert(got(5L) > 1000000L * 15L / 100L)
    assert(got.values.sum < 6L * 1000000L)
    assert(got == r)
  }

  test("a sink-free cycle conserves mass to within per-node floor loss") {
    // 1 -> 2 -> 3 -> 1: no dangling nodes, outdeg 1 everywhere, so the only
    // loss is the floor in the damping division — bounded by 1 per node per
    // iteration.
    val cyc = Seq((1L, 2L), (2L, 3L), (3L, 1L))
    val got = Graphs.pageRankFixedPoint(cyc.toDF("src", "dst"), iters = 10)
      .collect().map(x => x.getLong(1))
    assert(got.forall(r => r >= 1000000L - 10 && r <= 1000000L))
  }

  test("overflow guard rejects configurations outside the exact-long window") {
    val e = intercept[IllegalArgumentException] {
      Graphs.pageRankFixedPoint(edgeList.toDF("src", "dst"), iters = 2,
        scale = Long.MaxValue / 100)
    }
    assert(e.getMessage.contains("2^53"))
  }

  test("triangleCounts: each triangle counted once per member, direction-free") {
    // triangle {1,2,3} (one edge reversed), a dangling path 3-4, and a
    // second triangle {3,4,5} sharing node 3
    val edges = Seq((1L, 2L), (3L, 2L), (1L, 3L), (3L, 4L), (4L, 5L),
      (5L, 3L)).toDF("src", "dst")
    val got = Graphs.triangleCounts(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 1L, 5L -> 1L))
    // duplicate and reversed edges must not inflate counts
    val noisy = edges.unionAll(Seq((2L, 1L), (1L, 2L)).toDF("src", "dst"))
    val got2 = Graphs.triangleCounts(noisy)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got2 == got)
  }

  test("personalizedPageRank: mass stays near the seeds; unreachable stays 0") {
    // two components: 1->2->3->1 (seeded at 1) and 8->9 (unseeded)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (8L, 9L))
      .toDF("src", "dst")
    val got = Graphs.personalizedPageRank(edges, seeds = Seq(1L), iters = 6)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(8L) == 0L && got(9L) == 0L, "unseeded component must stay 0")
    assert(got(1L) > got(2L) && got(2L) > got(3L),
      "rank must decay with distance from the seed")
    assert(got(1L) > 0L && got(3L) > 0L)
  }
}
