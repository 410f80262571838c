package graft

import org.apache.spark.sql.functions._

import graft.operators.RangeJoin

/** The bucketed point-in-interval join must equal the naive inequality
  * join on every fixture — boundaries, bucket-straddling intervals,
  * empty/inverted intervals, negative times — while planning as an
  * equi-join (no nested loop over the full sides). */
class RangeJoinSpec extends SparkSpec {

  private def fixture = {
    import sqlImplicits._
    val pts = Seq(-100L, -1L, 0L, 1L, 59L, 60L, 61L, 119L, 120L, 500L, 999L)
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("p_id", "t")
    val ivs = Seq(
      (1L, 0L, 60L),     // exactly one bucket
      (2L, 30L, 90L),    // straddles a bucket boundary
      (3L, -100L, 5L),   // negative start
      (4L, 100L, 100L),  // empty (e == s) — matches nothing
      (5L, 200L, 100L),  // inverted — matches nothing
      (6L, 0L, 1000L)    // spans many buckets
    ).toDF("iv_id", "s", "e")
    (pts, ivs)
  }

  private def naive = {
    val (pts, ivs) = fixture
    pts.crossJoin(ivs).filter(col("t") >= col("s") && col("t") < col("e"))
      .select(col("p_id"), col("iv_id")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("bucketed join equals the naive inequality join at several widths") {
    val (pts, ivs) = fixture
    val expected = naive
    for (w <- Seq(1L, 7L, 60L, 64L, 1024L)) {
      val got = RangeJoin.pointInInterval(pts, "t", ivs, "s", "e", bucketWidth = w)
        .select(col("p_id"), col("iv_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === expected, s"width=$w")
    }
  }

  test("start is inclusive, end is exclusive") {
    val (pts, ivs) = fixture
    val got = RangeJoin.pointInInterval(pts, "t", ivs.filter(col("iv_id") === 1),
      "s", "e", bucketWidth = 60L)
      .select(col("t")).collect().map(_.getLong(0)).toSet
    assert(got.contains(0L) && got.contains(59L) && !got.contains(60L))
  }

  test("each candidate pair arises exactly once (no post-join dedup needed)") {
    val (pts, ivs) = fixture
    val dup = RangeJoin.pointInInterval(pts, "t", ivs, "s", "e", bucketWidth = 13L)
      .groupBy(col("p_id"), col("iv_id")).agg(count(lit(1)).as("n"))
      .filter(col("n") > 1).count()
    assert(dup === 0L)
  }

  test("plans as an equi-join on the bucket — no nested loop / cartesian") {
    val (pts, ivs) = fixture
    val plan = RangeJoin.pointInInterval(pts, "t", ivs, "s", "e", bucketWidth = 60L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    // small fixture broadcasts, large sides hash-shuffle: either way the
    // join node must be keyed (a BroadcastNestedLoopJoin would mean the
    // bucket key was lost)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("reserved internal column name is rejected") {
    import sqlImplicits._
    val bad = Seq((1L, 2L)).toDF("t", "__bucket")
    val (_, ivs) = fixture
    assertThrows[IllegalArgumentException] {
      RangeJoin.pointInInterval(bad, "t", ivs, "s", "e", bucketWidth = 60L)
    }
  }

  // ---- interval × interval overlap ----

  private def overlapFixture = {
    import sqlImplicits._
    val l = Seq(
      (1L, 0L, 60L), (2L, 30L, 90L), (3L, -100L, 5L),
      (4L, 100L, 100L), (5L, 200L, 100L), (6L, 0L, 1000L),
      (7L, 59L, 61L), (8L, 999L, 1001L)
    ).toDF("l_id", "ls", "le")
    val r = Seq(
      (11L, 50L, 55L), (12L, 60L, 120L), (13L, -200L, -99L),
      (14L, 0L, 1L), (15L, 980L, 2000L), (16L, 5L, 5L)
    ).toDF("r_id", "rs", "re")
    (l, r)
  }

  test("interval overlap equals the naive inequality join at several widths") {
    val (l, r) = overlapFixture
    // the bare inequality predicate wrongly matches EMPTY intervals (e.g.
    // [5,5) against [0,1000)); half-open semantics require both non-empty
    val expected = l.crossJoin(r)
      .filter(col("ls") < col("le") && col("rs") < col("re"))
      .filter(col("ls") < col("re") && col("rs") < col("le"))
      .select(col("l_id"), col("r_id"))
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    for (w <- Seq(1L, 7L, 60L, 64L, 1024L)) {
      val got = RangeJoin.intervalOverlap(l, "ls", "le", r, "rs", "re",
        bucketWidth = w)
        .select(col("l_id"), col("r_id"))
        .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
      assert(got === expected, s"width=$w")
    }
  }

  test("overlap pairs arise exactly once despite long shared spans") {
    val (l, r) = overlapFixture
    val dup = RangeJoin.intervalOverlap(l, "ls", "le", r, "rs", "re",
      bucketWidth = 13L)
      .groupBy(col("l_id"), col("r_id")).agg(count(lit(1)).as("n"))
      .filter(col("n") > 1).count()
    assert(dup === 0L)
  }

  test("an interval spanning too many buckets fails fast with a named error") {
    import sqlImplicits._
    val pts = Seq((1L, 5L)).toDF("p_id", "t")
    val huge = Seq((1L, 0L, (RangeJoin.MaxBucketsPerInterval + 2L)))
      .toDF("iv_id", "s", "e")
    val err = intercept[Throwable] {
      RangeJoin.pointInInterval(pts, "t", huge, "s", "e", bucketWidth = 1L)
        .count()
    }
    val chain = Iterator.iterate(err)(_.getCause).takeWhile(_ != null)
      .map(_.toString).mkString(" | ")
    assert(chain.contains("buckets"), chain)
  }

  test("interval overlap plans without a cartesian / nested loop") {
    val (l, r) = overlapFixture
    val plan = RangeJoin.intervalOverlap(l, "ls", "le", r, "rs", "re",
      bucketWidth = 60L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
