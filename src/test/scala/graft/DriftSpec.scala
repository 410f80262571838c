package graft

import org.apache.spark.sql.functions._

import graft.plans.Drift

/** Run-over-run drift comparator: all four volume verdicts, share-based
  * category drift independent of batch volume. */
class DriftSpec extends SparkSpec {
  import sqlImplicits._

  test("volumeDrift verdicts: OK, DRIFT, NEW and GONE") {
    val prev = (Seq.fill(100)("a") ++ Seq.fill(100)("b") ++ Seq.fill(5)("gone"))
      .toDF("k")
    val cur = (Seq.fill(110)("a") ++ Seq.fill(250)("b") ++ Seq.fill(7)("new"))
      .toDF("k")
    val got = Drift.volumeDrift(prev, cur, Seq("k"), tolerance = 0.3)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(4)))).toMap
    assert(got("a") === ((100L, 110L, "OK")))
    assert(got("b") === ((100L, 250L, "DRIFT")))
    assert(got("new") === ((0L, 7L, "NEW")))
    assert(got("gone") === ((5L, 0L, "GONE")))
  }

  test("categoryDrift ignores uniform volume growth, flags mix shift") {
    val prev = (Seq.fill(50)("x") ++ Seq.fill(50)("y")).toDF("cat")
    // double the batch uniformly -> zero share drift
    val doubled = (Seq.fill(100)("x") ++ Seq.fill(100)("y")).toDF("cat")
    val noDrift = Drift.categoryDrift(prev, doubled, "cat").collect()
    assert(noDrift.forall(!_.getBoolean(4)))
    assert(noDrift.forall(r => r.getDouble(3) === 0.0))
    // same volume, shifted mix: x 50% -> 80%
    val shifted = (Seq.fill(80)("x") ++ Seq.fill(20)("y")).toDF("cat")
    val drift = Drift.categoryDrift(prev, shifted, "cat")
      .collect().map(r => r.getString(0) -> ((r.getDouble(3), r.getBoolean(4)))).toMap
    assert(drift("x") === ((0.3, true)))
    assert(drift("y") === ((-0.3, true)))
  }

  test("histogramDrift: hand-checked L1 from cross-multiplied integers") {
    // prev: bucket 0 ×2, bucket 1 ×1 (N=3); cur: 0 ×1, 1 ×2, 2 ×1 (N=4)
    val prev = Seq(0L, 0L, 1L).toDF("b")
    val cur = Seq(0L, 1L, 1L, 2L).toDF("b")
    val got = Drift.histogramDrift(prev, cur, col("b"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    // |n_p·4 − n_c·3| : b0 = |8−3| = 5, b1 = |4−6| = 2, b2 = |0−3| = 3
    // L1 = 10/12; share diffs 5/12, 2/12, 3/12
    assert(got(0L) == ((2L, 1L, 0.416667, 0.833333)))
    assert(got(1L) == ((1L, 2L, 0.166667, 0.833333)))
    assert(got(2L) == ((0L, 1L, 0.25, 0.833333)))
  }

  test("skewReport: heavy and skewed verdicts from integer comparisons") {
    import graft.operators.Skew
    // key a ×80, b ×10, ten singleton keys: 100 rows over 12 keys
    val rows = (Seq.fill(80)("a") ++ Seq.fill(10)("b") ++
      (0 until 10).map(i => s"s$i")).toDF("k")
    val got = Skew.skewReport(rows, col("k"), topK = 3,
      heavyDen = 2L, skewFactor = 1L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getBoolean(4), r.getBoolean(5)))).toMap
    // heavy: share > 1/2 → only a (80/100); skewed: cnt > mean (100/12) →
    // a and b; singletons below both
    assert(got("a") == ((80L, true, true)))
    assert(got("b") == ((10L, false, true)))
    assert(got.size == 3 && got.keys.exists(_.startsWith("s")))
    assert(got.collect { case (k, v) if k.startsWith("s") => v }.head ==
      ((1L, false, false)))
  }

  test("snapshotDiff classifies NEW/GONE/CHANGED/SAME by key and digest") {
    import sqlImplicits._
    val prev = Seq((1L, "aa"), (2L, "bb"), (3L, "cc")).toDF("k", "digest")
    val cur = Seq((2L, "bb"), (3L, "cc2"), (4L, "dd")).toDF("k", "digest")
    val got = Drift.snapshotDiff(prev, cur, "k", "digest")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "GONE", 2L -> "SAME", 3L -> "CHANGED",
      4L -> "NEW"))
  }
}
