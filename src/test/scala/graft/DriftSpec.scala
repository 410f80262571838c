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
