package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Sweep
import graft.operators.Sweep.SumSpec

/** The distributed prefix sum must equal the naive single-partition global
  * window bit-for-bit, bucket layout notwithstanding — including tied
  * timestamps (RANGE-frame peers) and tiny bucket counts. */
class SweepSpec extends SparkSpec {
  import sqlImplicits._

  test("prefixSums equals the global-window result, with ties, any bucket count") {
    // deterministic pseudo-random points with repeats (ties on t)
    val pts = (0 until 500).map { i =>
      (i.toLong, (i * 2654435761L % 97L), if (i % 3 == 0) 1L else 0L)
    }.toDF("id", "t", "v")
    val expected = pts
      .withColumn("incl", sum(col("v")).over(
        Window.orderBy("t").rangeBetween(Window.unboundedPreceding, 0)))
      .withColumn("excl", coalesce(sum(col("v")).over(
        Window.orderBy("t").rangeBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("id", "incl", "excl").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    for (buckets <- Seq(1, 4, 64)) {
      val got = Sweep.prefixSums(pts, "t",
        Seq(SumSpec("incl", col("v"), inclusive = true),
          SumSpec("excl", col("v"), inclusive = false)), buckets)
        .select("id", "incl", "excl").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got === expected, s"buckets=$buckets")
    }
  }

  test("prefixSums shuffles by bucket, not into one partition") {
    val pts = spark.range(1000).select(col("id"),
      (col("id") * 7 % 997).as("t"), lit(1L).as("v"))
    val p = Sweep.prefixSums(pts, "t", Seq(SumSpec("s", col("v"), true)))
      .queryExecution.executedPlan.toString
    assert(p.contains("Exchange hashpartitioning(_bkt"), p)
  }

  test("concurrencyAtStarts equals the brute-force overlap count") {
    // deterministic intervals, some overlapping, some touching exactly
    val iv = (0 until 200).map { i =>
      val s = (i * 40503L) % 1000L
      (i.toLong, s, s + (i % 7) * 30L)
    }
    val df = iv.toDF("id", "s", "e")
    val got = Sweep.concurrencyAtStarts(df, "s", "e")
      .select("id", "concurrency").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    iv.foreach { case (id, s, _) =>
      val brute = iv.count { case (_, s2, e2) => s2 <= s && e2 >= s }
      assert(got(id) === brute.toLong, s"interval $id start=$s")
    }
  }
}
