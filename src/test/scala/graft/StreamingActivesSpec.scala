package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Stats

/** Rolling distinct actives maintained INCREMENTALLY: the contribution
  * explode (activity at bucket b counts toward report buckets [b, b+w))
  * plus streaming dropDuplicates over (entity, report bucket) converges
  * to exactly the batch rollingActiveCounts over the same data — the
  * trailing-window engagement monitor without a per-report corpus
  * re-scan. */
class StreamingActivesSpec extends SparkSpec {
  import sqlImplicits._

  test("streaming contribution counts converge to batch rolling actives") {
    implicit val ctx = spark.sqlContext
    val window = 3
    val in = MemoryStream[(Long, Long)] // (user, bucket)
    val contrib = in.toDF().toDF("u", "b")
      .select(col("u"),
        explode(sequence(col("b"), col("b") + (window - 1))).as("bucket"))
      .dropDuplicates("u", "bucket") // streaming distinct state
      .groupBy(col("bucket")).agg(count(lit(1)).as("n_active"))
    val q = contrib.writeStream.format("memory").queryName("actives")
      .outputMode("complete").start()

    // user 1 on buckets 1 and 3 (duplicate arrival), user 2 on bucket 3
    val batch1 = Seq((1L, 1L), (1L, 1L))
    val batch2 = Seq((1L, 3L), (2L, 3L), (1L, 1L)) // replays bucket 1 too
    try {
      in.addData(batch1: _*)
      q.processAllAvailable()
      in.addData(batch2: _*)
      q.processAllAvailable()
      val streamed = spark.table("actives").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap

      val all = (batch1 ++ batch2).toDF("u", "b")
      val batch = Stats.rollingActiveCounts(all, "u", col("b"), window)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

      // the batch operator reports only OBSERVED buckets; the streaming
      // state carries every contributed bucket — restrict and compare
      batch.foreach { case (b, n) =>
        assert(streamed(b) === n, s"bucket $b")
      }
      // spot the semantics: bucket 3 sees user 1 (from bucket 1's tail
      // and its own activity, deduped) plus user 2
      assert(batch(3L) === 2L)
      assert(batch(1L) === 1L)
    } finally q.stop()
  }
}
