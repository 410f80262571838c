package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Incremental dedup in Structured Streaming — the continuous form of
  * Dedup.incrementalNew: arriving micro-batches drop rows whose content
  * digest is already in the static registry (stream-static anti join),
  * and `dropDuplicates` on the digest carries the within-stream dedup
  * state across batches. */
class StreamingDedupSpec extends SparkSpec {
  import sqlImplicits._

  test("stream-static anti join + digest state dedup across micro-batches") {
    implicit val ctx = spark.sqlContext
    val registry = Seq("seen before").toDF("t")
      .select(md5(col("t").cast("binary")).as("digest"))
    val in = MemoryStream[(Long, String)]
    val deduped = in.toDF().toDF("id", "text")
      .withColumn("digest", md5(col("text").cast("binary")))
      .dropDuplicates("digest")
      .join(registry, Seq("digest"), "left_anti")
    val q = deduped.writeStream.format("memory").queryName("sdedup")
      .outputMode("append").start()
    try {
      in.addData((1L, "seen before"), (2L, "fresh"), (3L, "fresh"))
      q.processAllAvailable()
      // batch 2: a repeat of batch 1's content AND a registry hit — the
      // dedup state must span micro-batches, not reset per batch
      in.addData((4L, "fresh"), (5L, "seen before"), (6L, "brand new"))
      q.processAllAvailable()
      val got = spark.table("sdedup").select("id").collect()
        .map(_.getLong(0)).toSet
      assert(got === Set(2L, 6L))
    } finally q.stop()
  }
}
