package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Sessionize
import graft.streaming.StreamingIngest

/** Streaming session windows, and their parity with the batch Sessionize
  * operator on the real events table — one session semantics, two
  * execution modes. */
class StreamingSessionSpec extends SparkSpec {
  import sqlImplicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("sessionCounts merges events within the gap and splits across it") {
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val sessions = StreamingIngest.sessionCounts(
      mem.toDF().toDF("ts", "k"), "ts", "10 seconds", "1 minute", "k")
    val q = sessions.writeStream.format("memory").queryName("sw")
      .outputMode("complete").start()
    try {
      mem.addData(
        (ts("2026-01-01 00:00:00"), "u"), (ts("2026-01-01 00:00:10"), "u"),
        (ts("2026-01-01 00:10:00"), "u"), (ts("2026-01-01 00:00:05"), "v"))
      q.processAllAvailable()
      val got = spark.table("sw")
        .select(col("t_start").cast("string"), col("k"), col("n_events"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      assert(got === Set(
        ("2026-01-01 00:00:00", "u", 2L),
        ("2026-01-01 00:10:00", "u", 1L),
        ("2026-01-01 00:00:05", "v", 1L)))
    } finally q.stop()
  }

  test("streaming 4h sessions over real events equal the batch Sessionize result") {
    val dir = "/root/testdata/sf0.001"
    val batchEvents = spark.read.parquet(s"$dir/events.parquet")
    // on-disk ts is either epoch-nanos long or a µs timestamp (see
    // StreamingSpec) — the file source needs the raw schema, so normalize
    // here rather than via Tables.load
    val tsIsLong =
      batchEvents.schema("ts").dataType == org.apache.spark.sql.types.LongType
    val toTs = if (tsIsLong) expr("timestamp_micros(ts div 1000)")
      else expr("cast(ts AS timestamp)")
    val toMicros = if (tsIsLong) expr("ts DIV 1000")
      else expr("unix_micros(cast(ts AS timestamp))")

    val watched = java.nio.file.Files.createTempDirectory("graft-sess")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      watched.resolve("events.parquet"))
    val src = StreamingIngest.fileSource(spark, batchEvents.schema, watched.toString)
      .withColumn("ets", toTs)
    val q = StreamingIngest
      .sessionCounts(src, "ets", "1 minute", "4 hours", "user_id")
      .writeStream.format("memory").queryName("sess")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("sess")
        .select(col("user_id"), col("t_start").cast("string"), col("n_events"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet

      val batch = Sessionize.sessionStats(
        Sessionize.sessionize(
          batchEvents.select(col("user_id"), col("event_id"),
            toMicros.as("t")),
          "user_id", "t", gap = 14400000000L, order = Seq(col("event_id"))),
        "user_id", "t")
        .select(col("user_id"),
          expr("CAST(timestamp_micros(t_start) AS STRING)"), col("n_events"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet

      assert(streamed === batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }
}
