package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamingIngest

/** Drives the streaming surface with in-memory and file sources: watermarked
  * window counts, bounded-state dedup, and the foreachBatch upsert sink
  * reusing the batch Upsert operator. */
class StreamingSpec extends SparkSpec {
  import sqlImplicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("windowedCounts aggregates into tumbling windows") {
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val counts = StreamingIngest.windowedCounts(
      mem.toDF().toDF("ts", "k"), "ts", "10 seconds", "1 minute", "k")
    val q = counts.writeStream.format("memory").queryName("wc")
      .outputMode("complete").start()
    try {
      mem.addData(
        (ts("2026-01-01 00:00:10"), "a"), (ts("2026-01-01 00:00:20"), "a"),
        (ts("2026-01-01 00:00:30"), "b"), (ts("2026-01-01 00:01:10"), "a"))
      q.processAllAvailable()
      val got = spark.table("wc")
        .select(col("win_start").cast("string"), col("k"), col("cnt"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      assert(got === Set(
        ("2026-01-01 00:00:00", "a", 2L),
        ("2026-01-01 00:00:00", "b", 1L),
        ("2026-01-01 00:01:00", "a", 1L)))
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark dedups re-delivered keys") {
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Int)]
    val dd = StreamingIngest.dedupedWithinWatermark(
      mem.toDF().toDF("ts", "k", "v"), "ts", "1 minute", Seq("k"))
    val q = dd.writeStream.format("memory").queryName("dd")
      .outputMode("append").start()
    try {
      mem.addData(
        (ts("2026-01-01 00:00:01"), "k1", 1),
        (ts("2026-01-01 00:00:02"), "k1", 2), // duplicate delivery
        (ts("2026-01-01 00:00:03"), "k2", 3))
      q.processAllAvailable()
      mem.addData((ts("2026-01-01 00:00:04"), "k1", 4)) // still within watermark
      q.processAllAvailable()
      val got = spark.table("dd").select("k").collect().map(_.getString(0)).toSeq
      assert(got.sorted === Seq("k1", "k2"))
    } finally q.stop()
  }

  test("file-stream windowed counts over real events equal the batch result") {
    val dir = "/root/testdata/sf0.001"
    val batch = spark.read.parquet(s"$dir/events.parquet")
    // events.ts arrives as epoch-nanos LongType (TIMESTAMP(NANOS) testdata
    // under nanosAsLong) or as a µs timestamp — normalize either to a
    // micros-precision TimestampType (the raw read keeps the on-disk schema
    // the streaming file source needs, so this can't ride Tables.load)
    val toTs =
      if (batch.schema("ts").dataType == org.apache.spark.sql.types.LongType)
        org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)")
      else org.apache.spark.sql.functions.expr("cast(ts AS timestamp)")
    // the streaming file source wants a monitored DIRECTORY, not a file
    val watched = java.nio.file.Files.createTempDirectory("graft-events")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      watched.resolve("events.parquet"))
    val src = StreamingIngest.fileSource(spark, batch.schema, watched.toString)
      .withColumn("ets", toTs)
    val counts = StreamingIngest.windowedCounts(src, "ets", "1 minute", "1 hour", "event_type")
    val q = counts.writeStream.format("memory").queryName("ew")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("ew")
        .select(col("win_start").cast("string"), col("event_type"), col("cnt"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      val expected = batch.withColumn("ets", toTs)
        .groupBy(window(col("ets"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("cnt"))
        .select(col("window.start").cast("string"), col("event_type"), col("cnt"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      assert(streamed === expected)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("streaming CSV ingest of the reference's v2 files repairs headers and lands all rows") {
    val watched = java.nio.file.Files.createTempDirectory("graft-flights-stream")
    // drop the 10k file first, the corrupt-header 5k file arrives later
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/reference/Seccion_2_Python/flights_10000v2.csv"),
      watched.resolve("f1.csv"))
    val src = graft.sources.FlightsIo.streamV2(spark, watched.toString)
    val q = src.writeStream.format("memory").queryName("fl")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("fl").count() === 10000L)
      java.nio.file.Files.copy(
        java.nio.file.Paths.get("/root/reference/Seccion_2_Python/flights_5000v2.csv"),
        watched.resolve("f2.csv"))
      q.processAllAvailable()
      val t = spark.table("fl")
      assert(t.count() === 15000L)
      assert(t.columns.toSeq === graft.sources.FlightsIo.columns)
      // the corrupt header row was skipped, not ingested as data
      assert(t.filter(col("Col_1") === "Col_1").count() === 0L)
    } finally q.stop()
  }

  test("upsertSink merges file-arrival micro-batches into the parquet target") {
    val root = java.nio.file.Files.createTempDirectory("graft-stream").toString
    val (in, target, ckpt) = (s"$root/in", s"$root/target", s"$root/ckpt")
    new java.io.File(in).mkdirs()

    // batch 1: two keys
    Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("k", "v", "price")
      .write.parquet(s"$in/b1")

    val schema = spark.read.parquet(s"$in/b1").schema
    val src = StreamingIngest.fileSource(spark, schema, s"$in/*", 10)
    val q = StreamingIngest.upsertSink(src, "k", target, ckpt).start()
    try {
      q.processAllAvailable()
      assert(spark.read.parquet(target).count() === 2)

      // batch 2: update k=2, insert k=3 — new rows must win
      Seq((2L, "b2", 25.0), (3L, "c", 30.0)).toDF("k", "v", "price")
        .write.parquet(s"$in/b2")
      q.processAllAvailable()
      val got = spark.read.parquet(target)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
      assert(got === Set((1L, "a", 10.0), (2L, "b2", 25.0), (3L, "c", 30.0)))
    } finally q.stop()
  }
}
