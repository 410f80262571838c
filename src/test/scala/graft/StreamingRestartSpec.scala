package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.streaming.StreamingIngest

/** Checkpoint-RESTART semantics of the file-source ingest — the property
  * a nightly deployment actually leans on: a query stopped mid-stream
  * and restarted from the same checkpoint resumes exactly where it left
  * off (every input file processed exactly once across query
  * incarnations, nothing re-applied, nothing lost). The counting test
  * pins exactly-once delivery directly; the upsert test pins that the
  * merge target converges to the same state a never-stopped query would
  * produce. */
class StreamingRestartSpec extends SparkSpec {
  import sqlImplicits._

  test("a restarted query resumes from the checkpoint: every input file " +
      "is processed exactly once across incarnations, and an idle " +
      "restart processes nothing") {
    val root = java.nio.file.Files.createTempDirectory("graft-restart")
      .toString
    val (in, ckpt) = (s"$root/in", s"$root/ckpt")
    new java.io.File(in).mkdirs()
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
      .write.parquet(s"$in/b1")
    val schema = spark.read.parquet(s"$in/b1").schema
    val seen = scala.collection.mutable.ArrayBuffer.empty[Long]
    def run(): Unit = {
      val q = StreamingIngest.fileSource(spark, schema, s"$in/*", 10)
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: DataFrame, _: Long) =>
          seen += batch.count(); ()
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    run()
    assert(seen.sum === 3L, s"first incarnation must see b1: $seen")
    // new data lands while the query is DOWN
    Seq((2L, "b2"), (4L, "d")).toDF("k", "v").write.parquet(s"$in/b2")
    run()
    assert(seen.sum === 5L,
      s"restart must process ONLY the new file, never re-deliver b1: $seen")
    run()
    assert(seen.sum === 5L, s"idle restart must process nothing: $seen")
  }

  test("upsertSink across a stop/restart converges to the same target a " +
      "never-stopped query produces") {
    val root = java.nio.file.Files.createTempDirectory("graft-restart2")
      .toString
    val (in, target, ckpt) = (s"$root/in", s"$root/target", s"$root/ckpt")
    new java.io.File(in).mkdirs()
    Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("k", "v", "price")
      .write.parquet(s"$in/b1")
    val schema = spark.read.parquet(s"$in/b1").schema
    def run(): Unit = {
      val q = StreamingIngest.upsertSink(
        StreamingIngest.fileSource(spark, schema, s"$in/*", 10),
        "k", target, ckpt).start()
      try q.processAllAvailable() finally q.stop()
    }
    run()
    // update k=2 and insert k=3 while the query is down; the restarted
    // incarnation must apply exactly this delta on top of the target
    Seq((2L, "b2", 25.0), (3L, "c", 30.0)).toDF("k", "v", "price")
      .write.parquet(s"$in/b2")
    run()
    val got = spark.read.parquet(target)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .toSet
    assert(got === Set((1L, "a", 10.0), (2L, "b2", 25.0), (3L, "c", 30.0)))
  }
}
