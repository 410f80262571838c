package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.NearDup

/** Continuous form of NearDup.incrementalNearDups — the deployment shape
  * of the cross-batch near-dup registry: each micro-batch runs the batch
  * operator against the accumulated fingerprint registry via foreachBatch,
  * then appends its survivors' (band, bucket) rows. Near-dups of docs kept
  * in ANY earlier micro-batch must drop, exactly like the digest registry
  * in StreamingDedupSpec — and re-feeding already-registered content must
  * converge to zero survivors. */
class StreamingNearDupSpec extends SparkSpec {
  import sqlImplicits._

  test("foreachBatch near-dup registry accumulates across micro-batches " +
      "and converges") {
    implicit val ctx = spark.sqlContext
    val textA = (0 until 40).map(i => s"alpha$i").mkString(" ")
    val textB = (0 until 40).map(i => s"beta$i").mkString(" ")
    val textC = (0 until 40).map(i => s"gamma$i").mkString(" ")
    def lshOf(df: DataFrame) =
      NearDup.minHashLsh(df, "doc_id", "text", k = 3, bands = 16,
        rowsPerBand = 4, seed = 42L)

    var registry = Seq.empty[(Int, String)].toDF("band", "bucket")
    val survivors = scala.collection.mutable.ArrayBuffer.empty[Long]
    val in = MemoryStream[(Long, String)]
    val q = in.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val out = NearDup.incrementalNearDups(lshOf(batch), registry)
          .localCheckpoint(true)
        survivors ++= out.select("id").distinct()
          .collect().map(_.getLong(0))
        registry = registry
          .unionByName(out.select("band", "bucket")).distinct()
          .localCheckpoint(true)
        ()
      }
      .start()
    try {
      // batch 1: A kept once (in-batch twin drops)
      in.addData((1L, textA), (2L, textA))
      q.processAllAvailable()
      // batch 2: a copy of A drops AGAINST THE REGISTRY (not in-batch);
      // B is new and survives
      in.addData((3L, textA), (4L, textB))
      q.processAllAvailable()
      // batch 3: copies of both registered texts drop; C survives
      in.addData((5L, textB), (6L, textA), (7L, textC))
      q.processAllAvailable()
      assert(survivors.toSet === Set(1L, 4L, 7L), s"got $survivors")
      // convergence: re-feeding only registered content yields nothing
      in.addData((8L, textA), (9L, textB), (10L, textC))
      q.processAllAvailable()
      assert(survivors.toSet === Set(1L, 4L, 7L),
        s"registry failed to converge: $survivors")
    } finally q.stop()
  }

  test("three-batch night with compactFingerprints BETWEEN micro-batches: " +
      "verdicts identical to the uncompacted batch replay") {
    implicit val ctx = spark.sqlContext
    val textA = (0 until 40).map(i => s"alpha$i").mkString(" ")
    val textB = (0 until 40).map(i => s"beta$i").mkString(" ")
    val textC = (0 until 40).map(i => s"gamma$i").mkString(" ")
    def lshOf(df: DataFrame) =
      NearDup.minHashLsh(df, "doc_id", "text", k = 3, bands = 16,
        rowsPerBand = 4, seed = 42L)
    val noTombstones = Seq.empty[String].toDF("source")

    // provenance-carrying registry LOG: (band, bucket, source, batch_id)
    var log = Seq.empty[(Int, String, String, Long)]
      .toDF("band", "bucket", "source", "batch_id")
    val survivors = scala.collection.mutable.ArrayBuffer.empty[Long]
    val in = MemoryStream[(Long, String)]
    val q = in.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        // the nightly shape: compact FIRST (retire, dedupe holders), then
        // decide the batch against the compacted registry, then append
        val compacted = NearDup.compactFingerprints(log, "source",
            "batch_id", noTombstones)
          .select(col("band"), col("bucket"),
            col("first_source").as("source"),
            col("first_batch").as("batch_id"))
          .localCheckpoint(true)
        val out = NearDup.incrementalNearDups(lshOf(batch), compacted)
          .localCheckpoint(true)
        survivors ++= out.select("id").distinct()
          .collect().map(_.getLong(0))
        log = compacted.unionByName(
            out.select(col("band"), col("bucket"),
              concat(lit("doc_"), col("id")).as("source"),
              lit(bid).as("batch_id")))
          .localCheckpoint(true)
        ()
      }
      .start()
    try {
      in.addData((1L, textA), (2L, textA))
      q.processAllAvailable()
      in.addData((3L, textA), (4L, textB))
      q.processAllAvailable()
      in.addData((5L, textB), (6L, textA), (7L, textC))
      q.processAllAvailable()
      // identical verdict set to the uncompacted run above — compaction
      // with no retirements is verdict-preserving mid-stream
      assert(survivors.toSet === Set(1L, 4L, 7L), s"got $survivors")
      // and the compacted log still converges on re-fed content
      in.addData((8L, textA), (9L, textB), (10L, textC))
      q.processAllAvailable()
      assert(survivors.toSet === Set(1L, 4L, 7L),
        s"compacted registry failed to converge: $survivors")
    } finally q.stop()
  }
}
