package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.NearDup

/** Continuous form of the decontamination gate (q82/q231's join run at
  * ADMISSION time, not release time): document batches arrive as a
  * stream, each micro-batch is flagged against the FIXED benchmark
  * gram set, clean docs are admitted to the store and flagged docs
  * routed to a quarantine log. Unlike the unigram merge night
  * (additive, needs a batchId guard), admission is IDEMPOTENT — the
  * per-doc verdict is a pure function of (doc text, benchmark), and
  * the store unions by doc_id — so Spark's at-least-once foreachBatch
  * contract is safe without any replay bookkeeping; the replay test
  * pins exactly that. */
class StreamingDeconSpec extends SparkSpec {
  import sqlImplicits._

  // one bench item whose 4-grams a contaminated doc will carry
  private val bench = Seq((100L, "alpha beta gamma delta epsilon"))
  private val batches: Seq[Seq[(Long, String)]] = Seq(
    Seq((1L, "alpha beta gamma delta leaked here"), // shares a 4-gram
      (2L, "totally unrelated clean text one")),
    Seq((3L, "beta gamma delta epsilon also leaked"),
      (4L, "another clean document arrives")),
    Seq((5L, "clean tail batch")))

  test("admission night: clean docs admitted, contaminated quarantined, " +
      "converges to the one-shot gate, and a replayed batch is a no-op " +
      "WITHOUT a batchId guard (the verdict is idempotent)") {
    implicit val ctx = spark.sqlContext
    val benchDf = bench.toDF("doc_id", "text").localCheckpoint(true)
    var admitted = Seq.empty[(Long, String)].toDF("doc_id", "text")
      .localCheckpoint(true)
    var quarantine = Seq.empty[(Long, Long)].toDF("doc_id", "shared_grams")
      .localCheckpoint(true)
    val gate = (batch: org.apache.spark.sql.DataFrame, batchId: Long) => {
      val flags = NearDup.contaminationReport(batch, "doc_id", "text",
        benchDf, "doc_id", "text", k = 4)
      admitted = admitted.unionByName(
          batch.join(flags.select(col("doc_id")), Seq("doc_id"),
            "left_anti"))
        .dropDuplicates("doc_id").localCheckpoint(true)
      quarantine = quarantine.unionByName(
          flags.select(col("doc_id"), col("shared_grams")))
        .dropDuplicates("doc_id").localCheckpoint(true)
      ()
    }
    val in = MemoryStream[(Long, String)]
    val q = in.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch(gate)
      .start()
    try {
      batches.foreach { docs =>
        in.addData(docs: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    // converges to the one-shot gate over all delivered docs
    val all = batches.flatten.toDF("doc_id", "text")
    val oneShot = NearDup.contaminationReport(all, "doc_id", "text",
      benchDf, "doc_id", "text", k = 4)
    assert(quarantine.select(col("doc_id")).collect().map(_.getLong(0))
      .toSet === oneShot.select(col("doc_id")).collect()
      .map(_.getLong(0)).toSet)
    assert(quarantine.count() === 2L &&
      admitted.count() === batches.flatten.length - 2L)
    assert(admitted.join(quarantine, Seq("doc_id")).count() === 0L,
      "a doc is admitted XOR quarantined")
    // at-least-once re-delivery: replaying ANY batch changes nothing —
    // no batchId guard needed because the verdict is idempotent
    val (aBefore, qBefore) = (admitted.collect().toSet,
      quarantine.collect().toSet)
    gate(batches.head.toDF("doc_id", "text"), 0L)
    assert(admitted.collect().toSet === aBefore)
    assert(quarantine.collect().toSet === qBefore)
  }
}
