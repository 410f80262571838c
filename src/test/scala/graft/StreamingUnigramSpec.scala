package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** Continuous form of the q214 merge night: document batches arrive as
  * a stream and each micro-batch MERGES its unigram counts into the
  * registry. Counts are additive — NOT idempotent — so unlike the
  * takedown night the foreachBatch body must guard against
  * at-least-once re-delivery itself: it keeps the last applied batchId
  * and skips replays (the standard exactly-once recipe for additive
  * state over Spark's at-least-once foreachBatch contract). Final
  * registry == one-shot count of every delivered doc; a replayed batch
  * changes nothing. */
class StreamingUnigramSpec extends SparkSpec {
  import sqlImplicits._

  private val batches: Seq[Seq[(Long, String)]] = Seq(
    Seq((1L, "the cat sat"), (2L, "the dog")),
    Seq((3L, "the cat ran"), (4L, "a dog ran")),
    Seq((5L, "the end")))

  test("foreachBatch merge nights converge to the one-shot count of all " +
      "delivered docs; a replayed batchId is a no-op") {
    implicit val ctx = spark.sqlContext
    var store = Seq.empty[(String, Long)].toDF("term", "cnt")
      .localCheckpoint(true)
    var lastApplied = -1L
    val merge = (batch: org.apache.spark.sql.DataFrame, batchId: Long) => {
      if (batchId > lastApplied) {
        store = TextAnalysis.mergeUnigramCounts(
          store,
          TextAnalysis.unigramCounts(batch, "doc_id", "text"))
          .localCheckpoint(true)
        lastApplied = batchId
      }
      ()
    }
    val in = MemoryStream[(Long, String)]
    val q = in.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch(merge)
      .start()
    try {
      batches.foreach { docs =>
        in.addData(docs: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val oneShot = TextAnalysis.unigramCounts(
      batches.flatten.toDF("doc_id", "text"), "doc_id", "text")
    assert(store.except(oneShot).count() === 0L)
    assert(oneShot.except(store).count() === 0L)
    // at-least-once re-delivery: replaying an already-applied batch id
    // must not double-count
    val before = store.collect().toSet
    merge(batches.last.toDF("doc_id", "text"), lastApplied)
    assert(store.collect().toSet === before)
  }
}
