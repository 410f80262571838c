package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** Continuous form of the q237 postings merge night: document batches
  * arrive as a stream and each micro-batch APPENDS its (id, term, tf)
  * rows to the postings registry. Postings rows are per-doc, so a merge
  * is a pure UNION (disjoint ids across batches — no combining join at
  * all), but the state is still ADDITIVE, not idempotent: a replayed
  * batch would duplicate its rows. Like the unigram night, the
  * foreachBatch body therefore guards with the last applied batchId
  * (the standard exactly-once recipe for additive state over Spark's
  * at-least-once foreachBatch contract). Final registry == the one-shot
  * termFrequencies of every delivered doc; a replayed batch changes
  * nothing. */
class StreamingPostingsSpec extends SparkSpec {
  import sqlImplicits._

  private val batches: Seq[Seq[(Long, String)]] = Seq(
    Seq((1L, "the cat sat on the mat"), (2L, "the dog")),
    Seq((3L, "the cat ran"), (4L, "a dog ran far")),
    Seq((5L, "the end")))

  test("foreachBatch postings appends converge to the one-shot " +
      "termFrequencies of all delivered docs; a replayed batchId is a " +
      "no-op") {
    implicit val ctx = spark.sqlContext
    var store = Seq.empty[(Long, String, Long)].toDF("id", "term", "tf")
      .localCheckpoint(true)
    var lastApplied = -1L
    val merge = (batch: org.apache.spark.sql.DataFrame, batchId: Long) => {
      if (batchId > lastApplied) {
        store = store.unionByName(
          TextAnalysis.termFrequencies(batch, "doc_id", "text"))
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
    val oneShot = TextAnalysis.termFrequencies(
      batches.flatten.toDF("doc_id", "text"), "doc_id", "text")
    assert(store.except(oneShot).count() === 0L)
    assert(oneShot.except(store).count() === 0L)
    // at-least-once re-delivery: replaying an already-applied batch id
    // must not duplicate its postings rows
    val before = store.collect().toSet
    merge(batches.last.toDF("doc_id", "text"), lastApplied)
    assert(store.collect().toSet === before)
  }
}
