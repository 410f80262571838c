package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Mixture

/** Continuous form of the budget family's input: document batches
  * arrive as a stream and each micro-batch ADDS its per-source token
  * counts into the (source, n_tok) domain table the q232/q236 waterfill
  * allocates over. The grouped sums are ADDITIVE state (a replayed
  * batch would double-count its tokens), so the foreachBatch body
  * carries the batchId guard — the same exactly-once recipe as the
  * unigram and postings nights. The allocation itself is NOT maintained
  * incrementally: it is a closed-form k-row function of the domain
  * table, so each night simply re-waterfills (domain-sized work — the
  * whole point of the mixture-family shape). Final allocation == the
  * one-shot allocation over all delivered docs; a replayed batch
  * changes nothing. */
class StreamingMixSpec extends SparkSpec {
  import sqlImplicits._

  private val batches: Seq[Seq[(Long, String, Long)]] = Seq(
    Seq((1L, "web", 40L), (2L, "web", 25L), (3L, "books", 90L)),
    Seq((4L, "code", 12L), (5L, "books", 33L)),
    Seq((6L, "web", 7L), (7L, "code", 55L), (8L, "wiki", 20L)))

  private def alloc(counts: org.apache.spark.sql.DataFrame) =
    Mixture.unimaxAllocation(counts, "source", "n_tok",
      maxEpochs = 2L, budgetNum = 3L, budgetDen = 2L)

  test("foreachBatch per-source token sums converge to the one-shot " +
      "domain table (batchId-guarded additive state), the nightly " +
      "re-waterfill equals the one-shot allocation, and a replayed " +
      "batch is a no-op") {
    implicit val ctx = spark.sqlContext
    var store = Seq.empty[(String, Long)].toDF("source", "n_tok")
      .localCheckpoint(true)
    var lastApplied = -1L
    val merge = (batch: org.apache.spark.sql.DataFrame, batchId: Long) => {
      if (batchId > lastApplied) {
        store = store.unionByName(
            batch.groupBy(col("source")).agg(sum(col("w")).as("n_tok")))
          .groupBy(col("source")).agg(sum(col("n_tok")).as("n_tok"))
          .localCheckpoint(true)
        lastApplied = batchId
      }
      ()
    }
    val in = MemoryStream[(Long, String, Long)]
    val q = in.toDF().toDF("doc_id", "source", "w").writeStream
      .foreachBatch(merge)
      .start()
    try {
      batches.foreach { docs =>
        in.addData(docs: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val oneShotCounts = batches.flatten.toDF("doc_id", "source", "w")
      .groupBy(col("source")).agg(sum(col("w")).as("n_tok"))
    assert(store.except(oneShotCounts).count() === 0L &&
      oneShotCounts.except(store).count() === 0L,
      "the streamed domain table must equal the one-shot grouped sums")
    val night = alloc(store).collect().toSet
    val oneShot = alloc(oneShotCounts).collect().toSet
    assert(night === oneShot,
      "re-waterfilling the streamed domain table must reproduce the " +
        "one-shot allocation exactly")
    // at-least-once re-delivery: replaying an applied batchId must not
    // double-count its tokens (additive state needs the guard)
    val before = store.collect().toSet
    merge(batches.last.toDF("doc_id", "source", "w"), lastApplied)
    assert(store.collect().toSet === before)
  }

  test("the allocation is NOT additive across batches — allocating " +
      "per batch and summing diverges from allocating the merged " +
      "table (why the night re-waterfills instead of merging cards)") {
    val perBatch = batches.map(docs =>
      alloc(docs.toDF("doc_id", "source", "w")
        .groupBy(col("source")).agg(sum(col("w")).as("n_tok"))))
      .map(_.select(col("source"), col("alloc")))
      .reduce(_ unionByName _)
      .groupBy(col("source")).agg(sum(col("alloc")).as("alloc"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val merged = alloc(batches.flatten.toDF("doc_id", "source", "w")
        .groupBy(col("source")).agg(sum(col("w")).as("n_tok")))
      .collect().map(r => r.getAs[String]("source") ->
        r.getAs[Long]("alloc")).toMap
    assert(perBatch != merged,
      "summed per-batch allocations must NOT equal the merged " +
        "allocation on this fixture — the waterfill is global by design")
  }
}
