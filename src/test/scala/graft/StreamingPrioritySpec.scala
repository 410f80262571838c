package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Continuous form of the LICENSING-AWARE digest registry
  * (q274/q275's survivor rule, `Dedup.compactRegistryPrioritized`):
  * provenance rows (digest, source, batch) stream in nightly, and the
  * compacted state — per digest the highest-priority holder plus the
  * holder count — is maintained by ONE grouped merge per micro-batch,
  * because the survivor choice is a commutative, associative fold
  * (min of the (prio, batch, source) struct, priorities re-attached
  * from the broadcast rank table at merge time) and the holder count
  * is additive.
  *
  * The interesting streaming behavior this night pins: the survivor
  * IMPROVES as permissive copies arrive — a digest first held by a
  * restricted source flips to the permissive holder the micro-batch
  * that holder lands, with no rescan of the history log. The batchId
  * guard is additive-state-standard: a replayed batch would inflate
  * n_holders (and can NEVER flip the survivor back, min is idempotent
  * — the count is the corruption the guard prevents). */
class StreamingPrioritySpec extends SparkSpec {
  import sqlImplicits._

  private val noTomb = Seq.empty[String].toDF("source")
  private val priority =
    Seq(("srcRestricted", 2L), ("srcPermissive", 0L), ("srcMid", 1L))
      .toDF("source", "prio")

  /** Three nightly appends: digest d1 arrives restricted first, then
    * the permissive mirror lands in batch 2 (the flip this night
    * exists to catch); d2 stays single-holder; d3 arrives late. */
  private val batches: Seq[Seq[(String, String, Long)]] = Seq(
    Seq(("d1", "srcRestricted", 1L), ("d2", "srcMid", 1L)),
    Seq(("d1", "srcPermissive", 2L), ("d1", "srcMid", 2L)),
    Seq(("d3", "srcRestricted", 3L), ("d2", "srcMid", 3L)))

  private def log(rows: Seq[(String, String, Long)]): DataFrame =
    rows.toDF("digest", "source", "batch")

  /** The per-batch merge a night runs: compact the delta under the
    * SAME priority rule, union with the held state, and re-compact —
    * legal because the survivor fold is associative and n_holders
    * additive, so (state ⊕ delta) == compact(full log). */
  private def merge(state: DataFrame, delta: DataFrame): DataFrame = {
    val compactedDelta = Dedup.compactRegistryPrioritized(delta,
      "digest", "source", "batch", noTomb, priority)
    val both = state.unionByName(compactedDelta)
    val pr = priority.select(col("source").as("first_source"),
      col("prio").as("__p"))
    both.join(broadcast(pr), Seq("first_source"), "left")
      .withColumn("__p", coalesce(col("__p"), lit(Long.MaxValue)))
      .groupBy(col("digest"))
      .agg(min(struct(col("__p"), col("first_batch"),
          col("first_source"))).as("__f"),
        sum(col("n_holders")).as("n_holders"))
      .select(col("digest"), col("__f")("first_batch").as("first_batch"),
        col("__f")("first_source").as("first_source"), col("n_holders"))
  }

  test("foreachBatch prioritized-registry state converges to the " +
      "one-shot compaction, the survivor flips the batch the " +
      "permissive holder arrives, and a replayed batch is a no-op " +
      "(unguarded it inflates n_holders)") {
    implicit val ctx = spark.sqlContext
    var store = Seq.empty[(String, Long, String, Long)]
      .toDF("digest", "first_batch", "first_source", "n_holders")
      .localCheckpoint(true)
    var lastApplied = -1L
    var d1Timeline = Seq.empty[(Long, String)]
    val sink = (batch: DataFrame, batchId: Long) => {
      if (batchId > lastApplied) {
        store = merge(store, batch).localCheckpoint(true)
        lastApplied = batchId
        store.filter(col("digest") === "d1").collect().foreach { r =>
          d1Timeline = d1Timeline :+
            ((batchId, r.getAs[String]("first_source")))
        }
      }
      ()
    }
    val in = MemoryStream[(String, String, Long)]
    val q = in.toDF().toDF("digest", "source", "batch").writeStream
      .foreachBatch(sink)
      .start()
    try {
      batches.foreach { rows =>
        in.addData(rows: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    // the survivor improved mid-stream: restricted first, permissive
    // from the batch the mirror landed
    assert(d1Timeline === Seq((0L, "srcRestricted"),
      (1L, "srcPermissive"), (2L, "srcPermissive")))
    // the maintained state IS the one-shot compaction of the full log
    val want = Dedup.compactRegistryPrioritized(log(batches.flatten),
        "digest", "source", "batch", noTomb, priority)
      .collect().map(_.toSeq).toSet
    assert(store.collect().map(_.toSeq).toSet === want,
      "streamed state must equal the one-shot prioritized compaction")
    // guarded replay: a re-delivered batchId changes nothing
    val before = store.collect().toSet
    sink(log(batches.last), lastApplied)
    assert(store.collect().toSet === before)
    // the guard is load-bearing: an UNGUARDED replay can never flip
    // the survivor back (min is idempotent) but it inflates the
    // holder counts — the provenance the registry exists to keep
    val unguarded = merge(store, log(batches.last))
    val inflated = unguarded.filter(col("digest") === "d3")
      .head().getAs[Long]("n_holders")
    val held = store.filter(col("digest") === "d3")
      .head().getAs[Long]("n_holders")
    assert(inflated === held + 1L,
      "replaying a batch into the additive count must visibly inflate " +
        "the state this spec guards against")
  }
}
