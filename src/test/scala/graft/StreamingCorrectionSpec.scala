package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Mixture

/** Continuous form of the confusion-corrected allocation (q281/q283's
  * chain): routed docs stream in nightly — a few carry a human label
  * (the calibration stream), the rest only the router's prediction —
  * and BOTH inputs of the correction are additive state maintained by
  * one grouped merge each per micro-batch: the calibration matrix's
  * (true, pred) token-mass cells and the per-predicted-label routed
  * masses. The corrected masses are then a MATRIX-SIZED read of the
  * two states ([[Mixture.confusionCorrectedMasses]]) at any point in
  * the stream — no log rescan, ever.
  *
  * The night's interesting behavior: a language INVISIBLE to the
  * correction (no calibration evidence yet — the router files its
  * docs under 'en') starts recovering mass THE BATCH its first labeled
  * example lands, exactly like the priority registry's
  * flip-on-arrival. The batchId guard is additive-state-standard: a
  * replayed batch doubles both the matrix cells and the routed
  * masses; the corrected READ then still looks plausible (the
  * posterior is scale-free per column) — which is exactly why the
  * guard matters: the corruption hides in the corrected numbers and
  * only the mass ledgers expose it. */
class StreamingCorrectionSpec extends SparkSpec {
  import sqlImplicits._

  /** (doc_id, lang, lang_pred, n_tok); lang empty = unlabeled (the
    * application stream). The router files everything under 'en'.
    * fr's first labeled example lands in batch 1. */
  private val batches: Seq[Seq[(Long, String, String, Long)]] = Seq(
    Seq((1L, "en", "en", 10L), (2L, "es", "en", 20L),
      (3L, "", "en", 40L), (4L, "", "en", 30L)),
    Seq((5L, "fr", "en", 15L), (6L, "", "en", 50L), (7L, "en", "en", 5L)),
    Seq((8L, "es", "en", 10L), (9L, "", "en", 25L), (10L, "", "en", 35L)))

  private def log(rows: Seq[(Long, String, String, Long)]): DataFrame =
    rows.toDF("doc_id", "lang", "lang_pred", "n_tok")

  private def matrixAgg(df: DataFrame): DataFrame =
    df.filter(col("lang") =!= "")
      .groupBy(col("lang"), col("lang_pred"))
      .agg(sum(col("n_tok")).as("n_tokens"))

  private def routedAgg(df: DataFrame): DataFrame =
    df.filter(col("lang") === "")
      .groupBy(col("lang_pred").as("lang"))
      .agg(sum(col("n_tok")).as("n_tok"))

  private def mergeOn(keys: Seq[String], massCol: String)(
      state: DataFrame, delta: DataFrame): DataFrame =
    state.unionByName(delta)
      .groupBy(keys.map(col): _*)
      .agg(sum(col(massCol)).as(massCol))

  private def corrected(routed: DataFrame, matrix: DataFrame)
      : Map[String, Long] =
    Mixture.confusionCorrectedMasses(routed, "lang", "n_tok",
        matrix, "lang", "lang_pred", "n_tokens")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("foreachBatch matrix + routed states converge to the one-shot " +
      "aggregates, an unseen language starts recovering the batch its " +
      "first label lands, and a replayed batch is a no-op (unguarded " +
      "it doubles both ledgers while the corrected READ stays " +
      "plausible — the hidden corruption the guard exists for)") {
    implicit val ctx = spark.sqlContext
    var mState = Seq.empty[(String, String, Long)]
      .toDF("lang", "lang_pred", "n_tokens").localCheckpoint(true)
    var rState = Seq.empty[(String, Long)]
      .toDF("lang", "n_tok").localCheckpoint(true)
    var lastApplied = -1L
    var frTimeline = Seq.empty[(Long, Long)]
    val sink = (batch: DataFrame, batchId: Long) => {
      if (batchId > lastApplied) {
        mState = mergeOn(Seq("lang", "lang_pred"), "n_tokens")(
          mState, matrixAgg(batch)).localCheckpoint(true)
        rState = mergeOn(Seq("lang"), "n_tok")(
          rState, routedAgg(batch)).localCheckpoint(true)
        lastApplied = batchId
        frTimeline = frTimeline :+
          ((batchId, corrected(rState, mState).getOrElse("fr", 0L)))
      }
      ()
    }
    val in = MemoryStream[(Long, String, String, Long)]
    val q = in.toDF().toDF("doc_id", "lang", "lang_pred", "n_tok")
      .writeStream.foreachBatch(sink).start()
    try {
      batches.foreach { rows =>
        in.addData(rows: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    // fr was invisible to the correction until its first labeled
    // example landed in batch 1 — from then it draws routed mass
    assert(frTimeline.head === ((0L, 0L)))
    assert(frTimeline(1)._2 > 0L && frTimeline(2)._2 > 0L,
      s"fr must start recovering at batch 1: $frTimeline")
    // both maintained states equal the one-shot aggregates of the log
    val full = log(batches.flatten)
    assert(mState.collect().map(_.toSeq).toSet ===
      matrixAgg(full).collect().map(_.toSeq).toSet)
    assert(rState.collect().map(_.toSeq).toSet ===
      routedAgg(full).collect().map(_.toSeq).toSet)
    // ...and therefore the corrected read equals the one-shot one
    assert(corrected(rState, mState) ===
      corrected(routedAgg(full), matrixAgg(full)))
    // guarded replay: no-op
    val (mBefore, rBefore) =
      (mState.collect().toSet, rState.collect().toSet)
    sink(log(batches.last), lastApplied)
    assert(mState.collect().toSet === mBefore)
    assert(rState.collect().toSet === rBefore)
    // the guard is load-bearing — and the corruption HIDES: an
    // unguarded replay doubles the replayed ledger entries...
    val mBad = mergeOn(Seq("lang", "lang_pred"), "n_tokens")(
      mState, matrixAgg(log(batches.last)))
    val rBad = mergeOn(Seq("lang"), "n_tok")(
      rState, routedAgg(log(batches.last)))
    val esCell = mBad.filter(col("lang") === "es").head()
      .getAs[Long]("n_tokens")
    assert(esCell === 30L + 10L,
      "the replayed es calibration cell must visibly inflate")
    // ...while the corrected totals still track the (inflated) routed
    // total — scale-free per column, so the read alone can't reveal it
    val corrBad = corrected(rBad, mBad)
    assert(corrBad.values.sum <= rBad.agg(sum(col("n_tok"))).head()
      .getLong(0))
  }
}
