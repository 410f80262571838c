package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Continuous form of the BPE anneal admission-bar chain (q279/q280's
  * pool side) — the streaming-maintenance story the quality-bar stage
  * family was missing: gopher-admitted docs arrive nightly with their
  * BPE weight, integer-scaled quality score and pretrain exposure, and
  * the POOL STATE the bar decision reads — per (source, quality band,
  * exposure): doc count, BPE token mass and the exposure·token mass
  * (q279's `se` numerator) — is maintained by ONE grouped merge per
  * micro-batch, because every column is an additive fold.
  *
  * The band cut is FROZEN (fixed q4 thresholds, the frozen-quantizer
  * discipline the semantic registry already follows): the exact
  * corpus decile is a global rank and cannot be maintained
  * incrementally, so the night bands by pinned thresholds and the
  * ten-threshold POOL CURVE (pool_docs/pool_tokens per admission bar,
  * q279's left side) is a suffix-sum READ of the domain-sized state —
  * no log rescan. The batchId guard is additive-state-standard: a
  * replayed batch doubles its rows' masses and silently inflates
  * every bar's fill estimate. */
class StreamingAnnealSpec extends SparkSpec {
  import sqlImplicits._

  /** Frozen band thresholds: band = q4 div 100, clamped to 0..9. */
  private def banded(df: DataFrame): DataFrame =
    df.withColumn("band",
      least(greatest(expr("q4 div 100"), lit(0L)), lit(9L)))

  /** Three nightly appends of (doc_id, source, w_bpe, q4, exposure):
    * batch 2 lands more mass in src1's top band (the bar decision
    * shifts as quality mass arrives); exposures vary so the se
    * numerator is a real fold. */
  private val batches: Seq[Seq[(Long, String, Long, Long, Long)]] = Seq(
    Seq((1L, "src1", 40L, 950L, 1L), (2L, "src2", 25L, 120L, 0L),
      (3L, "src1", 10L, 470L, 2L)),
    Seq((4L, "src1", 55L, 990L, 0L), (5L, "src2", 30L, 830L, 1L),
      (6L, "src3", 20L, 15L, 3L)),
    Seq((7L, "src2", 45L, 505L, 0L), (8L, "src3", 35L, 905L, 2L)))

  private def log(rows: Seq[(Long, String, Long, Long, Long)]): DataFrame =
    rows.toDF("doc_id", "source", "w_bpe", "q4", "exposure")

  /** The additive pool aggregate — state and delta share one spelling,
    * so state ⊕ delta == one-shot over the full log by associativity. */
  private def poolAgg(df: DataFrame): DataFrame =
    banded(df).groupBy(col("source"), col("band"), col("exposure"))
      .agg(count(lit(1)).as("n_docs"), sum(col("w_bpe")).as("n_tok"),
        sum(col("exposure") * col("w_bpe")).as("se"))

  private def merge(state: DataFrame, delta: DataFrame): DataFrame =
    state.unionByName(poolAgg(delta))
      .groupBy(col("source"), col("band"), col("exposure"))
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("n_tok")).as("n_tok"),
        sum(col("se")).as("se"))

  /** The admission-bar pool curve read off the state: per threshold t,
    * the docs/mass of bands >= t — a 10-row suffix-sum over the
    * domain-sized state, never the log. */
  private def poolCurve(state: DataFrame): DataFrame =
    (0L to 9L).map { t =>
      state.filter(col("band") >= t)
        .agg(coalesce(sum(col("n_docs")), lit(0L)).as("pool_docs"),
          coalesce(sum(col("n_tok")), lit(0L)).as("pool_tokens"))
        .select(lit(t).as("threshold"), col("pool_docs"),
          col("pool_tokens"))
    }.reduce(_ unionByName _)

  test("foreachBatch additive pool state converges to the one-shot " +
      "aggregate, the bar curve is a suffix-sum read of the state, " +
      "and a replayed batch is a no-op (unguarded it doubles masses)") {
    implicit val ctx = spark.sqlContext
    var store = Seq.empty[(String, Long, Long, Long, Long, Long)]
      .toDF("source", "band", "exposure", "n_docs", "n_tok", "se")
      .localCheckpoint(true)
    var lastApplied = -1L
    var topBandMass = Seq.empty[(Long, Long)]
    val sink = (batch: DataFrame, batchId: Long) => {
      if (batchId > lastApplied) {
        store = merge(store, batch).localCheckpoint(true)
        lastApplied = batchId
        val m = store.filter(col("band") === 9L)
          .agg(coalesce(sum(col("n_tok")), lit(0L))).head().getLong(0)
        topBandMass = topBandMass :+ ((batchId, m))
      }
      ()
    }
    val in = MemoryStream[(Long, String, Long, Long, Long)]
    val q = in.toDF().toDF("doc_id", "source", "w_bpe", "q4", "exposure")
      .writeStream.foreachBatch(sink).start()
    try {
      batches.foreach { rows =>
        in.addData(rows: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    // quality mass accrued live: the top band grew each night it was fed
    assert(topBandMass === Seq((0L, 40L), (1L, 95L), (2L, 130L)))
    // the maintained state IS the one-shot aggregate of the full log
    val want = poolAgg(log(batches.flatten))
      .collect().map(_.toSeq).toSet
    assert(store.collect().map(_.toSeq).toSet === want,
      "streamed pool state must equal the one-shot aggregate")
    // the curve reads off the state and matches the one-shot curve,
    // monotone in the threshold
    val curve = poolCurve(store).collect()
      .sortBy(_.getAs[Long]("threshold"))
    val wantCurve = poolCurve(poolAgg(log(batches.flatten))).collect()
      .sortBy(_.getAs[Long]("threshold")).map(_.toSeq).toSeq
    assert(curve.map(_.toSeq).toSeq === wantCurve)
    curve.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getAs[Long]("pool_docs") <= a.getAs[Long]("pool_docs"))
        assert(b.getAs[Long]("pool_tokens") <=
          a.getAs[Long]("pool_tokens"))
      case _ => ()
    }
    // guarded replay: a re-delivered batchId changes nothing
    val before = store.collect().toSet
    sink(log(batches.last), lastApplied)
    assert(store.collect().toSet === before)
    // the guard is load-bearing: an unguarded replay doubles the
    // replayed rows' masses and inflates every bar's fill estimate
    val unguarded = merge(store, log(batches.last))
    val t9 = poolCurve(unguarded).filter(col("threshold") === 9L)
      .head().getAs[Long]("pool_tokens")
    assert(t9 === 130L + 35L,
      "replayed top-band mass must visibly inflate the unguarded state")
  }
}
