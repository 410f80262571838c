package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity}

/** Continuous form of the embedding-space SemDeDup registry — the q178
  * pipeline as a foreachBatch night, mirroring StreamingXsubSpec at
  * embedding granularity: the quantizer is FROZEN before the stream
  * starts (trained once on history), each micro-batch is assigned
  * against those exact bits and decided against the accumulated (and
  * nightly-compacted) exemplar registry, then the batch's own surviving
  * exemplars are appended as provenance rows. Verdicts must be
  * IDENTICAL to replaying the same batches through the batch operators
  * sequentially — streaming is a deployment shape, not a semantics
  * change. */
class StreamingSemDedupSpec extends SparkSpec {
  import sqlImplicits._

  private val tau = 0.9
  private val cap = 16L

  // history: one vector near e1, one near e2 — trains the frozen 2-list
  // quantizer and seeds the registry with both as exemplars
  private val hist = Seq(
    (1L, Seq(1.0, 0.1, 0.0, 0.0)),
    (2L, Seq(0.1, 1.0, 0.0, 0.0)))

  private val batches: Seq[Seq[(Long, Seq[Double])]] = Seq(
    // batch 0: 10 is a near-copy of HISTORY vector 1 (no in-batch twin —
    // only the registry can see it); 11 is fresh content
    Seq((10L, Seq(0.999, 0.1001, 0.0, 0.0)),
        (11L, Seq(0.0, 0.0, 1.0, 0.0))),
    // batch 1: 20 re-feeds 11's content (covered via the exemplar
    // appended last night); 21 is fresh
    Seq((20L, Seq(0.0, 0.0, 1.0, 0.0)),
        (21L, Seq(0.0, 0.0, 0.0, 1.0))),
    // batch 2: 30/31 are an identical WITHIN-batch pair of fresh
    // content — earlier id survives, later is a batch dup, not history
    Seq((30L, Seq(0.7, 0.0, 0.7, 0.0)),
        (31L, Seq(0.7, 0.0, 0.7, 0.0))))

  private def verdictMap(df: DataFrame): Map[Long, (Boolean, Boolean)] =
    df.select(col("vec_id"), col("is_dup"), col("vs_history"))
      .collect().map(r => r.getLong(0) -> ((r.getBoolean(1), r.getBoolean(2))))
      .toMap

  /** One night: decide the batch against the compacted registry, then
    * return (verdicts, appended payload rows, appended log rows). The
    * appended exemplars are the capped smallest-id SURVIVORS of the
    * full (history + within-batch) verdict — a batch vector that
    * duplicates history must NOT become an exemplar. */
  private def night(batchA: DataFrame, exemplars: DataFrame, bid: Long)
      : (Map[Long, (Boolean, Boolean)], DataFrame, DataFrame) = {
    val verdicts = Similarity.semDedupVsRegistry(batchA, exemplars,
      tau, cap).localCheckpoint(true)
    val survivors = batchA.join(
        verdicts.filter(!col("is_dup")).select(col("vec_id")),
        Seq("vec_id"), "left_semi")
      .withColumn("__er", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("cluster")).orderBy(col("vec_id"))))
      .filter(col("__er") <= cap)
      .select(col("cluster"), col("vec_id"), col("e"))
      .localCheckpoint(true)
    val log = survivors.select(col("vec_id"),
      lit("b" + bid).as("source"), lit(bid).as("batch_id"))
    (verdictMap(verdicts), survivors, log.localCheckpoint(true))
  }

  private def frozenAndSeed(): (DataFrame, DataFrame, DataFrame) = {
    val h = hist.toDF("vec_id", "embedding")
    val frozen = Similarity.trainedCentroids(
      Similarity.lloydAssigned(h, iters = 2, k = 2)).localCheckpoint(true)
    val histA = Similarity.assignEmbeddings(h, frozen)
    val ex0 = Similarity.semDedupExemplars(histA, tau, cap)
      .localCheckpoint(true)
    val log0 = ex0.select(col("vec_id"), lit("hist").as("source"),
      lit(0L).as("batch_id")).localCheckpoint(true)
    (frozen, ex0, log0)
  }

  /** The batch-mode oracle: same nights run sequentially. */
  private def batchReplay(): Map[Long, (Boolean, Boolean)] = {
    val (frozen, ex0, log0) = frozenAndSeed()
    val noTomb = Seq.empty[String].toDF("source")
    var payload = ex0
    var log = log0
    var out = Map.empty[Long, (Boolean, Boolean)]
    batches.zipWithIndex.foreach { case (vecs, bid) =>
      val batchA = Similarity.assignEmbeddings(
        vecs.toDF("vec_id", "embedding"), frozen).localCheckpoint(true)
      val compacted = Dedup.compactRegistry(log, "vec_id", "source",
        "batch_id", noTomb)
      val exemplars = payload.join(compacted.select(col("vec_id")),
        Seq("vec_id"), "left_semi")
      val (verdicts, addedEx, addedLog) =
        night(batchA, exemplars, bid.toLong + 1L)
      out ++= verdicts
      payload = payload.unionByName(addedEx).localCheckpoint(true)
      log = compacted.select(col("vec_id"),
          col("first_source").as("source"),
          col("first_batch").as("batch_id"))
        .unionByName(addedLog).localCheckpoint(true)
    }
    out
  }

  test("foreachBatch SemDeDup night (frozen quantizer, compact between " +
      "batches): verdicts identical to the sequential batch replay, and " +
      "history coverage needs no in-batch twin") {
    implicit val ctx = spark.sqlContext
    val (frozen, ex0, log0) = frozenAndSeed()
    val noTomb = Seq.empty[String].toDF("source")
    var payload = ex0
    var log = log0
    var seen = Map.empty[Long, (Boolean, Boolean)]
    val in = MemoryStream[(Long, Seq[Double])]
    val q = in.toDF().toDF("vec_id", "embedding").writeStream
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        val batchA = Similarity.assignEmbeddings(batch, frozen)
          .localCheckpoint(true)
        // the nightly shape: compact FIRST, decide, then append
        val compacted = Dedup.compactRegistry(log, "vec_id", "source",
          "batch_id", noTomb).localCheckpoint(true)
        val exemplars = payload.join(compacted.select(col("vec_id")),
          Seq("vec_id"), "left_semi")
        val (verdicts, addedEx, addedLog) =
          night(batchA, exemplars, bid + 1L)
        seen ++= verdicts
        payload = payload.unionByName(addedEx).localCheckpoint(true)
        log = compacted.select(col("vec_id"),
            col("first_source").as("source"),
            col("first_batch").as("batch_id"))
          .unionByName(addedLog).localCheckpoint(true)
        ()
      }
      .start()
    try {
      batches.foreach { vecs =>
        in.addData(vecs: _*)
        q.processAllAvailable()
      }
      val expected = batchReplay()
      assert(seen === expected,
        s"streaming verdicts $seen != batch replay $expected")
      // the planted structure actually exercised the registry:
      // 10 dropped ONLY via history; 20 via last night's appended
      // exemplar; 31 is a within-batch dup (not history); 11/21/30 kept
      assert(seen === Map(
        10L -> ((true, true)), 11L -> ((false, false)),
        20L -> ((true, true)), 21L -> ((false, false)),
        30L -> ((false, false)), 31L -> ((true, false))))
      // convergence: re-feeding only registered content drops it via
      // history without disturbing any other verdict
      in.addData((40L, Seq(0.7, 0.0, 0.7, 0.0)))
      q.processAllAvailable()
      assert(seen(40L) === ((true, true)),
        "re-fed registered content was not covered by the registry")
      assert(seen.size === 7)
    } finally q.stop()
  }
}
