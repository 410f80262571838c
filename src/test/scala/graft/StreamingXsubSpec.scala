package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, NearDup}

/** Continuous form of the exact-substring gram registry — the q172/q175
  * pipeline as a foreachBatch night, mirroring StreamingNearDupSpec at
  * gram granularity: each micro-batch's spans are decided against the
  * accumulated (and nightly-compacted) gram-digest registry, then the
  * batch's own gram digests are appended as provenance rows. Span
  * verdicts must be IDENTICAL to replaying the same batches through the
  * batch operator sequentially — streaming is a deployment shape, not a
  * semantics change. */
class StreamingXsubSpec extends SparkSpec {
  import sqlImplicits._

  private val L = 16
  private def gramsOf(df: DataFrame) =
    NearDup.repeatedSpanGrams(df, "doc_id", "text", L)

  // shared 24-char block ⇒ spans; the unique token is interleaved every
  // few characters of the padding so no ACCIDENTAL cross-doc substring
  // reaches the L=16 gram width outside the planted block
  private val block = "SHARED-BLOCK-0123456789A"
  private def doc(uniq: String, withBlock: Boolean) = {
    val mid = if (withBlock) block else s"m-$uniq-m-$uniq-m-$uniq-mm"
    s"h-$uniq-h-$uniq-hh $mid t-$uniq-t-$uniq-tt"
  }

  private val batches: Seq[Seq[(Long, String)]] = Seq(
    // batch 0: docs 1 and 2 share the block — 2 gets a within-batch span
    Seq((1L, doc("aaaa", withBlock = true)),
        (2L, doc("bbbb", withBlock = true))),
    // batch 1: doc 3 carries the registered block (covered VIA REGISTRY,
    // no in-batch twin); doc 4 is fresh
    Seq((3L, doc("cccc", withBlock = true)),
        (4L, doc("dddd", withBlock = false))),
    // batch 2: doc 5 re-feeds doc 4's fresh content (registry hit),
    // doc 6 is genuinely new
    Seq((5L, doc("dddd", withBlock = false)),
        (6L, doc("eeee", withBlock = false))))

  private def spanSet(df: DataFrame): Set[(Long, Long, Long)] =
    df.select(col("id"), col("span_start"), col("span_len"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  /** The batch-mode oracle: the same batches decided sequentially against
    * an accumulating gram registry, compacting between nights. */
  private def batchReplay(): Set[(Long, Long, Long)] = {
    var log = Seq.empty[(String, String, Long)]
      .toDF("gm", "source", "batch_id")
    val noTomb = Seq.empty[String].toDF("source")
    val out = scala.collection.mutable.Set.empty[(Long, Long, Long)]
    batches.zipWithIndex.foreach { case (docs, bid) =>
      val grams = gramsOf(docs.toDF("doc_id", "text")).persist()
      val compacted = Dedup.compactRegistry(log, "gm", "source",
        "batch_id", noTomb)
      out ++= spanSet(NearDup.repeatedSpansVsRegistry(grams, compacted, L))
      log = compacted.select(col("gm"), col("first_source").as("source"),
          col("first_batch").as("batch_id"))
        .unionByName(NearDup.gramRegistry(grams)
          .select(col("gm"),
            concat(lit("doc_"), col("first_holder")).as("source"),
            lit(bid.toLong).as("batch_id")))
        .localCheckpoint(true)
      grams.unpersist()
    }
    out.toSet
  }

  test("foreachBatch gram-registry night (compact between batches): span " +
      "verdicts identical to the sequential batch replay, and history " +
      "coverage needs no in-batch twin") {
    implicit val ctx = spark.sqlContext
    var log = Seq.empty[(String, String, Long)]
      .toDF("gm", "source", "batch_id")
    val noTomb = Seq.empty[String].toDF("source")
    val seen = scala.collection.mutable.Set.empty[(Long, Long, Long)]
    val in = MemoryStream[(Long, String)]
    val q = in.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        val grams = gramsOf(batch).localCheckpoint(true)
        // the nightly shape: compact FIRST, decide, then append
        val compacted = Dedup.compactRegistry(log, "gm", "source",
          "batch_id", noTomb).localCheckpoint(true)
        seen ++= spanSet(
          NearDup.repeatedSpansVsRegistry(grams, compacted, L))
        log = compacted.select(col("gm"),
            col("first_source").as("source"),
            col("first_batch").as("batch_id"))
          .unionByName(NearDup.gramRegistry(grams)
            .select(col("gm"),
              concat(lit("doc_"), col("first_holder")).as("source"),
              lit(bid).as("batch_id")))
          .localCheckpoint(true)
        ()
      }
      .start()
    try {
      batches.foreach { docs =>
        in.addData(docs: _*)
        q.processAllAvailable()
      }
      val expected = batchReplay()
      assert(seen.toSet === expected,
        s"streaming spans ${seen.toSet} != batch replay $expected")
      // the planted structure actually exercised the registry: doc 2
      // covered within batch 0; doc 3 covered ONLY via the registry;
      // doc 5 covered via doc 4's registered fresh content; docs 1/4/6
      // (first holders of their content) have no spans
      val docsWithSpans = seen.map(_._1)
      assert(docsWithSpans === Set(2L, 3L, 5L), s"got $docsWithSpans")
      // convergence: re-feeding only registered content adds exactly the
      // full-cover spans of the re-fed docs, nothing for fresh history
      val before = seen.size
      in.addData((7L, doc("aaaa", withBlock = true)))
      q.processAllAvailable()
      val added = seen.toSet.filter(_._1 == 7L)
      assert(added.nonEmpty, "re-fed doc was not covered by the registry")
      assert(seen.size === before + added.size,
        "re-feeding registered content changed other verdicts")
    } finally q.stop()
  }
}
