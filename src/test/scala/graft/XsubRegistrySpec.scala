package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, NearDup}

/** Cross-batch exact-substring registry (`repeatedSpansVsRegistry` /
  * `gramRegistry`) — the empty-registry degradation to the within-batch
  * operator, the no-rescan historical-coverage contract, and the
  * compaction-replay composition with `Dedup.compactRegistry` (the q167
  * lifecycle at gram granularity).
  */
class XsubRegistrySpec extends SparkSpec {
  import sqlImplicits._

  private val L = 32

  private val para =
    "The quick brown fox jumps over the lazy dog near the quiet riverbank."
  private def pad(seed: Char) = {
    // seeded-random filler: distinct seeds share no 32-gram (a periodic
    // formula here would make every pad a rotation of one cycle and
    // cross-cover everything)
    val rnd = new scala.util.Random(seed.toLong)
    (0 until 80).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
  }

  test("empty registry degrades EXACTLY to the within-batch operator on " +
    "real corpus data") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val grams = NearDup.repeatedSpanGrams(docs, "doc_id", "text", L).persist()
    try {
      val plain = NearDup.repeatedSpansFromGrams(grams, L)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet
      val emptyReg = Seq.empty[String].toDF("gm")
      val vsEmpty = NearDup.repeatedSpansVsRegistry(grams, emptyReg, L)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet
      assert(plain.nonEmpty)
      assert(vsEmpty === plain)
    } finally { grams.unpersist(); () }
  }

  test("historical content is covered WITHOUT a within-batch duplicate, " +
    "every batch occurrence covered (no first-holder exemption); " +
    "batch-only duplicates keep the min-id exemption") {
    // history doc 1 holds the paragraph; batch docs 10 and 11 both copy
    // it (NO within-batch pair shares it with exemption semantics:
    // history rule covers BOTH), and docs 12/13 share a second phrase
    // absent from history (batch rule: 12 is first holder, exempt).
    val phrase = "Colorless green ideas sleep furiously in the warm attic."
    val history = Seq((1L, pad('h') + para + pad('i'))).toDF("doc_id", "text")
    val batch = Seq(
      (10L, pad('a') + para + pad('b')),
      (11L, pad('c') + para + pad('d')),
      (12L, pad('e') + phrase + pad('f')),
      (13L, pad('g') + phrase + pad('j'))
    ).toDF("doc_id", "text")
    val registry = NearDup.gramRegistry(
      NearDup.repeatedSpanGrams(history, "doc_id", "text", L))
    val spans = NearDup.repeatedSpansVsRegistry(
      NearDup.repeatedSpanGrams(batch, "doc_id", "text", L), registry, L)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(spans.contains(10L) && spans.contains(11L),
      "both batch copies of historical content must be covered")
    assert(spans(10L) >= para.length && spans(11L) >= para.length)
    assert(spans.contains(13L), "batch-duplicated phrase covers the later doc")
    assert(!spans.contains(12L), "min-id batch holder stays exempt")
  }

  test("the q149 Bloom prune composes in FRONT of the registry semi join " +
    "with identical spans — the 100 TB shape when the registry outgrows " +
    "broadcast") {
    import graft.operators.Sketches
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val grams = NearDup.repeatedSpanGrams(docs, "doc_id", "text", L).persist()
    try {
      val batch = grams.filter(col("id") >= 250)
      val reg = grams.filter(col("id") < 250).select(col("gm")).distinct()
      val raw = NearDup.repeatedSpansVsRegistry(batch, reg, L)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet
      assert(raw.nonEmpty)
      // the realistic direction when history dwarfs the batch: a bloom of
      // the BATCH's digests prunes registry rows row-locally before the
      // semi join. No false negatives → every digest the batch actually
      // contains survives; a false positive adds a registry digest the
      // batch never probes — coverage only depends on reg ∩ batch
      // digests, so spans are identical.
      val bits = Sketches.bloomBitsArray(batch.select(col("gm")), col("gm"),
        1L << 20, 3, Sketches.xxBucket)
      val prunedReg = Sketches.bloomPrune(reg, col("gm"), bits, 1L << 20, 3,
        Sketches.xxBucket)
      val viaPrune = NearDup.repeatedSpansVsRegistry(batch, prunedReg, L)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet
      assert(viaPrune === raw)
    } finally { grams.unpersist(); () }
  }

  test("foreachBatch gram registry accumulates across micro-batches: a " +
    "paragraph kept in ANY earlier micro-batch covers later copies, and " +
    "re-fed content converges to zero new spans") {
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx = spark.sqlContext
    val phrase =
      "Colorless green ideas sleep furiously in the warm attic tonight."
    var registry = Seq.empty[(String, Long)].toDF("gm", "first_holder")
    val spanned = scala.collection.mutable.ArrayBuffer.empty[Long]
    val in = MemoryStream[(Long, String)]
    val q = in.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val grams = NearDup.repeatedSpanGrams(batch, "doc_id", "text", L)
          .localCheckpoint(true)
        spanned ++= NearDup.repeatedSpansVsRegistry(grams, registry, L)
          .select("id").distinct().collect().map(_.getLong(0))
        registry = registry
          .unionByName(NearDup.gramRegistry(grams))
          .groupBy(col("gm")).agg(min(col("first_holder")).as("first_holder"))
          .localCheckpoint(true)
        ()
      }
      .start()
    try {
      // batch 1: doc 1 introduces the paragraph (no span), doc 2 copies
      // it within-batch (span, min-id exemption)
      in.addData((1L, pad('a') + phrase + pad('b')),
        (2L, pad('c') + phrase + pad('d')))
      q.processAllAvailable()
      assert(spanned.toSet === Set(2L), s"got $spanned")
      // batch 2: a copy arrives ALONE — covered purely by the registry,
      // no within-batch duplicate and no rescan of batch 1
      in.addData((3L, pad('e') + phrase + pad('f')))
      q.processAllAvailable()
      assert(spanned.toSet === Set(2L, 3L), s"got $spanned")
      // batch 3: fresh content passes untouched
      in.addData((4L, pad('g') + pad('j') + pad('k')))
      q.processAllAvailable()
      assert(spanned.toSet === Set(2L, 3L), s"got $spanned")
    } finally q.stop()
  }

  test("compaction replay: spans vs the compacted provenance log equal " +
    "spans vs the raw registry; tombstoning the only holder readmits " +
    "its content") {
    val history = Seq(
      (1L, pad('h') + para + pad('i'))).toDF("doc_id", "text")
    val batch = Seq((10L, pad('a') + para + pad('b'))).toDF("doc_id", "text")
    val bGrams = NearDup.repeatedSpanGrams(batch, "doc_id", "text", L)
    // provenance log: (gm, source, batch) — the holder doc is the source
    val log = NearDup.gramRegistry(
        NearDup.repeatedSpanGrams(history, "doc_id", "text", L))
      .select(col("gm"), concat(lit("src_"), col("first_holder")).as("source"),
        lit(3L).as("batch_id"))
    val raw = NearDup.repeatedSpansVsRegistry(bGrams, log, L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(raw.nonEmpty, "historical paragraph must cover the batch copy")
    // no-retirement compaction is verdict-preserving
    val compacted = Dedup.compactRegistry(log, "gm", "source", "batch_id",
      Seq.empty[String].toDF("source"))
    val replay = NearDup.repeatedSpansVsRegistry(bGrams, compacted, L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(replay === raw)
    // compaction composes with itself (the q167 contract at gram grain)
    val twice = Dedup.compactRegistry(
      compacted.select(col("gm"), col("first_source").as("source"),
        col("first_batch").as("batch_id")),
      "gm", "source", "batch_id", Seq.empty[String].toDF("source"))
    val replay2 = NearDup.repeatedSpansVsRegistry(bGrams, twice, L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(replay2 === raw)
    // retiring the ONLY holder readmits the content: no spans remain
    val tombstoned = Dedup.compactRegistry(log, "gm", "source", "batch_id",
      Seq("src_1").toDF("source"))
    assert(NearDup.repeatedSpansVsRegistry(bGrams, tombstoned, L)
      .count() === 0L)
  }
}
