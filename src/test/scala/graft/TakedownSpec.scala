package graft

import org.apache.spark.sql.functions._

import graft.operators.{Similarity, Takedown}

/** Takedown (tombstone-driven deletion) contracts — q194/q195's spec
  * backing. The load-bearing claim is DELETE == REBUILD: because every
  * stored encoding is row-local against frozen artifacts, anti-joining a
  * tombstone set out of a stored table is row-identical to re-deriving
  * the table from the survivor corpus with the same frozen bits — which
  * is exactly why the O(|store|) anti-join (never a corpus rescan) is a
  * CORRECT takedown, not an approximation of one. */
class TakedownSpec extends SparkSpec {
  import sqlImplicits._

  private val dir = "/root/testdata/sf0.001"
  private def emb = Tables.load(spark, dir, "embeddings")
  private val tombPred = col("vec_id") % 23 === 9
  private def tombs = emb.filter(tombPred).select(col("vec_id"))
  private def survivors = emb.filter(!tombPred)

  test("delete == rebuild for the frozen PQ code store: purging the " +
      "tombstones from the full encode is row-identical to encoding " +
      "the survivor corpus against the same frozen codebook") {
    val hist = emb.filter(col("vec_id") % 4 =!= 3)
    val cb = Similarity.pqCodebook(
      Similarity.pqAssigned(hist, m = 8, sub = 8, iters = 2, k = 32))
      .persist()
    try {
      val full = Similarity.pqEncodeFrozen(emb, cb)
      val purged = Takedown.purge(full, tombs, "vec_id")
      val rebuilt = Similarity.pqEncodeFrozen(survivors, cb)
      assert(purged.except(rebuilt).count() === 0L)
      assert(rebuilt.except(purged).count() === 0L)
      // and the takedown really removed something
      assert(purged.count() < full.count())
    } finally { cb.unpersist(); () }
  }

  test("delete == rebuild for the SQ8 store and the IVF-ADC index " +
      "(per-row scaling and the code⋈coarse join are both row-local)") {
    val fullQ = Similarity.sq8Quantize(emb)
    assert(Takedown.purge(fullQ, tombs, "vec_id")
      .except(Similarity.sq8Quantize(survivors)).count() === 0L)
    assert(Similarity.sq8Quantize(survivors)
      .except(Takedown.purge(fullQ, tombs, "vec_id")).count() === 0L)

    val cents = Similarity.labelCentroids(emb.filter(col("vec_id") % 4 =!= 3))
      .select(col("label").as("clab"), col("centroid"))
    val coarse = Similarity.assignEmbeddings(emb, cents)
      .select(col("vec_id"), col("cluster")).persist()
    try {
      val cb = Similarity.pqCodebook(Similarity.pqAssigned(
        emb.filter(col("vec_id") % 4 =!= 3), m = 8, sub = 8, iters = 2,
        k = 32))
      val codes = Similarity.pqEncodeFrozen(emb, cb).persist()
      try {
        val index = Similarity.ivfAdcIndex(coarse, codes)
        // purge the assembled index == assemble from purged inputs
        val a = Takedown.purge(index, tombs, "vec_id")
        val b = Similarity.ivfAdcIndex(
          Takedown.purge(coarse, tombs, "vec_id"),
          Takedown.purge(codes, tombs, "vec_id"))
        assert(a.except(b).count() === 0L)
        assert(b.except(a).count() === 0L)
      } finally { codes.unpersist(); () }
    } finally { coarse.unpersist(); () }
  }

  test("post-takedown search never returns a tombstoned id, and the " +
      "graded q194 recall rides the survivor ground truth") {
    val sfDir = dir
    val res = SparkEntry.queries("q194_index_takedown")(spark, sfDir)
    assert(res.count() === 8L)
    assert(res.filter(col("recall") < 0 || col("recall") > 1).count() === 0L)
    // drive the shrunk-index search directly and check the result set
    val hist = emb.filter(col("vec_id") % 4 =!= 3)
    val assigned = Similarity.pqAssigned(hist, m = 8, sub = 8, iters = 2,
      k = 32).persist()
    try {
      val cb = Similarity.pqCodebook(assigned)
      val cents = Similarity.labelCentroids(hist)
        .select(col("label").as("clab"), col("centroid"))
      val coarse = Similarity.assignEmbeddings(emb, cents)
        .select(col("vec_id"), col("cluster"))
      val index = Similarity.ivfAdcIndex(coarse,
        Similarity.pqEncodeFrozen(emb, cb))
      val shrunk = Takedown.purge(index, tombs, "vec_id")
      val hits = Similarity.ivfAdcTopK(emb.filter(col("vec_id") < 8),
        hist, shrunk, assigned, nprobe = 2, k = 10)
      assert(hits.join(tombs, Seq("vec_id"), "left_semi").count() === 0L,
        "a tombstoned vector surfaced in post-takedown search results")
    } finally { assigned.unpersist(); () }
  }

  test("registry takedown only UN-covers: q195 vs_history is a subset " +
      "of q178's, is_dup never flips false→true, and the within-batch " +
      "rule is untouched") {
    val sfDir = dir
    val before = SparkEntry.queries("q178_semdedup_registry")(spark, sfDir)
      .select(col("vec_id"), col("is_dup"), col("vs_history")).persist()
    val after = SparkEntry.queries("q195_registry_takedown")(spark, sfDir)
      .select(col("vec_id"), col("is_dup").as("is_dup2"),
        col("vs_history").as("vs_history2"))
    try {
      val j = before.join(after, Seq("vec_id")).persist()
      try {
        assert(j.count() === before.count(), "row sets must match")
        assert(j.filter(col("vs_history2") && !col("vs_history"))
          .count() === 0L, "deletion must never ADD history coverage")
        assert(j.filter(col("is_dup2") && !col("is_dup")).count() === 0L,
          "deletion must never create a duplicate verdict")
        // batch-side coverage is takedown-invariant: any row dup in
        // q178 but NOT via history stays dup (the within-batch rule
        // doesn't read the registry)
        assert(j.filter(col("is_dup") && !col("vs_history") &&
          !col("is_dup2")).count() === 0L)
      } finally { j.unpersist(); () }
    } finally { before.unpersist(); () }
  }

  test("planted flip: a batch row whose ONLY history match is tombstoned " +
      "flips vs_history false; a row covered by a surviving exemplar " +
      "keeps it") {
    // 2-d synthetic geometry: cluster 0 around (1, 0), cluster 1 around
    // (0, 1). Exemplars 10 (cluster 0) and 20 (cluster 1); batch 100
    // matches only exemplar 10, batch 200 only exemplar 20.
    val cents = Seq((0L, Seq(1.0, 0.0)), (1L, Seq(0.0, 1.0)))
      .toDF("clab", "centroid")
    val exemplars = Seq(
      (0L, 10L, Seq(1.0, 0.01)), (1L, 20L, Seq(0.01, 1.0)))
      .toDF("cluster", "vec_id", "e")
    val batch = Seq((100L, Seq(0.99, 0.0)), (200L, Seq(0.0, 0.99)))
      .toDF("vec_id", "embedding")
    val batchA = Similarity.assignEmbeddings(batch, cents)
    def verdicts(ex: org.apache.spark.sql.DataFrame) =
      Similarity.semDedupVsRegistry(batchA, ex, tau = 0.9)
        .select(col("vec_id"), col("vs_history"))
        .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val before = verdicts(exemplars)
    assert(before(100L) && before(200L))
    val purged = Takedown.purge(exemplars,
      Seq(Tuple1(10L)).toDF("vec_id"), "vec_id")
    val after = verdicts(purged)
    assert(!after(100L), "tombstoned exemplar 10 must stop covering 100")
    assert(after(200L), "surviving exemplar 20 must keep covering 200")
  }

  test("takedownBlastRadius conserves: dropped + repack == docs in " +
      "dirty bins, clean bins contribute nothing, empty tombstones " +
      "dirty nothing") {
    import sqlImplicits._
    val docs = Tables.load(spark, dir, "documents")
    val packed = graft.operators.Packing.packGreedy(
      docs.select(col("doc_id"),
        graft.functions.TextAnalysis.tokenCount(col("text")).as("n_tok")),
      "doc_id", "n_tok", budget = 512L, shards = 8).persist()
    try {
      val tombs = packed.filter(col("id") % 23 === 9).select(col("id"))
      val r = graft.operators.Packing
        .takedownBlastRadius(packed, tombs, "id").collect()(0)
      val nBins = packed.select(col("shard"), col("bin")).distinct().count()
      assert(r.getLong(0) === nBins)
      assert(r.getLong(2) === tombs.count(), "dropped == tombstoned docs")
      // docs in dirty bins == dropped + repack
      val dirtyBins = packed.join(tombs, Seq("id"), "left_semi")
        .select(col("shard"), col("bin")).distinct()
      val docsInDirty = packed.join(dirtyBins, Seq("shard", "bin"),
        "left_semi").count()
      assert(r.getLong(2) + r.getLong(4) === docsInDirty)
      assert(r.getLong(1) === dirtyBins.count())
      // empty tombstone set: zero radius
      val none = graft.operators.Packing.takedownBlastRadius(packed,
        Seq.empty[Long].toDF("id"), "id").collect()(0)
      assert(none.getLong(1) === 0L && none.getLong(2) === 0L &&
        none.getDouble(6) === 0.0)
    } finally { packed.unpersist(); () }
  }

  test("purgeReceipt accounts exactly and purge is idempotent") {
    val store = Similarity.sq8Quantize(emb).persist()
    try {
      val r = Takedown.purgeReceipt(store, tombs, "vec_id", "sq8_index")
        .collect()(0)
      assert(r.getString(0) === "sq8_index")
      assert(r.getLong(1) === store.count())
      assert(r.getLong(1) === r.getLong(2) + r.getLong(3))
      assert(r.getLong(2) === store.join(tombs, Seq("vec_id"), "left_semi")
        .count())
      // re-filing the same takedown drops nothing further
      val again = Takedown.purge(Takedown.purge(store, tombs, "vec_id"),
        tombs, "vec_id")
      assert(again.count() === r.getLong(3))
    } finally { store.unpersist(); () }
  }

  test("delete == re-score under the FROZEN model for the LM score " +
      "stores: purging uni/kn score rows is row-identical to scoring " +
      "only the survivor batch against the unchanged history model") {
    import graft.functions.TextAnalysis
    val docs = Tables.load(spark, dir, "documents")
    val hist = docs.filter(col("doc_id") < 250)
    val batch = docs.filter(col("doc_id") >= 250)
    val tombs = docs.filter(col("doc_id") % 23 === 9).select(col("doc_id"))
    val tombSet = tombs.collect().map(_.getLong(0)).toSet
    val survBatch = batch.filter(!col("doc_id").isin(tombSet.toSeq: _*))
    // uni: frozen hist unigram counts
    val histCounts = TextAnalysis.unigramCounts(hist, "doc_id", "text")
      .localCheckpoint(true)
    val uniStore = TextAnalysis.unigramXentFrozen(histCounts, batch,
      "doc_id", "text").withColumnRenamed("id", "doc_id")
    val uniPurged = Takedown.purge(uniStore, tombs, "doc_id")
      .collect().map(_.toSeq).toSet
    val uniRescored = TextAnalysis.unigramXentFrozen(histCounts, survBatch,
        "doc_id", "text").withColumnRenamed("id", "doc_id")
      .collect().map(_.toSeq).toSet
    assert(uniPurged === uniRescored && uniPurged.nonEmpty)
    // kn: frozen history-era KN tables (train side untouched by the
    // takedown — rebuilding THEM would retrain, the model-layer caveat)
    val knStore = TextAnalysis.knBigramXent(hist, batch, "doc_id", "text")
      .withColumnRenamed("id", "doc_id")
    val knPurged = Takedown.purge(knStore, tombs, "doc_id")
      .collect().map(_.toSeq).toSet
    val knRescored = TextAnalysis.knBigramXent(hist, survBatch,
        "doc_id", "text").withColumnRenamed("id", "doc_id")
      .collect().map(_.toSeq).toSet
    assert(knPurged === knRescored && knPurged.nonEmpty)
  }

  test("delete == re-score for the classifier score stores when the " +
      "tombstones avoid the training slice (the model is then untouched " +
      "by construction); the q240 receipt arithmetic holds per store") {
    import graft.functions.TextAnalysis
    val docs = Tables.load(spark, dir, "documents")
    // held-out-only tombstones: the NB train slice (doc_id < 250) and
    // the DSIR target/raw models see the identical corpus after the
    // survivor re-run ONLY if no train row dies — restrict to >= 250
    val tombs = docs.filter(col("doc_id") % 23 === 9 &&
      col("doc_id") >= 250).select(col("doc_id"))
    val tombSet = tombs.collect().map(_.getLong(0)).toSet
    assert(tombSet.nonEmpty)
    val nbStore = TextAnalysis.nbQualityScore(docs, "doc_id", "text",
        isTrain = col("doc_id") < 250, isTarget = col("lang") === "en",
        buckets = 4096)
      .withColumnRenamed("id", "doc_id")
    val nbPurged = Takedown.purge(nbStore, tombs, "doc_id")
      .collect().map(_.toSeq).toSet
    // NB scoring is row-local given the trained table; dropping
    // held-out rows from the INPUT changes nothing about the model, so
    // the survivor re-run reproduces the purge row-identically
    val nbRescored = TextAnalysis.nbQualityScore(
        docs.filter(!col("doc_id").isin(tombSet.toSeq: _*)), "doc_id",
        "text", isTrain = col("doc_id") < 250,
        isTarget = col("lang") === "en", buckets = 4096)
      .withColumnRenamed("id", "doc_id")
      .filter(col("doc_id") >= 250)
      .collect().map(_.toSeq).toSet
    val nbPurgedHeldOut = nbPurged.filter(r =>
      r.head.asInstanceOf[Long] >= 250L)
    assert(nbPurgedHeldOut === nbRescored && nbRescored.nonEmpty)
    // receipt arithmetic on the graded q240 card — six stores: the four
    // score tables plus bpe_tokens and mix_packed
    val card = SparkEntry.queries("q240_score_takedown")(
      spark, "/root/testdata/sf0.01").collect()
    assert(card.length === 6)
    assert(card.map(_.getAs[String]("store")).sorted.toSeq === Seq(
      "bpe_tokens", "dsir_scores", "kn_scores", "mix_packed",
      "nb_scores", "uni_scores"))
    card.foreach { r =>
      assert(r.getAs[Long]("rows_before") - r.getAs[Long]("rows_dropped")
        === r.getAs[Long]("rows_after"), r.getAs[String]("store"))
      assert(r.getAs[Long]("rows_dropped") > 0L, r.getAs[String]("store"))
    }
  }

  test("delete == re-encode under the FROZEN merge table for the BPE " +
      "token store, and the mix_packed purge at the derived doc key " +
      "drops exactly the tombstoned docs' instances") {
    import graft.functions.TextAnalysis
    import graft.operators.Packing
    import sqlImplicits._
    val docs = Tables.load(spark, dir, "documents")
    val tombs = docs.filter(col("doc_id") % 23 === 9).select(col("doc_id"))
    val tombSet = tombs.collect().map(_.getLong(0)).toSet
    val merges = Seq("t" -> "h", "th" -> "e", "a" -> "n")
    // bpe: encoding is per-doc under a fixed merge table, so purging
    // the store is row-identical to re-encoding only the survivors
    val store = TextAnalysis.bpeTokenCounts(docs, "doc_id", "text", merges)
      .withColumnRenamed("id", "doc_id")
    val purged = Takedown.purge(store, tombs, "doc_id")
      .collect().map(_.toSeq).toSet
    val reEncoded = TextAnalysis.bpeTokenCounts(
        docs.filter(!col("doc_id").isin(tombSet.toSeq: _*)),
        "doc_id", "text", merges)
      .withColumnRenamed("id", "doc_id")
      .collect().map(_.toSeq).toSet
    assert(purged === reEncoded && purged.nonEmpty)
    // mix_packed: a packed instance store (id = doc_id*8 + e) purged at
    // the doc key divided back out drops exactly that doc's instances
    // and nothing else — the REBUILD deliberately differs (the
    // waterfill is global; q243's rebalance night owns it)
    val inst = Seq((10L, 0L, 100L), (10L, 1L, 100L), (11L, 0L, 60L),
        (12L, 0L, 200L), (12L, 1L, 200L), (12L, 2L, 200L))
      .map { case (d, e, w) => (d * 8 + e, w) }.toDF("id", "w")
    val packed = Packing.packGreedy(inst, "id", "w",
        budget = 512L, shards = 2)
      .withColumn("doc_id", expr("id div 8"))
    val toyTombs = Seq(12L).toDF("doc_id")
    val after = Takedown.purge(packed, toyTombs, "doc_id")
    assert(after.count() === 3L)
    assert(after.filter(expr("id div 8") === 12L).count() === 0L)
    assert(after.filter(expr("id div 8") =!= 12L).count() ===
      packed.filter(expr("id div 8") =!= 12L).count())
  }
}
