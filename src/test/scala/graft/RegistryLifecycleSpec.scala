package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, NearDup}

/** Compaction/retention for the two append-only dedup registries
  * (Dedup.compactRegistry, NearDup.compactFingerprints): a compaction
  * with nothing to retire must preserve every dedup verdict on a
  * replayed batch; a tombstoned/aged source's content must become
  * admissible again; content with any surviving holder stays blocked. */
class RegistryLifecycleSpec extends SparkSpec {
  import sqlImplicits._

  private val dg = md5(col("text").cast("binary"))
  private val noTomb = Seq.empty[String].toDF("source")

  /** Provenance-carrying digest registry log: one row per historical
    * kept doc. Digest "shared" has two holders (srcA batch 1, srcB
    * batch 3); "solo-a" only srcA batch 1; "old" only srcC batch 0;
    * "fresh" only srcB batch 4. */
  private def registryLog: DataFrame = Seq(
    ("shared", "srcA", 1L), ("shared", "srcB", 3L),
    ("solo-a", "srcA", 1L),
    ("old", "srcC", 0L),
    ("fresh", "srcB", 4L)
  ).map { case (t, s, b) => (mdHex(t), s, b) }
    .toDF("digest", "source", "batch")

  private def mdHex(s: String): String = {
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  private def batchOf(texts: (Long, String)*): DataFrame =
    texts.toDF("doc_id", "text")

  private def survivors(batch: DataFrame, reg: DataFrame): Set[Long] =
    Dedup.incrementalNew(batch, dg, "doc_id", reg.select("digest"))
      .select("doc_id").collect().map(_.getLong(0)).toSet

  test("no-op compaction preserves every incrementalNew verdict on a " +
    "replayed batch") {
    val batch = batchOf(10L -> "shared", 11L -> "solo-a", 12L -> "old",
      13L -> "fresh", 14L -> "brand-new", 15L -> "brand-new")
    val compacted = Dedup.compactRegistry(registryLog, "digest", "source",
      "batch", noTomb)
    assert(survivors(batch, registryLog) === survivors(batch, compacted))
    assert(survivors(batch, compacted) === Set(14L))
  }

  test("tombstoning a source re-admits ONLY content it held alone") {
    val compacted = Dedup.compactRegistry(registryLog, "digest", "source",
      "batch", Seq("srcA").toDF("source"))
    val batch = batchOf(10L -> "shared", 11L -> "solo-a", 13L -> "fresh")
    // solo-a re-admits (srcA was its only holder); shared stays blocked
    // (srcB still holds it); fresh untouched
    assert(survivors(batch, compacted) === Set(11L))
  }

  test("TTL retirement: digests whose every holder aged out re-admit; a " +
    "newer holder keeps the digest blocked") {
    val compacted = Dedup.compactRegistry(registryLog, "digest", "source",
      "batch", noTomb, minBatch = 1L)
    val batch = batchOf(12L -> "old", 10L -> "shared", 13L -> "fresh")
    assert(survivors(batch, compacted) === Set(12L))
  }

  test("compaction keeps the earliest surviving holder and composes with " +
    "itself") {
    val c1 = Dedup.compactRegistry(registryLog, "digest", "source", "batch",
      Seq("srcA").toDF("source"))
    val got = c1.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .toSet
    assert(got === Set(
      (mdHex("shared"), 3L, "srcB", 1L),
      (mdHex("old"), 0L, "srcC", 1L),
      (mdHex("fresh"), 4L, "srcB", 1L)))
    // recompaction over the compacted log (columns renamed to the
    // provenance names it emits) preserves the digest set and provenance
    val c2 = Dedup.compactRegistry(c1, "digest", "first_source",
      "first_batch", noTomb)
    assert(c2.select("digest", "first_batch", "first_source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet ===
      got.map(x => (x._1, x._2, x._3)))
  }

  // --- fingerprint registry ------------------------------------------------

  private def lshOf(df: DataFrame) =
    NearDup.minHashLsh(df, "doc_id", "text", k = 3, bands = 16,
      rowsPerBand = 4, seed = 42L)

  private def longText(stem: String): String =
    (0 until 40).map(i => s"$stem$i").mkString(" ")

  test("registryOpsCard: the card's accounting reconciles exactly with " +
      "the compaction it predicts — n_keys_live == compactRegistry's " +
      "output size, and the counts conserve") {
    val tomb = Seq("srcA").toDF("source")
    val card = Dedup.registryOpsCard(registryLog, "digest", "source",
      "batch", tomb, minBatch = 1L, family = "digest").collect()(0)
    assert(card.getString(0) === "digest")
    assert(card.getLong(1) === registryLog.count())       // n_rows
    assert(card.getLong(2) === 3L)                        // srcA/B/C
    assert(card.getLong(3) === 2L)                        // srcA rows
    assert(card.getLong(4) === 1L)                        // batch 0
    assert(card.getLong(5) === 2L)                        // shared@B, fresh@B
    assert(card.getLong(7) === 4L)                        // newest batch
    val compacted = Dedup.compactRegistry(registryLog, "digest", "source",
      "batch", tomb, minBatch = 1L)
    assert(card.getLong(6) === compacted.count(),
      "n_keys_live must equal the post-compaction registry size")
    // and on the graded q197 surface: every family's live keys bound
    // its live rows, tombstoned+expired never exceed the total
    val rows = SparkEntry.queries("q197_registry_ops")(spark,
      "/root/testdata/sf0.001").collect()
    assert(rows.length === 4)
    rows.foreach { r =>
      assert(r.getLong(6) <= r.getLong(5), r.toString)    // keys <= rows
      assert(r.getLong(5) <= r.getLong(1), r.toString)
      assert(r.getLong(3) <= r.getLong(1) && r.getLong(4) <= r.getLong(1))
    }
  }

  test("compactFingerprints: no-op compaction preserves incrementalNearDups " +
    "verdicts; tombstoning a source re-admits its near-dups") {
    val textA = longText("alpha")
    val textB = longText("beta")
    // registry built from two historical batches with provenance
    val histA = lshOf(batchOf(1L -> textA))
      .withColumn("source", lit("srcA")).withColumn("batch", lit(1L))
    val histB = lshOf(batchOf(2L -> textB))
      .withColumn("source", lit("srcB")).withColumn("batch", lit(2L))
    val log = histA.unionByName(histB)
      .select("band", "bucket", "source", "batch")
    val batch = batchOf(10L -> textA, 11L -> textB, 12L -> longText("gamma"))

    def ids(reg: DataFrame): Set[Long] =
      NearDup.incrementalNearDups(lshOf(batch), reg)
        .select("id").distinct().collect().map(_.getLong(0)).toSet

    val compacted = NearDup.compactFingerprints(log, "source", "batch",
      noTomb)
    assert(ids(log) === ids(compacted))
    assert(ids(compacted) === Set(12L))

    // retiring srcA re-admits textA near-dups, keeps textB blocked
    val afterTakedown = NearDup.compactFingerprints(log, "source", "batch",
      Seq("srcA").toDF("source"))
    assert(ids(afterTakedown) === Set(10L, 12L))
  }

  test("streaming near-dup registry stays convergent across a mid-stream " +
    "compaction") {
    implicit val ctx = spark.sqlContext
    val textA = longText("alpha")
    val textB = longText("beta")
    val textC = longText("gamma")
    var registry = Seq.empty[(Int, String, String, Long)]
      .toDF("band", "bucket", "source", "batch")
    var batchNo = 0L
    val survivors = scala.collection.mutable.ArrayBuffer.empty[Long]
    val in = MemoryStream[(Long, String)]
    val q = in.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val out = NearDup.incrementalNearDups(lshOf(batch), registry)
          .localCheckpoint(true)
        survivors ++= out.select("id").distinct()
          .collect().map(_.getLong(0))
        registry = registry.unionByName(
            out.select(col("band"), col("bucket"),
              lit("stream").as("source"), lit(batchNo).as("batch")))
          .localCheckpoint(true)
        batchNo += 1
        ()
      }
      .start()
    try {
      in.addData((1L, textA), (2L, textB))
      q.processAllAvailable()
      // nightly compaction: nothing retires — verdicts must not change
      registry = NearDup.compactFingerprints(registry, "source", "batch",
          noTomb)
        .select(col("band"), col("bucket"),
          col("first_source").as("source"), col("first_batch").as("batch"))
        .localCheckpoint(true)
      in.addData((3L, textA), (4L, textC))
      q.processAllAvailable()
      assert(survivors.toSet === Set(1L, 2L, 4L), s"got $survivors")
      // convergence after compaction: replaying registered content is a
      // no-op
      in.addData((5L, textA), (6L, textB), (7L, textC))
      q.processAllAvailable()
      assert(survivors.toSet === Set(1L, 2L, 4L),
        s"compaction broke convergence: $survivors")
    } finally q.stop()
  }

  test("q242 postings ops card reconciles with the q237 compaction it " +
      "forecasts: n_keys_live == the distinct terms of the compacted " +
      "postings, n_live == its row count") {
    val dir = "/root/testdata/sf0.01"
    val card = SparkEntry.queries("q242_postings_ops")(spark, dir)
      .collect().head
    val docs = Tables.load(spark, dir, "documents")
    val surv = docs.filter(col("doc_id") % 10 >= 2 &&
      col("source") =!= "src18")
    val compacted = graft.functions.TextAnalysis.termFrequencies(surv,
      "doc_id", "text").localCheckpoint(true)
    assert(card.getAs[Long]("n_live") === compacted.count())
    assert(card.getAs[Long]("n_keys_live") ===
      compacted.select(col("term")).distinct().count())
    assert(card.getAs[String]("family") === "postings")
  }

  test("q237 postings lifecycle: BM25 served from the COMPACTED postings " +
      "registry is row-identical to a from-scratch index rebuild over " +
      "the survivor corpus (delete == rebuild at postings granularity)") {
    val dir = "/root/testdata/sf0.01"
    val served = SparkEntry.queries("q237_postings_lifecycle")(spark, dir)
      .collect().map(_.toSeq).toSet
    val survivors = Tables.load(spark, dir, "documents")
      .filter(col("doc_id") % 10 >= 2 && col("source") =!= "src18")
    val rebuilt = graft.functions.TextAnalysis.bm25TopK(survivors,
        "doc_id", "text",
        queries = Seq(1L -> "hash join", 2L -> "stream batch window",
          3L -> "slow scan filter", 4L -> "spark merge vector"), k = 10)
      .select(col("qid"), col("rnk"), col("id").as("doc_id"), col("score"))
      .collect().map(_.toSeq).toSet
    assert(served === rebuilt)
    assert(served.nonEmpty)
  }

  // ---- licensing-aware survivor rules (q274 family) ----

  test("compactRegistryPrioritized: an EMPTY priority table (and a " +
      "uniform one) reproduces compactRegistry bit-identically; a " +
      "priority flips the shared digest's survivor to the permissive " +
      "holder even though the restricted one came first") {
    val base = Dedup.compactRegistry(registryLog, "digest", "source",
      "batch", noTomb).collect().map(_.toSeq).toSet
    val noPrio = Seq.empty[(String, Long)].toDF("source", "prio")
    assert(Dedup.compactRegistryPrioritized(registryLog, "digest",
      "source", "batch", noTomb, noPrio).collect().map(_.toSeq).toSet
      === base)
    val uniform = Seq(("srcA", 5L), ("srcB", 5L), ("srcC", 5L))
      .toDF("source", "prio")
    assert(Dedup.compactRegistryPrioritized(registryLog, "digest",
      "source", "batch", noTomb, uniform).collect().map(_.toSeq).toSet
      === base)
    // srcB is the permissive source: "shared" flips to (batch 3, srcB)
    // although srcA held it first at batch 1
    val prio = Seq(("srcA", 2L), ("srcB", 0L), ("srcC", 1L))
      .toDF("source", "prio")
    val got = Dedup.compactRegistryPrioritized(registryLog, "digest",
        "source", "batch", noTomb, prio).collect()
      .map(r => r.getAs[String]("digest") ->
        ((r.getAs[Long]("first_batch"), r.getAs[String]("first_source"),
          r.getAs[Long]("n_holders")))).toMap
    assert(got(mdHex("shared")) === ((3L, "srcB", 2L)))
    assert(got(mdHex("solo-a")) === ((1L, "srcA", 1L)))
    // the output contract composes: same columns, one row per digest
    assert(got.size === 4)
  }

  test("priorityRepresentatives: empty priority = the min-id " +
      "first-holder rule exactly; a priority flips the survivor; " +
      "missing sources rank last") {
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L), (7L, 7L), (9L, 7L))
      .toDF("doc_id", "canonical")
    val docSrc = Seq((1L, "srcR"), (2L, "srcP"), (3L, "srcR"),
      (7L, "srcR"), (9L, "srcX")).toDF("doc_id", "source")
    val noPrio = Seq.empty[(String, Long)].toDF("source", "prio")
    val first = NearDup.priorityRepresentatives(labels, docSrc, noPrio)
      .collect()
    assert(first.forall(r =>
      r.getAs[Long]("rep_id") === r.getAs[Long]("canonical")))
    // srcP (permissive, prio 0) beats srcR (prio 2): group 1's
    // survivor flips to doc 2; srcX is MISSING from the table so it
    // ranks last and group 7 keeps srcR's doc 7
    val prio = Seq(("srcR", 2L), ("srcP", 0L)).toDF("source", "prio")
    val got = NearDup.priorityRepresentatives(labels, docSrc, prio)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("rep_id"), r.getAs[String]("rep_source"))))
      .toMap
    assert(got(1L) === ((2L, "srcP")) && got(3L) === ((2L, "srcP")))
    assert(got(7L) === ((7L, "srcR")) && got(9L) === ((7L, "srcR")))
  }
}
