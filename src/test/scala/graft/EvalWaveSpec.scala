package graft

import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis
import graft.operators.{Sampling, Similarity, Stats}

/** Wave 12 (evaluation & release-gating): ANN recall@k bounds, embedding
  * decontamination planting, temporal-split embargo semantics, Cohen's κ
  * against hand-computed tables, sentence segmentation edges, and the
  * dup-cluster histogram's mass identity. */
class EvalWaveSpec extends SparkSpec {
  import sqlImplicits._

  // --- recallAtK ------------------------------------------------------------

  private def emb(sf: String = "sf0.001") =
    spark.read.parquet(s"/root/testdata/$sf/embeddings.parquet")

  test("recallAtK is 1.0 when every list is probed, bounded otherwise") {
    val e = emb()
    val nLists = e.select(countDistinct(col("label"))).head().getLong(0).toInt
    val qs = e.filter(col("vec_id") < 4)
    val full = Similarity.recallAtK(qs, e, nprobe = nLists, k = 5).collect()
    assert(full.nonEmpty)
    full.foreach { r =>
      assert(r.getLong(r.fieldIndex("hits")) == 5L)
      assert(r.getDouble(r.fieldIndex("recall")) == 1.0)
    }
    val partial = Similarity.recallAtK(qs, e, nprobe = 1, k = 5).collect()
    partial.foreach { r =>
      val hits = r.getLong(r.fieldIndex("hits"))
      assert(hits >= 0L && hits <= 5L)
      assert(r.getDouble(r.fieldIndex("recall")) == hits.toDouble / 5)
    }
  }

  // --- embeddingContamination -----------------------------------------------

  test("embeddingContamination flags planted copies, excludes self-pairs") {
    val corpus = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),   // exact copy of eval 100
      (2L, Array(0.0f, 1.0f, 0.0f)),   // orthogonal to eval 100
      (100L, Array(1.0f, 0.0f, 0.0f))  // the eval row itself, in-corpus
    ).toDF("vec_id", "embedding")
    val evalSet = corpus.filter(col("vec_id") === 100L)
    val got = Similarity.embeddingContamination(corpus, evalSet, tau = 0.9)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getBoolean(2)))
      .toMap
    assert(got(1L) == ((1.0, true)))     // planted copy caught
    assert(got(2L) == ((0.0, false)))    // orthogonal clean
    // the eval row never compares against itself: with a single eval
    // vector it has no comparison partner at all and drops out
    assert(!got.contains(100L))
  }

  test("contaminationTauCurve: monotone non-increasing in tau, every " +
      "point equals the fixed-tau verdict count, zero-hit taus still " +
      "emit their rows") {
    val sfDir = "/root/testdata/sf0.001"
    val emb = Tables.load(spark, sfDir, "embeddings")
    val evalSet = emb.filter(col("vec_id") % 37 === 0)
    val taus = Seq(0.3, 0.35, 0.4, 0.99)
    val curve = Similarity.contaminationTauCurve(emb, evalSet, taus)
      .collect().map(r => r.getDouble(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(curve.keySet === taus.toSet, "every tau must emit a row")
    val flagged = taus.map(curve(_)._2)
    assert(flagged === flagged.sorted.reverse,
      s"not monotone: $flagged")
    // per-point equality with the fixed-tau verdict
    taus.foreach { t =>
      val direct = Similarity.embeddingContamination(emb, evalSet, t)
        .filter(col("contaminated")).count()
      assert(curve(t)._2 === direct, s"tau=$t")
    }
    // denominators: every compared vector counted once
    val nv = Similarity.maxEvalSim(emb, evalSet).count()
    assert(curve.values.forall(_._1 == nv))
  }

  // --- temporalSplit --------------------------------------------------------

  test("temporalSplit cuts at the exact quantile with an embargo gap") {
    val df = (1L to 100L).map(i => (i, i)).toDF("id", "t")
    Seq(df, df.repartition(13)).foreach { in =>
      val got = Sampling.temporalSplit(in, col("t"), col("id"),
          trainNum = 4, trainDen = 5, embargo = 10L)
        .groupBy(col("split")).agg(count(lit(1)).as("n"),
          min(col("t")).as("lo"), max(col("t")).as("hi"))
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
          r.getLong(3)))).toMap
      assert(got("train") == ((80L, 1L, 80L)))
      assert(got("embargo") == ((10L, 81L, 90L)))
      assert(got("test") == ((10L, 91L, 100L)))
    }
  }

  test("temporalSplit puts all cutoff-time ties into train") {
    // ranks 1..8 of t=1, cutoff rank ceil(0.5*10)=5 lands on t=1 →
    // value-threshold semantics: every t=1 row is train
    val df = ((1L to 8L).map(i => (i, 1L)) ++ Seq((9L, 2L), (10L, 3L)))
      .toDF("id", "t")
    val got = Sampling.temporalSplit(df, col("t"), col("id"),
        trainNum = 1, trainDen = 2, embargo = 0L)
      .groupBy(col("split")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("train") == 8L)
    assert(got("test") == 2L)
    assert(!got.contains("embargo"))
  }

  // --- cohenKappa -----------------------------------------------------------

  private def ratings(counts: Seq[((String, String), Int)]) =
    counts.flatMap { case ((a, b), n) => Seq.fill(n)((a, b)) }
      .toDF("ra", "rb")

  test("cohenKappa matches the hand-computed 2x2 table") {
    // n_yy=20 n_yn=10 n_ny=5 n_nn=15: po=0.7, pe=0.5, kappa=0.4
    val df = ratings(Seq(
      (("y", "y"), 20), (("y", "n"), 10), (("n", "y"), 5), (("n", "n"), 15)))
    val r = Stats.cohenKappa(df, "ra", "rb").head()
    assert(r.getLong(r.fieldIndex("n_items")) == 50L)
    assert(r.getLong(r.fieldIndex("agree")) == 35L)
    assert(r.getLong(r.fieldIndex("chance")) == 1250L)
    assert(r.getDouble(r.fieldIndex("kappa")) == 0.4)
  }

  test("cohenKappa: one-sided categories contribute zero chance") {
    // rater A sometimes says "x", rater B never does — the x marginal
    // product is 0 and kappa still computes over the union of categories
    val df = ratings(Seq((("y", "y"), 8), (("x", "y"), 2)))
    val r = Stats.cohenKappa(df, "ra", "rb").head()
    // chance = r_y*c_y + r_x*c_x = 8*10 + 2*0 = 80
    assert(r.getLong(r.fieldIndex("chance")) == 80L)
    assert(r.getDouble(r.fieldIndex("kappa")) ==
      math.rint((10.0 * 8 - 80) / (100 - 80) * 1e6) / 1e6)
  }

  test("cohenKappa: perfect agreement is 1, degenerate table is NULL") {
    val perfect = ratings(Seq((("a", "a"), 5), (("b", "b"), 5)))
    val rp = Stats.cohenKappa(perfect, "ra", "rb").head()
    assert(rp.getDouble(rp.fieldIndex("kappa")) == 1.0)
    // both raters always say "a": pe = 1, kappa undefined
    val degen = ratings(Seq((("a", "a"), 10)))
    val rd = Stats.cohenKappa(degen, "ra", "rb").head()
    assert(rd.isNullAt(rd.fieldIndex("kappa")))
  }

  // --- sentences ------------------------------------------------------------

  test("sentences splits on terminator runs and trims") {
    val df = Seq(
      (1L, "Hello world. Two!  Three?"),
      (2L, "no terminator here"),
      (3L, "..."),
      (4L, "Tail stays. last bit")
    ).toDF("id", "text")
    val got = df.select(col("id"), TextAnalysis.sentences(col("text")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(got(1L) == Seq("Hello world", "Two", "Three"))
    assert(got(2L) == Seq("no terminator here"))
    assert(got(3L) == Seq.empty)
    assert(got(4L) == Seq("Tail stays", "last bit"))
  }

  // --- dup-size histogram ---------------------------------------------------

  test("q157 histogram mass equals the q40 label count, sizes >= 2") {
    val dir = "/root/testdata/sf0.001"
    val labels = SparkEntry.queries("q40_neardup_groups")(spark, dir)
    val hist = SparkEntry.queries("q157_dup_size_hist")(spark, dir).collect()
    val mass = hist.map(r => r.getLong(0) * r.getLong(1)).sum
    assert(mass == labels.count())
    assert(hist.forall(_.getLong(0) >= 2L))
  }

  test("q227: the decon-agreement card's set algebra is consistent with " +
      "its own inputs — n_lex equals the persisted lexical flag count, " +
      "n_both <= min(n_lex, n_sem), the union identity holds against " +
      "n_docs, jaccard in [0,1], and the population excludes the " +
      "benchmark era") {
    val dir = "/root/testdata/sf0.01"
    val r = SparkEntry.queries("q227_decon_agreement")(spark, dir).head()
    val (nLex, nSem, nBoth, nDocs, nUnion) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    val lex = SparkEntry.queries("q82_decontamination")(spark, dir)
    assert(nLex === lex.count())
    assert(nBoth <= math.min(nLex, nSem))
    assert(nUnion === nLex + nSem - nBoth)
    assert(nUnion <= nDocs)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    assert(nDocs === docs.filter(col("doc_id") % 97 =!= 0).count())
    val j = r.getDouble(5)
    assert(j >= 0.0 && j <= 1.0)
  }
}
