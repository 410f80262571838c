package graft

import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** Contracts of the selection wave (q215/q216/q217): DSIR importance
  * log-ratios (hashed-feature ordering + the mean-centered relative
  * verdict), the bigram-interpolation curve (hand-checked mixture
  * values, λ=0 == pure frozen-unigram), and the quality-filter
  * complementarity card (repetition ⊆ structural by construction —
  * the thresholds are the same rule — while diversity stays
  * independent). */
class SelectionCurveSpec extends SparkSpec {
  import sqlImplicits._

  private val dir = "/root/testdata/sf0.01"

  test("dsirLogRatio: a target-exclusive doc outranks a raw-exclusive " +
      "doc, and the mean-centered flag splits them") {
    val docs = Seq((1L, "alpha alpha alpha", true),
      (2L, "omega omega omega", false)).toDF("id", "text", "tgt")
    val r = TextAnalysis.dsirLogRatio(docs, "id", "text", col("tgt"))
      .orderBy(col("id")).collect()
    assert(r.length === 2)
    val (lr1, lr2) = (r(0).getDouble(2), r(1).getDouble(2))
    // alpha appears in the target slice, omega never does: the target
    // model prices alpha above its raw rate and omega at smoothing floor
    assert(lr1 > lr2, s"target-exclusive $lr1 !> raw-exclusive $lr2")
    assert(r(0).getBoolean(3) && !r(1).getBoolean(3),
      "mean-centered flag must separate a strict two-doc ordering")
    assert(r.forall(_.getLong(1) === 3L))
  }

  test("q215: every doc scores exactly once, ratios are finite, and " +
      "the relative verdict is non-degenerate on the graded corpus") {
    val out = SparkEntry.queries("q215_dsir_weights")(spark, dir).collect()
    val nDocs = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(out.length === nDocs)
    out.foreach { r =>
      assert(!r.isNullAt(2) && !r.getDouble(2).isNaN, s"bad ratio in $r")
    }
    val nSel = out.count(_.getBoolean(3))
    assert(nSel > 0 && nSel < out.length,
      s"mean-centered selection degenerate: $nSel of ${out.length}")
  }

  test("bigramLambdaCurve: hand-checked mixture — hist 'a a b' (bigrams " +
      "(a,a),(a,b); unigrams a:2 b:1, tot 3, |V| 2), batch 'a b' scores " +
      "0.8959 at λ=0 (pure add-one unigram) and 1.1309 at λ=0.5") {
    val hist = Seq((1L, "a a b")).toDF("doc_id", "text")
    val batch = Seq((10L, "a b")).toDF("doc_id", "text")
    val r = TextAnalysis.bigramLambdaCurve(hist, batch, "doc_id", "text",
      lambdas = Seq(0.0, 0.5)).collect()
    assert(r.length === 2)
    assert(r.forall(_.getLong(1) === 2L)) // n_tok
    assert(r.forall(_.getLong(2) === 1L)) // ctx hit: only 'b' has prev 'a'
    assert(r.forall(_.getLong(3) === 1L)) // pair hit: (a,b)
    // λ=0: puni(a)=3/6, puni(b)=2/6 → -(ln .5 + ln 1/3)/2
    val x0 = -(math.log(0.5) + math.log(1.0 / 3.0)) / 2.0
    assert(r(0).getDouble(4) === math.round(x0 * 1e4) / 1e4)
    // λ=.5: token 'a' has no context (pbi 0) → .5·.5; 'b': pbi=c2/c1=1/2
    val x5 = -(math.log(0.25) +
      math.log(0.5 * 0.5 + 0.5 / 3.0)) / 2.0
    assert(r(1).getDouble(4) === math.round(x5 * 1e4) / 1e4)
  }

  test("q216: one row per λ with λ-free coverage stats, positive xent, " +
      "and pair hits never exceeding context hits") {
    val out = SparkEntry.queries("q216_bigram_lambda_curve")(spark, dir)
      .collect()
    assert(out.length === 5)
    assert(out.map(_.getLong(1)).distinct.length === 1, "n_tok varies by λ")
    assert(out.map(_.getLong(2)).distinct.length === 1)
    assert(out.map(_.getLong(3)).distinct.length === 1)
    out.foreach { r =>
      assert(r.getDouble(4) > 0.0, s"non-positive xent in $r")
      assert(r.getLong(3) <= r.getLong(2), s"pair hits > ctx hits in $r")
    }
  }

  test("q217: repetition ⊆ structural by construction (the battery's " +
      "f_rep IS the repetition threshold), every card row conserves " +
      "n_union, and jaccard stays in [0,1]") {
    val rows = SparkEntry.queries("q217_filter_overlap")(spark, dir)
      .collect()
    assert(rows.length === 3)
    rows.foreach { r =>
      val (na, nb, both, union) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(both <= math.min(na, nb), s"overlap exceeds a family in $r")
      assert(union === na + nb - both, s"union wrong in $r")
      val j = r.getDouble(6)
      assert(j >= 0.0 && j <= 1.0, s"jaccard out of range in $r")
    }
    val repStruct = rows.find(r =>
      r.getString(0) == "repetition" && r.getString(1) == "structural").get
    assert(repStruct.getLong(4) === repStruct.getLong(2),
      "every repetition drop must also be a structural drop")
    assert(repStruct.getLong(2) > 0, "repetition family never fired")
  }
}
