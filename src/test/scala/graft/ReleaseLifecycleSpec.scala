package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.operators.NearDup

/** q208 release-to-release composition contracts. The capstone claims
  * (a) conservation across time — v2 = v1 − takedown + admitted and the
  * snapshot-diff card reconciles row-for-row, (b) the nightly admission
  * is LITERALLY q202's final gate, and (c) the restriction-stability
  * argument that lets v1 derive its first four gates by FILTERING the
  * persisted corpus-wide gate table: every one of those gates consults
  * only lower ids or per-doc state, so history-restricted equals
  * corpus-wide-filtered. (c) is pinned at sf0.01, where the history/
  * batch split is real (sf0.001 has no batch docs, so the filter would
  * be the identity and the test vacuous). */
class ReleaseLifecycleSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  private def rows(name: String): Map[String, (Long, Long)] =
    SparkEntry.queries(name)(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap

  test("conservation across time: v2 = v1 - takedown + admitted, the " +
      "diff card reconciles row-for-row, CHANGED is structurally zero, " +
      "and the v1 funnel is monotone") {
    val c = rows("q208_release_lifecycle")
    assert(c("8_v2_release")._1 === c("5_v1_balance")._1 -
      c("6_takedown_gone")._1 + c("7_nightly_admitted")._1)
    assert(c("8_v2_release")._2 === c("5_v1_balance")._2 -
      c("6_takedown_gone")._2 + c("7_nightly_admitted")._2)
    assert(c("9a_diff_new") === c("7_nightly_admitted"),
      "every NEW doc is a nightly admission")
    assert(c("9b_diff_gone") === c("6_takedown_gone"),
      "every GONE doc is a takedown")
    assert(c("9c_diff_changed") === ((0L, 0L)),
      "no doc text mutates between the eras (edits are q101's dimension)")
    assert(c("9d_diff_same")._1 ===
      c("5_v1_balance")._1 - c("6_takedown_gone")._1)
    val order = Seq("0_v1_raw", "1_v1_gopher", "2_v1_exact_dedup",
      "3_v1_near_dup", "4_v1_decontaminate", "5_v1_balance")
    val docs = order.map(c(_)._1)
    val toks = order.map(c(_)._2)
    assert(docs === docs.sorted.reverse, s"v1 docs not monotone: $docs")
    assert(toks === toks.sorted.reverse, s"v1 tokens not monotone: $toks")
    assert(c("5_v1_balance")._1 > 0L, "an empty v1 is a broken lifecycle")
    assert(c("7_nightly_admitted")._1 > 0L,
      "the sf0.01 batch must admit something")
  }

  test("the nightly admission row IS q202's final registry gate — the " +
      "capstone composes the graded nightly, not a lookalike") {
    val c = rows("q208_release_lifecycle")
    val n = rows("q202_incremental_funnel")
    assert(c("7_nightly_admitted") === n("4_semdedup_registry"))
  }

  test("restriction stability: the corpus-wide digest and near-dup gate " +
      "flags, filtered to the history era, equal a direct history-only " +
      "recomputation (each gate consults only lower ids)") {
    rows("q208_release_lifecycle") // populate the stage cache
    val gates = graft.queries.PipelineQueries
      .stage(spark, dir, "release_gates")(
        sys.error("release_gates must be cached by the lifecycle run"))
      .filter(col("doc_id") < 250).persist()
    try {
      // digest gate: keep-first among HISTORY gopher survivors
      val firstH = gates.filter(col("g_gopher"))
        .withColumn("__rn", row_number().over(
          Window.partitionBy(col("fp")).orderBy(col("doc_id"))))
        .filter(col("__rn") === 1).select(col("doc_id"))
      val s2Stage = gates.filter(col("g_gopher") && col("g_digest"))
        .select(col("doc_id"))
      assert(s2Stage.except(firstH).count() === 0L)
      assert(firstH.except(s2Stage).count() === 0L)
      // near-dup gate: pairs mined from the HISTORY corpus alone drop
      // the same docs the corpus-wide pair table (filtered) drops —
      // LSH candidacy is pair-local (shared bucket), so batch docs
      // cannot create or destroy a history pair
      val histDocs = Tables.load(spark, dir, "documents")
        .filter(col("doc_id") < 250)
      val pairsH = NearDup.verifiedPairsStaged(
        NearDup.shinglePostings(histDocs, "doc_id", "text", k = 3),
        threshold = 0.5)
      val dropH = pairsH
        .join(firstH.select(col("doc_id").as("d1")), Seq("d1"), "left_semi")
        .select(col("d2").as("doc_id")).distinct()
      val s3Stage = gates.filter(col("g_gopher") && col("g_digest") &&
        col("g_neardup")).select(col("doc_id"))
      val s3Direct = s2Stage.join(dropH, Seq("doc_id"), "left_anti")
      assert(s3Stage.except(s3Direct).count() === 0L)
      assert(s3Direct.except(s3Stage).count() === 0L)
    } finally { gates.unpersist(); () }
  }
}
