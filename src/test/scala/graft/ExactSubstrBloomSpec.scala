package graft

import org.apache.spark.sql.functions._

import graft.operators.{NearDup, Sketches}

/** The Bloom-pruned cover join of exact-substring dedup
  * (`repeatedSpansFromGramsPruned`) — exact-equality against the unpruned
  * operator, the join-input shrink the prune exists for, and the
  * self-cleaning false-positive contract.
  */
class ExactSubstrBloomSpec extends SparkSpec {
  import sqlImplicits._

  private val L = 32

  test("pruned spans EXACTLY equal unpruned spans on real corpus data") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val grams = NearDup.repeatedSpanGrams(docs, "doc_id", "text", L).persist()
    try {
      val plain = NearDup.repeatedSpansFromGrams(grams, L)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet
      val pruned = NearDup.repeatedSpansFromGramsPruned(grams, L)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet
      assert(plain.nonEmpty, "corpus fixture must contain repeated spans")
      assert(pruned === plain)
    } finally { grams.unpersist(); () }
  }

  test("the join input shrinks: bloom-surviving gram rows are a small " +
    "fraction of the gram table (the exchange-row cut at scale)") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val grams = NearDup.repeatedSpanGrams(docs, "doc_id", "text", L).persist()
    try {
      val total = grams.count()
      val dup = grams.groupBy(col("gm"))
        .agg(countDistinct(col("id")).as("n"))
        .filter(col("n") >= 2).select(col("gm"))
      val bits = Sketches.bloomBitsArray(dup, col("gm"), 1L << 20, 3)
      val surviving =
        Sketches.bloomPrune(grams, col("gm"), bits, 1L << 20, 3).count()
      // duplicated grams are rare by construction in a mostly-organic
      // corpus; anything short of a big cut means the prune (and the
      // shuffle it saves at 100 TB) isn't doing its job
      assert(surviving * 2 < total,
        s"bloom prune left $surviving of $total gram rows")
    } finally { grams.unpersist(); () }
  }

  test("a same-doc repeat (n_docs = 1) that false-positives through the " +
    "bloom is cleaned by the stats filter — never emitted as a span") {
    // doc 1 repeats its own passage twice (cross-position, single doc);
    // doc 2 is organic. No CROSS-doc duplication exists, so the correct
    // span set is empty regardless of what the bloom lets through.
    val rep = "this exact passage repeats within one single document body"
    val docs = Seq(
      (1L, s"$rep and then, after an interlude of other words, $rep again."),
      (2L, "an entirely unrelated second document with its own phrasing, " +
        "long enough to produce grams but sharing no passage.")
    ).toDF("doc_id", "text")
    val grams = NearDup.repeatedSpanGrams(docs, "doc_id", "text", L)
    // tiny filter => high fp rate by construction; correctness must hold
    assert(NearDup.repeatedSpansFromGramsPruned(grams, L,
      numBits = 64L, numHashes = 2).count() === 0L)
    assert(NearDup.repeatedSpansFromGrams(grams, L).count() === 0L)
  }

  test("empty duplicated-digest set (fully organic corpus) prunes " +
    "everything and yields no spans without error") {
    val docs = Seq(
      (1L, "first organic document written in completely original words " +
        "that never appear elsewhere in this minimal corpus at all"),
      (2L, "second body of text equally unique in its phrasing and long " +
        "enough to clear the gram threshold comfortably today")
    ).toDF("doc_id", "text")
    val grams = NearDup.repeatedSpanGrams(docs, "doc_id", "text", L)
    assert(NearDup.repeatedSpansFromGramsPruned(grams, L).count() === 0L)
  }

  test("prune pipeline plan: row-local native membership filter, no " +
    "exchange between the gram scan and the filter") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val grams = NearDup.repeatedSpanGrams(docs, "doc_id", "text", L)
    val dup = grams.groupBy(col("gm"))
      .agg(countDistinct(col("id")).as("n"))
      .filter(col("n") >= 2).select(col("gm"))
    val bits = Sketches.bloomBitsArray(dup, col("gm"), 1L << 20, 3)
    val p = Sketches.bloomPrune(grams, col("gm"), bits, 1L << 20, 3)
      .queryExecution.executedPlan.toString
    assert(p.contains("graft_sorted_contains"), p)
    assert(!p.contains("CartesianProduct"), p)
  }
}
