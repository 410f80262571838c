package graft

import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** In-engine BPE merge training (`bpeTrainMerges`) — hand-checked greedy
  * merges on a fixed corpus, the round-1 equivalence with q112's pair
  * counts, apply/train consistency, and the fully-merged-word guard. */
class BpeTrainSpec extends SparkSpec {
  import sqlImplicits._

  test("learned merges match the hand-computed greedy sequence") {
    // "aaab" x3, "aab" x2: round 1 counts a|a = 3*2+2 = 8, a|b = 5 —
    // merge (a,a) -> "aa". Round 2 state: aa|a|b x3, aa|b x2 — pairs
    // aa|a = 3, a|b = 3, aa|b = 2; tie 3 = 3 broken by pair text:
    // "a<US>b" < "aa<US>a" (shorter first symbol, <US> < 'a') -> (a, b).
    // Round 3: aa|a|ab? no — state aa|ab x3, aa|b x2: aa|ab = 3 wins.
    val docs = Seq((1L, "aaab aaab"), (2L, "aaab aab"), (3L, "aab"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.bpeTrainMerges(docs, "text", rounds = 3)
      .collect().map(r =>
        (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq === Seq(
      (1L, "a", "a", 8L),
      (2L, "a", "b", 3L),
      (3L, "aa", "ab", 3L)))
  }

  test("round 1 winner equals bpePairCounts' top character pair on the " +
    "real corpus (every initial symbol is one character)") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val top = TextAnalysis.bpePairCounts(docs, "text", topK = 1)
      .head()
    val r1 = TextAnalysis.bpeTrainMerges(docs, "text", rounds = 1).head()
    assert(r1.getString(1) + r1.getString(2) === top.getString(0))
    assert(r1.getLong(3) === top.getLong(1))
  }

  test("train/apply consistency: tokens under the learned merges shrink " +
    "monotonically with more rounds and never below one per word") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .limit(50).persist()
    try {
      val learned = TextAnalysis.bpeTrainMerges(docs, "text", rounds = 4)
        .collect().map(r => (r.getString(1), r.getString(2))).toSeq
      def total(merges: Seq[(String, String)]): Long =
        TextAnalysis.bpeTokenCounts(docs, "doc_id", "text", merges)
          .agg(sum(col("n_tokens"))).head().getLong(0)
      val words = TextAnalysis.bpeTokenCounts(docs, "doc_id", "text",
          learned)
        .agg(sum(col("n_words"))).head().getLong(0)
      val t2 = total(learned.take(2))
      val t4 = total(learned)
      assert(t4 <= t2, "more merges can only shrink the token count")
      assert(t4 >= words, "a word is never fewer than one token")
    } finally { docs.unpersist(); () }
  }

  test("a word that merges to a single symbol stops contributing pairs " +
    "(no out-of-bounds, no phantom rules)") {
    // "ab" x5 collapses to one symbol after round 1; rounds 2+ must
    // learn from the remaining material only
    val docs = Seq((1L, "ab ab ab ab ab xy xy xz")).toDF("doc_id", "text")
    val got = TextAnalysis.bpeTrainMerges(docs, "text", rounds = 2)
      .collect().map(r =>
        (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq === Seq(
      (1L, "a", "b", 5L),
      (2L, "x", "y", 2L)))
  }

  test("corpus with no multi-char words yields no rules at all") {
    val docs = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    assert(TextAnalysis.bpeTrainMerges(docs, "text", rounds = 2)
      .count() === 0L)
  }
}
