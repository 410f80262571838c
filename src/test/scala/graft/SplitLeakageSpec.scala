package graft

import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** Round-12 split/weighting wave: the splitter-side leakage audit
  * (q210), the order-0 CCNet perplexity filter (q211) and soft dedup
  * (q212). The DuckDB oracle pins the exact arithmetic; these tests pin
  * the STRUCTURAL contracts — the cluster-keyed split cannot leak, the
  * unigram model scores rare-token docs higher with hand-checked
  * values, and soft-dedup weighting conserves token mass. */
class SplitLeakageSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("q210: the cluster-keyed split leaks ZERO near-dup pairs by " +
      "construction, the duplicate-blind naive split leaks on this " +
      "corpus, and both policies cover every doc exactly once") {
    val card = SparkEntry.queries("q210_split_leakage")(spark, dir)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(card.keySet === Set("naive", "cluster"))
    val nDocs = spark.read.parquet(s"$dir/documents.parquet").count()
    val (ct, cv, cs, cl) = card("cluster")
    val (nt, nv, ns, nl) = card("naive")
    assert(ct + cv + cs === nDocs)
    assert(nt + nv + ns === nDocs)
    // split is a function of the cluster canonical: same cluster, same
    // split — leakage is structurally impossible, not just unobserved
    assert(cl === 0L)
    // and the naive policy demonstrates the problem the card grades
    assert(nl > 0L)
  }

  test("unigramXent: exact hand-checked order-0 values — the all-head-" +
      "token doc scores LOW, the rare-token doc HIGH") {
    import sqlImplicits._
    // corpus: a a a | b — counts a=3, b=1, total=4
    val docs = Seq((1L, "a a a"), (2L, "b")).toDF("doc_id", "text")
    val out = TextAnalysis.unigramXent(docs, "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out(1L)._1 === 3L && out(2L)._1 === 1L)
    assert(out(1L)._2 === 0.2877) // -ln(3/4)
    assert(out(2L)._2 === 1.3863) // -ln(1/4)
    assert(out(2L)._2 > out(1L)._2)
  }

  test("q211: every doc scores a strictly positive cross-entropy and " +
      "the per-doc token counts reconcile with the corpus total") {
    val out = SparkEntry.queries("q211_unigram_xent")(spark, dir).collect()
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    assert(out.length === docs.count())
    out.foreach { r =>
      assert(r.getLong(1) >= 1L, s"empty token list in $r")
      assert(r.getDouble(2) > 0.0, s"non-positive xent in $r")
    }
    val totalToks = docs
      .agg(sum(TextAnalysis.tokenCount(col("text")))).head.getLong(0)
    assert(out.map(_.getLong(1)).sum === totalToks)
  }

  test("q212: soft dedup conserves token mass — effective == raw " +
      "exactly for cluster-free sources, strictly below raw otherwise, " +
      "and the clustered-doc total matches the q40 closure") {
    val card = SparkEntry.queries("q212_soft_dedup")(spark, dir).collect()
    val labeled = SparkEntry.queries("q40_neardup_groups")(spark, dir).count()
    card.foreach { r =>
      val (nClustered, raw, eff) =
        (r.getLong(2), r.getLong(3), r.getDouble(4))
      if (nClustered == 0L) assert(eff === raw.toDouble, s"row $r")
      else assert(eff < raw.toDouble, s"row $r") // weight <= 1/2 each
    }
    assert(card.map(_.getLong(2)).sum === labeled)
  }
}
