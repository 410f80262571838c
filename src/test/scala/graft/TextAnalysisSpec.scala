package graft

import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** Unit behaviour of the text-analysis family beyond the oracle queries:
  * language-ID precedence, fingerprint fallback, BPE-ish counting edges,
  * quality-score bounds. */
class TextAnalysisSpec extends SparkSpec {
  import sqlImplicits._

  private def lang(texts: String*): Seq[String] =
    texts.toDF("t").select(TextAnalysis.langId(col("t")).as("l"))
      .collect().map(_.getString(0)).toSeq

  test("langId: script beats stopwords, precedence breaks ties, und on no evidence") {
    assert(lang("the cat is on the mat") === Seq("en"))
    assert(lang("el perro y la casa de los niños") === Seq("es"))
    assert(lang("le chat est dans les maisons") === Seq("fr"))
    assert(lang("der hund und die katze ist mit von") === Seq("de"))
    assert(lang("你好 world the a") === Seq("zh"))      // CJK wins over stopwords
    assert(lang("xyzzy plugh quux") === Seq("und"))     // zero evidence
    assert(lang("the el") === Seq("en"))                // tie → precedence order
  }

  test("langIdOfTokens: half-doc code-switching is visible where the " +
      "whole-doc argmax is not, and agrees with langId on full docs") {
    def halves(text: String): (String, String) = {
      val toks = TextAnalysis.tokens(lower(col("t")))
      val n = size(toks)
      val hl = floor((n + lit(1)) / lit(2)).cast("int")
      val r = Seq(text).toDF("t").select(
        TextAnalysis.langIdOfTokens(slice(toks, lit(1), hl)).as("h"),
        TextAnalysis.langIdOfTokens(slice(toks, hl + 1, n - hl)).as("l"))
        .collect()(0)
      (r.getString(0), r.getString(1))
    }
    // en head + es tail: the whole doc argmaxes to ONE language (en by
    // precedence on the 5-5 tie), the halves see both
    val mixedDoc = "the cat is on the mat " +
      "el perro y la casa de las casas"
    assert(lang(mixedDoc) === Seq("es")) // whole doc: es hits outnumber en
    assert(halves(mixedDoc) === (("en", "es")))
    // a uniform doc splits into agreeing halves
    assert(halves("the cat is on the mat and the dog is in the house") ===
      (("en", "en")))
    // CJK in one half only
    assert(halves("the cat is on the mat 你好 世界 你好 世界 你好 世界") ===
      (("en", "zh")))
    // full-token slice reproduces langId (CJK check rides the rejoin)
    val docs = Seq("the cat is on the mat", "el perro y la casa",
      "你好 world the a", "xyzzy plugh quux")
    val full = docs.toDF("t").select(
      TextAnalysis.langIdOfTokens(
        TextAnalysis.tokens(lower(col("t")))).as("l"))
      .collect().map(_.getString(0)).toSeq
    assert(full === lang(docs: _*))
  }

  test("fingerprint: short texts fall back to the whole-text digest") {
    val got = Seq("short", "this one is definitely longer than sixteen chars")
      .toDF("t").select(length(col("t")), TextAnalysis.fingerprint(col("t")).as("fp"))
      .collect()
    // short: md5 of the whole text
    assert(got(0).getString(1) ===
      java.security.MessageDigest.getInstance("MD5")
        .digest("short".getBytes("UTF-8")).map("%02x".format(_)).mkString)
    // long: a 32-hex min over the window digests — not the whole-text md5
    assert(got(1).getString(1).matches("[0-9a-f]{32}"))
  }

  test("fingerprint is shift-invariant only for shared 16-gram content") {
    // two texts sharing a long run collide iff the minimal 16-gram lies in it
    val df = Seq(
      "AAAA common-run-of-chars-here BBBB",
      "CCCC common-run-of-chars-here DDDD").toDF("t")
      .select(TextAnalysis.fingerprint(col("t")).as("fp"))
    val fps = df.collect().map(_.getString(0))
    // deterministic either way; assert stability across evaluations
    val fps2 = df.collect().map(_.getString(0))
    assert(fps.toSeq === fps2.toSeq)
  }

  test("bpeTokenCount: letters, digits and punctuation split as expected") {
    val got = Seq("Hello, world42!", "", "  ", "a1b2")
      .toDF("t").select(TextAnalysis.bpeTokenCount(col("t")).as("n"))
      .collect().map(_.getLong(0)).toSeq
    // "hello" "," "world" "42" "!" = 5 ; empty/whitespace = 0 ; a 1 b 2 = 4
    assert(got === Seq(5L, 0L, 0L, 4L))
  }

  test("qualityScore is bounded in [0,1] and rewards diversity and length") {
    val rows = Seq(
      "word " * 60,                       // long but zero diversity
      ((1 to 60).map(i => s"w$i").mkString(" ")), // long and diverse
      "one two three")                    // short and diverse
      .toDF("t").select(TextAnalysis.qualityScore(col("t")).as("s"))
      .collect().map(_.getDouble(0))
    assert(rows.forall(s => s >= 0.0 && s <= 1.0))
    assert(rows(1) > rows(0), "diverse should beat repetitive at same length")
    assert(rows(1) > rows(2), "long+diverse should beat short+diverse")
  }

  test("stopwordRatio counts with multiplicity") {
    val r = Seq("the the the word").toDF("t")
      .select(TextAnalysis.stopwordRatio(col("t"), TextAnalysis.StopEn).as("r"))
      .head().getDouble(0)
    assert(r === 0.75)
  }

  test("chunks: zero-overlap chunks reassemble; overlap repeats the seam") {
    val text = ('a' to 'z').mkString * 10 // 260 chars
    val df = Seq((1L, text), (2L, ""), (3L, "short")).toDF("doc_id", "text")

    val noOv = TextAnalysis.chunks(df, "doc_id", "text", size = 100, overlap = 0)
      .filter(col("doc_id") === 1).orderBy("off").collect()
    assert(noOv.map(_.getAs[String]("chunk")).mkString === text)

    val ov = TextAnalysis.chunks(df, "doc_id", "text", size = 100, overlap = 30)
      .filter(col("doc_id") === 1).orderBy("off").collect()
    val cs = ov.map(_.getAs[String]("chunk"))
    assert(cs.head.takeRight(30) === cs(1).take(30), "seam must repeat")
    assert(ov.map(_.getAs[Long]("off")).toSeq === Seq(0L, 70L, 140L, 210L))

    // degenerate docs: empty and shorter-than-size both yield ONE chunk
    val one = TextAnalysis.chunks(df, "doc_id", "text", 100, 0)
      .filter(col("doc_id") > 1).collect()
    assert(one.length === 2)
    assert(one.map(_.getAs[String]("chunk")).toSet === Set("", "short"))
  }

  test("redactPii scrubs emails before digit runs and counts each kind") {
    import sqlImplicits._
    val rows = Seq(
      (1L, "mail me at jo.h9_n+x@sub.example.org or call 3001234567"),
      (2L, "short num 123456 stays, 1234567 goes"),
      (3L, "no pii here"),
      (4L, "two mails a@b.co c@d.org and 99999999")
    ).toDF("id", "text")
    val got = rows.select(col("id"),
      TextAnalysis.redactPii(col("text")).as("red"),
      TextAnalysis.piiEmailCount(col("text")).as("ne"),
      TextAnalysis.piiNumberCount(col("text")).as("nn"))
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) === (("mail me at <EMAIL> or call <NUM>", 1L, 1L)))
    assert(got(2L) === (("short num 123456 stays, <NUM> goes", 0L, 1L)))
    assert(got(3L) === (("no pii here", 0L, 0L)))
    assert(got(4L) === (("two mails <EMAIL> <EMAIL> and <NUM>", 2L, 1L)))
    // digits inside an email local part are NOT double-counted as numbers:
    // doc 1 has exactly one number redaction (the phone), not two
  }

  test("dupGramFraction measures duplicate word 3-grams, 0 for short docs") {
    import sqlImplicits._
    val rows = Seq(
      (1L, "a b c a b c a b"),   // 6 grams, 3 distinct → 0.5
      (2L, "all words differ here now"), // 3 grams, all distinct → 0.0
      (3L, "too short"),          // < 3 tokens → no grams → 0.0
      (4L, "x x x x x")           // 3 grams, 1 distinct → 2/3
    ).toDF("id", "text")
    val got = rows.select(col("id"),
      round(TextAnalysis.dupGramFraction(col("text")), 4).as("f"),
      size(TextAnalysis.wordGrams(
        TextAnalysis.tokens(lower(col("text"))), 3)).as("n"))
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getInt(2)))).toMap
    assert(got(1L) === ((0.5, 6)))
    assert(got(2L) === ((0.0, 3)))
    assert(got(3L) === ((0.0, 0)))
    assert(got(4L) === ((0.6667, 3)))
  }

  test("charDiversity: exact Gini–Simpson from integer counts") {
    import sqlImplicits._
    val rows = Seq(
      (1L, "aaaa"),  // one char → 0.0
      (2L, "abab"),  // two chars evenly → 1 - 8/16 = 0.5
      (3L, "abcd"),  // all distinct → 1 - 4/16 = 0.75
      (4L, "")       // empty → no row
    ).toDF("doc_id", "text")
    val got = TextAnalysis.charDiversity(rows, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got(1L) === ((4L, 16L, 0.0)))
    assert(got(2L) === ((4L, 8L, 0.5)))
    assert(got(3L) === ((4L, 4L, 0.75)))
    assert(!got.contains(4L))
  }

  test("charDiversityCol: the column form equals the DataFrame form on " +
      "every non-empty text (the q217 fixture-stage contract) and is " +
      "null on empty text") {
    import sqlImplicits._
    import org.apache.spark.sql.functions.col
    val rows = Seq((1L, "aaaa"), (2L, "abab"), (3L, "abcd"),
      (4L, "mississippi river"), (5L, "")).toDF("doc_id", "text")
    val colForm = rows.select(col("doc_id"),
        TextAnalysis.charDiversityCol(col("text")).as("cd"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    val dfForm = TextAnalysis.charDiversity(rows, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    dfForm.foreach { case (id, v) => assert(colForm(id) === Some(v)) }
    assert(colForm(5L) === None)
  }

  test("bm25TopK: hand-checked Robertson scores on a 3-doc fixture — " +
      "saturation and length norm follow plain-Scala arithmetic, docs " +
      "without a query term never appear, ranks break ties by doc id") {
    import sqlImplicits._
    val docs = Seq((1L, "a b"), (2L, "a a a"), (3L, "c"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.bm25TopK(docs, "doc_id", "text",
        queries = Seq(7L -> "a"), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    // independent plain-Scala replay: N=3, tot=6, avgdl=2, df(a)=2;
    // a single-term query makes score == the 6dp contribution itself
    def contrib(tf: Double, dl: Double): Double = {
      val idf = math.log(((3L - 2L).toDouble + 0.5) / (2.0 + 0.5))
      val sat = (tf * (1.2 + 1.0)) /
        (tf + 1.2 * ((1.0 - 0.75) + (0.75 * dl) / (6.0 / 3.0)))
      BigDecimal(idf * sat)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val s1 = contrib(1.0, 2.0) // doc 1: tf=1, dl=2 → sat exactly 1
    val s2 = contrib(3.0, 3.0) // doc 2: saturated but longer
    assert(s1 > s2) // idf(a) < 0 (df > N/2): the shorter doc wins
    assert(got.toSeq === Seq((7L, 1L, 1L, s1), (7L, 2L, 2L, s2)))
  }

  test("tfidfTopTerms ranks a doc's distinctive term above the corpus-wide one") {
    import sqlImplicits._
    val docs = Seq(
      (1L, "common common rare"),
      (2L, "common common common"),
      (3L, "common unique unique unique")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.tfidfTopTerms(docs, "doc_id", "text", k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getString(2), r.getLong(3), r.getLong(4)))).toMap
    // doc 1: 'rare' df=1 beats 'common' df=3 despite lower tf
    assert(got((1L, 1L))._1 === "rare")
    assert(got((1L, 2L))._1 === "common")
    // doc 3: 'unique' tf=3 df=1 dominates
    assert(got((3L, 1L)) === (("unique", 3L, 1L)))
    // doc 2 has only one distinct term → exactly one row
    assert(!got.contains((2L, 2L)))
  }

  test("tfidfTopTerms: a term present in EVERY doc (worst-case skew) scores df = n_docs") {
    import sqlImplicits._
    // the degenerate stopword case: one term in all docs. Under the old
    // window-over-term df this was the unsplittable straggler partition;
    // the partial-agg + join shape handles it as an ordinary hot join key.
    val n = 200
    val docs = (1 to n).map(i => (i.toLong, s"the word$i")).toDF("doc_id", "text")
    val got = TextAnalysis.tfidfTopTerms(docs, "doc_id", "text", k = 2)
    val the = got.filter(col("term") === "the").collect()
    assert(the.length === n)
    assert(the.forall(_.getLong(4) === n.toLong))  // df = n_docs
    // the rare per-doc term always outranks the universal one
    val top = got.filter(col("rnk") === 1).collect()
    assert(top.forall(_.getString(2) != "the"))
  }

  test("collocations: lift is exact and the long-doc cap bounds pair mining") {
    import sqlImplicits._
    val docs = Seq(
      (1L, "x y"), (2L, "x y"), (3L, "x z"),
      (4L, (1 to 50).map(i => s"w$i").mkString(" "))  // 50 distinct terms
    ).toDF("doc_id", "text")
    // uncapped: the wide doc contributes 50*49/2 pairs
    val all = TextAnalysis.collocations(docs, "doc_id", "text",
      supportDen = 1000L, maxTermsPerDoc = 1000)
    assert(all.count() > 1000L)
    // capped at 10 terms: doc 4 is excluded from pair mining entirely,
    // but N and term frequencies still include it
    val capped = TextAnalysis.collocations(docs, "doc_id", "text",
      supportDen = 1000L, maxTermsPerDoc = 10)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(capped.keySet == Set(("x", "y"), ("x", "z")))
    // lift(x,y) = n_ab*N/(n_x*n_y) = 2*4/(3*2)
    assert(capped(("x", "y")) === ((2L, math.round(2.0 * 4 / 6 * 1e6) / 1e6)))
    assert(capped(("x", "z")) === ((1L, math.round(1.0 * 4 / 3 * 1e6) / 1e6)))
  }

  test("oovRate counts tokens outside the min-count vocabulary") {
    import sqlImplicits._
    val docs = Seq(
      (1L, "aa aa bb"),      // aa(x4), bb(x2) both in vocab
      (2L, "aa aa bb zz"),   // zz appears once → OOV
      (3L, "yy xx")          // both singletons → all OOV
    ).toDF("doc_id", "text")
    val got = TextAnalysis.oovRate(docs, "doc_id", "text", minCount = 2L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got(1L) === ((3L, 0L, 0.0)))
    assert(got(2L) === ((4L, 1L, 0.25)))
    assert(got(3L) === ((2L, 2L, 1.0)))
  }

  test("bpePairCounts weights pairs by word frequency over the vocab") {
    import sqlImplicits._
    // vocab: "abab" ×3, "ab" ×2, "x" ×1 (dropped: single char)
    val docs = Seq("abab ab abab", "abab AB x").toDF("text")
    val got = TextAnalysis.bpePairCounts(docs, "text", topK = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // "abab": pairs ab, ba, ab → ab:2, ba:1 per occurrence (wc=3)
    // "ab": ab:1 per occurrence (wc=2, case-folded)
    assert(got == Map("ab" -> 8L, "ba" -> 3L))
  }

  test("bpePairCounts topK cuts on (cnt desc, pair) deterministically") {
    import sqlImplicits._
    val docs = Seq("aa bb cc aa bb aa").toDF("text")
    val got = TextAnalysis.bpePairCounts(docs, "text", topK = 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("aa", 3L), ("bb", 2L)))
  }

  private val bpeMerges = Seq("t" -> "h", "th" -> "e", "i" -> "n",
    "a" -> "n", "an" -> "d", "e" -> "r", "o" -> "n", "r" -> "e")

  test("bpeSymbolCount applies merges in rank order, left-to-right " +
      "non-overlapping, chained merges included") {
    val df = Seq("and", "another", "thethe", "x", "thinking", "cat")
      .toDF("w")
    val got = df.select(col("w"),
        TextAnalysis.bpeSymbolCount(col("w"), bpeMerges).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("and") === 1L)      // a+n -> an, then an+d -> and
    assert(got("another") === 4L)  // an|o|the|r (e already inside "the")
    assert(got("thethe") === 2L)   // adjacent repeats both merge in one pass
    assert(got("x") === 1L)
    assert(got("thinking") === 5L) // th|in|k|in|g
    assert(got("cat") === 3L)      // no rule applies
  }

  test("bpeTokenCounts: per-doc totals are occurrence-weighted vocab sums") {
    val docs = Seq((1L, "the thin cat and another cat"),
      (2L, "and and and")).toDF("doc_id", "text")
    val got = TextAnalysis.bpeTokenCounts(docs, "doc_id", "text", bpeMerges)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // the=1, thin=2, cat=3, and=1, another=4 → 1+2+3+1+4+3 = 14 over 6 words
    assert(got(1L) === ((6L, 14L)))
    assert(got(2L) === ((3L, 3L)))
  }

  test("q263 vocab growth: prefixes are nested (monotone counts) and " +
      "the 100% point equals the directly-computed corpus totals") {
    val dir = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("q263_vocab_growth")(spark, dir)
      .collect()
    assert(rows.map(_.getAs[Long]("pct")).toSeq ===
      Seq(5L, 10L, 20L, 50L, 100L))
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("vocab") <= b.getAs[Long]("vocab"))
        assert(a.getAs[Long]("n_tokens") <= b.getAs[Long]("n_tokens"))
        assert(a.getAs[Long]("n_docs") <= b.getAs[Long]("n_docs"))
      case _ =>
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val full = rows.last
    assert(full.getAs[Long]("n_docs") === docs.count())
    assert(full.getAs[Long]("n_tokens") ===
      docs.agg(sum(TextAnalysis.tokenCount(col("text")))).head().getLong(0))
    assert(full.getAs[Long]("vocab") ===
      docs.select(explode(TextAnalysis.tokens(lower(col("text"))))
        .as("t")).distinct().count())
  }

  test("q265 fertility drift: fertility >= 1 on both eras (a word is " +
      "at least one BPE token) and the integer flag reproduces the " +
      "1/21 band exactly") {
    val rows = SparkEntry.queries("q265_fertility_drift")(spark,
      "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (wh, th) = (r.getAs[Long]("w_hist"), r.getAs[Long]("t_hist"))
      val (wb, tb) = (r.getAs[Long]("w_batch"), r.getAs[Long]("t_batch"))
      if (wh > 0) assert(th >= wh, r.toString)
      if (wb > 0) assert(tb >= wb, r.toString)
      val want = tb * wh * 21L > th * wb * 22L ||
        th * wb * 21L > tb * wh * 22L
      assert(r.getAs[Boolean]("retrain_flag") === want, r.toString)
    }
  }
}
