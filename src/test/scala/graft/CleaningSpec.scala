package graft

import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** Wave 6f \u2014 Unicode normalization expression, markup stripping, and
  * per-source boilerplate line removal. Non-ASCII appears only as
  * \\u escapes so the intended codepoints (precomposed vs decomposed)
  * are unambiguous in the source. */
class CleaningSpec extends SparkSpec {
  import sqlImplicits._

  private val CafeDecomposed = "Cafe\u0301"  // e + combining acute
  private val CafePrecomposed = "Caf\u00e9"  // \u00e9 precomposed

  // --- UnicodeNormalize -----------------------------------------------------

  test("nfc composes, nfkc also folds compatibility forms, stripAccents " +
    "drops marks; ASCII passes through unchanged") {
    val rows = Seq(
      (1, CafeDecomposed),
      (2, CafePrecomposed),
      (3, "\uff28\uff49"),        // full-width "Hi" (NFKC folds, NFC keeps)
      (4, "\ufb01ne"),            // ligature fi + "ne" (NFKC folds)
      (5, "plain ascii stays"),
      (6, "ni\u00f1o t\u00fcr")   // \u00f1, \u00fc
    ).toDF("id", "t")
    val got = rows.select(col("id"), TextAnalysis.nfc(col("t")).as("nfc"),
      TextAnalysis.nfkc(col("t")).as("nfkc"),
      TextAnalysis.stripAccents(col("t")).as("st")).collect()
      .map(r => r.getInt(0) -> ((r.getString(1), r.getString(2),
        r.getString(3)))).toMap
    assert(got(1) === ((CafePrecomposed, CafePrecomposed, "Cafe")))
    assert(got(2) === ((CafePrecomposed, CafePrecomposed, "Cafe")))
    assert(got(3)._1 === "\uff28\uff49")
    assert(got(3)._2 === "Hi")
    assert(got(4)._2 === "fine")
    assert(got(5) === (("plain ascii stays", "plain ascii stays",
      "plain ascii stays")))
    assert(got(6)._3 === "nino tur")
  }

  test("normalization: codegen and interpreted paths agree, NULL in NULL " +
    "out, non-string input is rejected at analysis") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.unsafe.types.UTF8String
    import graft.expressions.UnicodeNormalize
    val s = CafeDecomposed + " \uff28i"
    val df = Seq(Some(s), None).toDF("t")
    val codegen = df.select(TextAnalysis.stripAccents(col("t")).as("k"))
      .collect().map(r => Option(r.getString(0)))
    // interpreted: eval() directly on the expression
    val viaEval = UnicodeNormalize(
      Literal(UTF8String.fromString(s)), UnicodeNormalize.Strip)
      .eval(null).toString
    assert(codegen.flatten.toSeq === Seq(viaEval))
    assert(viaEval === "Cafe \uff28i")
    assert(codegen.count(_.isEmpty) === 1)
    val err = intercept[Exception] {
      Seq(1).toDF("t").select(TextAnalysis.nfc(col("t"))).collect()
    }
    assert(err.getMessage.contains("graft_nfc"))
  }

  test("SQL surface: graft_nfc / graft_strip_accents / graft_match_key / " +
    "graft_strip_markup equal the Column API") {
    val df = Seq((1, "CAF\u00c9 <b>ol\u00e9</b>")).toDF("id", "t")
    df.createOrReplaceTempView("cleaning_sql_v")
    val viaSql = spark.sql(
      """SELECT graft_match_key(t) AS k, graft_strip_markup(t) AS m,
        |       graft_nfc(t) AS n, graft_strip_accents(t) AS s
        |FROM cleaning_sql_v""".stripMargin).collect().head
    val viaCol = df.select(TextAnalysis.matchKey(col("t")).as("k"),
      TextAnalysis.stripMarkup(col("t")).as("m"),
      TextAnalysis.nfc(col("t")).as("n"),
      TextAnalysis.stripAccents(col("t")).as("s")).collect().head
    assert(viaSql === viaCol)
    assert(viaSql.getString(0) === "cafe <b>ole</b>")
  }

  // --- stripMarkup ----------------------------------------------------------

  test("stripMarkup drops script/style WITH content, strips tags, decodes " +
    "entities after tag removal, collapses whitespace") {
    val html = "<html><head><style>.a{x:1}</style></head><body>" +
      "<h1>Q&amp;A</h1><p>a  b</p><script src=\"x\">var q='<p>';</script>" +
      "<p>&lt;tag&gt; stays&nbsp;text &#39;q&#39;</p></body></html>"
    val got = Seq(html).toDF("h")
      .select(TextAnalysis.stripMarkup(col("h"))).collect().head.getString(0)
    assert(got === "Q&A a b <tag> stays text 'q'")
  }

  test("stripMarkup: adjacent script blocks don't merge (non-greedy) and " +
    "markup-free text is only whitespace-normalized") {
    val html = "<script>a();</script>keep<script>b();</script>"
    val got = Seq(html, "no  markup\there").toDF("h")
      .select(TextAnalysis.stripMarkup(col("h"))).collect().map(_.getString(0))
    assert(got(0) === "keep")
    assert(got(1) === "no markup here")
  }

  // --- extractLinks ---------------------------------------------------------

  test("extractLinks keeps absolute http(s) links only, preserves " +
    "pre-filter positions, canonicalizes and extracts the domain") {
    val html = "<a href=\"/rel\">r</a>" +
      "<a href=\"HTTPS://A.B.Example.COM/p?utm_x=1&b=2&a=1\">x</a>" +
      "<a href=\"mailto:a@b.c\">m</a>" +
      "<a class=\"z\" href=\"http://news.site.org:80/q\">y</a>"
    val got = graft.functions.Urls.extractLinks(
      Seq((7L, html)).toDF("doc_id", "html"), "doc_id", "html")
      .orderBy(col("link_no")).collect()
      .map(r => (r.getLong(1), r.getString(2), r.getString(3)))
    assert(got.toSeq === Seq(
      (1L, "https://a.b.example.com/p?a=1&b=2", "example.com"),
      (3L, "http://news.site.org/q", "site.org")))
    // a page with no links yields no rows, not a null row
    val none = graft.functions.Urls.extractLinks(
      Seq((1L, "<p>plain</p>")).toDF("doc_id", "html"), "doc_id", "html")
    assert(none.count() === 0L)
  }

  // --- stripBoilerplate -----------------------------------------------------

  test("stripBoilerplate removes lines above the per-source frequency " +
    "floor, keeps rare lines, preserves order, and an all-boilerplate doc " +
    "yields an empty clean text") {
    // srcA: 4 docs; HEADER in all 4 (boiler at 1/2), "rare" in 1 of 4
    // (below the floor — kept); doc 4 is ONLY the header. srcB: 3 docs,
    // FOOT in all 3 (boiler), each content line in 1 of 3 < 1/2 (kept).
    // Note the floor is INCLUSIVE: a line in exactly half the docs is
    // boilerplate.
    val docs = Seq(
      (1L, "A", "HEADER\ncontent one\nrare"),
      (2L, "A", "HEADER\ncontent two"),
      (3L, "A", "content three\nHEADER"),
      (4L, "A", "HEADER"),
      (5L, "B", "FOOT\nleft"),
      (6L, "B", "right\nFOOT"),
      (7L, "B", "FOOT\nmid")
    ).toDF("doc_id", "source", "text")
    val got = TextAnalysis.stripBoilerplate(docs, "doc_id", "source", "text",
      num = 1, den = 2).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3),
        r.getString(4)))).toMap
    assert(got(1) === ((3L, 2L, "content one\nrare")))
    assert(got(2) === ((2L, 1L, "content two")))
    assert(got(3) === ((2L, 1L, "content three")))
    assert(got(4) === ((1L, 0L, "")))
    assert(got(5) === ((2L, 1L, "left")))
    assert(got(6) === ((2L, 1L, "right")))
    assert(got(7) === ((2L, 1L, "mid")))
  }

  test("stripBoilerplate counts a line once per doc (in-doc repeats don't " +
    "inflate the frequency) and thresholds are per-source") {
    // "dup" repeats 3x inside ONE doc of 4 \u2192 1 of 4 docs < 1/2 \u2192 kept.
    // In source B the same line is in 2 of 3 docs \u2265 1/2 \u2192 boiler there.
    val docs = Seq(
      (1L, "A", "dup\ndup\ndup\nx1"),
      (2L, "A", "x2"), (3L, "A", "x3"), (4L, "A", "x4"),
      (5L, "B", "dup\ny1"), (6L, "B", "dup\ny2"), (7L, "B", "y3")
    ).toDF("doc_id", "source", "text")
    val got = TextAnalysis.stripBoilerplate(docs, "doc_id", "source", "text",
      num = 1, den = 2).collect()
      .map(r => r.getLong(0) -> r.getString(4)).toMap
    assert(got(1) === "dup\ndup\ndup\nx1")
    assert(got(5) === "y1")
    assert(got(6) === "y2")
    assert(got(7) === "y3")
  }
}
