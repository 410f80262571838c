package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{TextAnalysis, Urls}

/** Wave 6f \u2014 ingest-side text cleaning: per-source boilerplate line
  * removal, HTML/markup \u2192 text extraction, and Unicode match-key
  * normalization (the native [[graft.expressions.UnicodeNormalize]]
  * expression). These run BEFORE every dedup/quality stage in a corpus
  * pipeline \u2014 un-normalized variants and boilerplate lines are the two
  * classic ways "different" bytes hide identical content.
  *
  * Same conventions as every wave: identical column aliases and ORDER BY
  * in Spark and DuckDB, rational thresholds as exact integer compares,
  * regex spellings RE2-compatible so both engines replay them
  * byte-for-byte.
  */
object CleaningQueries {

  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  /** q146 fixture: documents dressed with per-source page furniture \u2014 a
    * header and a copyright footer on every doc (100% of the source), a
    * subscribe line on every 3rd doc (~33% \u2014 above the 25% boilerplate
    * floor), a promo line on every 9th (~11% \u2014 below it, must survive).
    * The original text is the unique content line. */
  private def linesFixture(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("source"),
      concat(lit("HEADER "), col("source"), lit("\n"), col("text"),
        when(col("doc_id") % 3 === 0,
          concat(lit("\nSubscribe to "), col("source"), lit(" newsletter")))
          .otherwise(lit("")),
        when(col("doc_id") % 9 === 0, lit("\nPromo of the day"))
          .otherwise(lit("")),
        lit("\n(c) "), col("source")).as("text"))

  private val linesFixtureSql =
    """SELECT doc_id, source,
      |  'HEADER ' || source || chr(10) || text ||
      |  CASE WHEN doc_id % 3 = 0
      |    THEN chr(10) || 'Subscribe to ' || source || ' newsletter'
      |    ELSE '' END ||
      |  CASE WHEN doc_id % 9 = 0
      |    THEN chr(10) || 'Promo of the day' ELSE '' END ||
      |  chr(10) || '(c) ' || source AS text
      |FROM documents""".stripMargin

  /** q147 fixture: the corpus wrapped in page markup \u2014 head/style block,
    * entity-bearing heading, the real text in a paragraph, a tracking
    * script on every 4th doc, an entity-and-suffix tail paragraph. */
  private def htmlFixture(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      concat(lit("<html><head><title>Doc "), col("doc_id").cast("string"),
        lit("</title><style>.x{color:red}</style></head><body><h1>Q&amp;A &#39;"),
        col("source"), lit("&#39;</h1><p>"), col("text"), lit("</p>"),
        when(col("doc_id") % 4 === 0,
          concat(lit("<script type=\"t\">track("), col("doc_id").cast("string"),
            lit(");</script>"))).otherwise(lit("")),
        lit("<p>tail&nbsp;"), (col("doc_id") % 11).cast("string"),
        lit("&gt;end</p></body></html>")).as("html"))

  private val htmlFixtureSql =
    """SELECT doc_id,
      |  '<html><head><title>Doc ' || doc_id::VARCHAR ||
      |  '</title><style>.x{color:red}</style></head><body><h1>Q&amp;A &#39;' ||
      |  source || '&#39;</h1><p>' || text || '</p>' ||
      |  CASE WHEN doc_id % 4 = 0
      |    THEN '<script type="t">track(' || doc_id::VARCHAR || ');</script>'
      |    ELSE '' END ||
      |  '<p>tail&nbsp;' || (doc_id % 11)::VARCHAR || '&gt;end</p></body></html>'
      |    AS html
      |FROM documents""".stripMargin

  /** q148 fixture: five spellings of the same phrases \u2014 precomposed,
    * decomposed (combining acute), uppercase, plain ASCII \u2014 salted with
    * doc_id mod 7 so the collapse produces many small groups instead of
    * one giant one. */
  private def unicodeVariant(docId: Column): Column = {
    val salt = (docId % 7).cast("string")
    when(docId % 5 === 0, concat(lit("Caf\u00e9 au lait "), salt))
      .when(docId % 5 === 1, concat(lit("Cafe\u0301 au lait "), salt))
      .when(docId % 5 === 2, concat(lit("CAF\u00c9 AU LAIT "), salt))
      .when(docId % 5 === 3, concat(lit("cafe au lait "), salt))
      .otherwise(concat(lit("Touch\u00e9 se\u00f1or "), salt))
  }

  /** q150 fixture: pages with a canonical-form-noisy absolute link on
    * every doc, a second host on evens, a relative link on every 3rd and
    * a mailto on every 5th (both non-absolute — extracted, then dropped
    * with their positions preserved). */
  private def linkHtmlFixture(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), concat(
      lit("<p>x</p><a href=\"https://Site"), (col("doc_id") % 19).cast("string"),
      lit(".Example.COM/p/"), (col("doc_id") % 23).cast("string"),
      lit("?utm_source=x&b=2&a=1\">t</a>"),
      when(col("doc_id") % 2 === 0,
        concat(lit("<a class=\"n\" href=\"http://news.example"),
          (col("doc_id") % 7).cast("string"), lit(".org/a\">n</a>")))
        .otherwise(lit("")),
      when(col("doc_id") % 3 === 0, lit("<a href=\"/relative/p\">r</a>"))
        .otherwise(lit("")),
      when(col("doc_id") % 5 === 0, lit("<a href=\"mailto:x@y.z\">m</a>"))
        .otherwise(lit("")),
      // uppercase tag + scheme: exercises the case-insensitive pattern
      when(col("doc_id") % 4 === 0,
        concat(lit("<A HREF=\"HTTPS://Caps.Example"),
          (col("doc_id") % 11).cast("string"), lit(".NET/Q\">c</A>")))
        .otherwise(lit(""))).as("html"))

  private val linkHtmlFixtureSql =
    """SELECT doc_id,
      |  '<p>x</p><a href="https://Site' || (doc_id % 19)::VARCHAR ||
      |  '.Example.COM/p/' || (doc_id % 23)::VARCHAR ||
      |  '?utm_source=x&b=2&a=1">t</a>' ||
      |  CASE WHEN doc_id % 2 = 0
      |    THEN '<a class="n" href="http://news.example' ||
      |         (doc_id % 7)::VARCHAR || '.org/a">n</a>'
      |    ELSE '' END ||
      |  CASE WHEN doc_id % 3 = 0
      |    THEN '<a href="/relative/p">r</a>' ELSE '' END ||
      |  CASE WHEN doc_id % 5 = 0
      |    THEN '<a href="mailto:x@y.z">m</a>' ELSE '' END ||
      |  CASE WHEN doc_id % 4 = 0
      |    THEN '<A HREF="HTTPS://Caps.Example' ||
      |         (doc_id % 11)::VARCHAR || '.NET/Q">c</A>'
      |    ELSE '' END AS html
      |FROM documents""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Outlink extraction: markup → canonical edge list (the input the
    // link-graph layer consumes). Explode-shaped projection, stable
    // link positions, relative/mailto links dropped after extraction.
    "q150_link_extract" -> ((s, dir) =>
      Urls.extractLinks(linkHtmlFixture(t(s, dir, "documents")),
        "doc_id", "html")
        .orderBy(col("doc_id"), col("link_no"))),

    // Per-source boilerplate line removal: lines in >= 1/4 of a source's
    // docs vanish (header, footer, subscribe), rarer lines survive
    // (promo, content). Count pass shuffles (source, line) once; the
    // boilerplate set broadcasts and the filter is row-local \u2014 the corpus
    // is never exploded back and re-grouped.
    "q146_boilerplate" -> ((s, dir) =>
      TextAnalysis.stripBoilerplate(
        linesFixture(t(s, dir, "documents")), "doc_id", "source", "text",
        num = 1, den = 4)
        .withColumnRenamed("id", "doc_id")
        .orderBy(col("doc_id"))),

    // Markup -> text extraction at scan speed: script/style blocks die
    // with their content, tags become spaces, the five running-text
    // entities decode, whitespace collapses. Pure projection.
    "q147_markup_strip" -> ((s, dir) =>
      htmlFixture(t(s, dir, "documents"))
        .select(col("doc_id"),
          length(col("html")).cast("long").as("n_raw"),
          TextAnalysis.stripMarkup(col("html")).as("text_clean"))
        .withColumn("n_clean", length(col("text_clean")).cast("long"))
        .orderBy(col("doc_id"))),

    // Unicode match keys: NFC + lower + accent-strip collapses the four
    // Latin spellings to one key (native UnicodeNormalize expression,
    // ASCII rows zero-copy). n_same counts the collapsed group sizes \u2014
    // the dedup win normalization buys.
    "q148_unicode_key" -> ((s, dir) => {
      val v = t(s, dir, "documents")
        .select(col("doc_id"),
          unicodeVariant(col("doc_id")).as("variant"))
      v.select(col("doc_id"),
        length(col("variant")).cast("long").as("n_raw"),
        length(TextAnalysis.nfc(col("variant"))).cast("long").as("n_nfc"),
        TextAnalysis.matchKey(col("variant")).as("key"))
        .withColumn("n_same",
          count(lit(1)).over(Window.partitionBy(col("key"))))
        .orderBy(col("doc_id"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q150_link_extract" ->
      (s"""WITH fx AS ($linkHtmlFixtureSql),
        |raw AS (
        |  SELECT doc_id,
        |    regexp_extract_all(html, '(?i)<a[^>]*href="([^"]*)"', 1) AS ls
        |  FROM fx),
        |l AS (
        |  SELECT doc_id, i.i - 1 AS link_no, ls[i.i] AS url
        |  FROM raw, generate_series(1, 8) AS i(i) WHERE i.i <= len(ls)),
        |f AS (
        |  SELECT doc_id, link_no, url FROM l
        |  WHERE starts_with(lower(url), 'http://')
        |     OR starts_with(lower(url), 'https://')),
        |c AS (
        |  SELECT doc_id, link_no,
        |    lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))
        |      || '://' ||
        |    lower(regexp_extract(url,
        |      '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1))
        |      ||
        |    CASE WHEN regexp_extract(url,
        |        '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) = ''
        |      THEN '/' ELSE regexp_extract(url,
        |        '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) END
        |      ||
        |    CASE WHEN coalesce(array_to_string(list_sort(list_filter(
        |        string_split(regexp_extract(url, '\\?([^#]*)', 1), '&'),
        |        p -> NOT starts_with(p, 'utm_') AND p <> '')), '&'), '') = ''
        |      THEN ''
        |      ELSE '?' || array_to_string(list_sort(list_filter(
        |        string_split(regexp_extract(url, '\\?([^#]*)', 1), '&'),
        |        p -> NOT starts_with(p, 'utm_') AND p <> '')), '&') END
        |      AS url_canon,
        |    array_to_string(
        |      string_split(regexp_replace(lower(regexp_extract(url,
        |        '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)),
        |        ':[0-9]+$$', ''), '.')[-2:], '.') AS domain
        |  FROM f)
        |SELECT doc_id, CAST(link_no AS BIGINT) AS link_no, url_canon, domain
        |FROM c ORDER BY doc_id, link_no""").stripMargin,

    "q146_boilerplate" ->
      (s"""WITH fx AS ($linesFixtureSql),
        |tot AS (SELECT source, count(*) AS tot FROM fx GROUP BY source),
        |l AS (SELECT source,
        |        unnest(list_distinct(string_split(text, chr(10)))) AS line
        |      FROM fx),
        |cnt AS (SELECT source, line, count(*) AS n_docs
        |        FROM l GROUP BY source, line),
        |b AS (SELECT source, list(line) AS bl
        |      FROM cnt JOIN tot USING (source)
        |      WHERE n_docs * 4 >= tot * 1 GROUP BY source),
        |sp AS (SELECT doc_id, f.source,
        |         string_split(f.text, chr(10)) AS ls, b.bl
        |       FROM fx f LEFT JOIN b USING (source))
        |SELECT doc_id, source, CAST(len(ls) AS BIGINT) AS n_lines,
        |  CAST(len(list_filter(ls,
        |    x -> NOT coalesce(list_contains(bl, x), false))) AS BIGINT)
        |    AS n_kept,
        |  array_to_string(list_filter(ls,
        |    x -> NOT coalesce(list_contains(bl, x), false)), chr(10))
        |    AS text_clean
        |FROM sp ORDER BY doc_id""").stripMargin,

    "q147_markup_strip" ->
      (s"""WITH fx AS ($htmlFixtureSql),
        |c1 AS (SELECT doc_id, html,
        |  regexp_replace(regexp_replace(html,
        |    '<script[^>]*>.*?</script>|<style[^>]*>.*?</style>', ' ', 'g'),
        |    '<[^>]+>', ' ', 'g') AS s
        |FROM fx),
        |c2 AS (SELECT doc_id, html,
        |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |    regexp_replace(s, '&nbsp;', ' ', 'g'), '&amp;', '&', 'g'),
        |    '&lt;', '<', 'g'), '&gt;', '>', 'g'), '&#39;', chr(39), 'g') AS s
        |FROM c1),
        |c3 AS (SELECT doc_id, html,
        |  trim(regexp_replace(s, '\\s+', ' ', 'g')) AS text_clean
        |FROM c2)
        |SELECT doc_id, CAST(length(html) AS BIGINT) AS n_raw, text_clean,
        |  CAST(length(text_clean) AS BIGINT) AS n_clean
        |FROM c3 ORDER BY doc_id""").stripMargin,

    "q148_unicode_key" ->
      """WITH v AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 5 = 0
        |           THEN 'Caf\u00e9 au lait ' || (doc_id % 7)::VARCHAR
        |         WHEN doc_id % 5 = 1
        |           THEN 'Cafe' || chr(769) || ' au lait ' ||
        |                (doc_id % 7)::VARCHAR
        |         WHEN doc_id % 5 = 2
        |           THEN 'CAF\u00c9 AU LAIT ' || (doc_id % 7)::VARCHAR
        |         WHEN doc_id % 5 = 3
        |           THEN 'cafe au lait ' || (doc_id % 7)::VARCHAR
        |         ELSE 'Touch\u00e9 se\u00f1or ' || (doc_id % 7)::VARCHAR END AS variant
        |  FROM documents)
        |SELECT doc_id, CAST(length(variant) AS BIGINT) AS n_raw,
        |  CAST(length(nfc_normalize(variant)) AS BIGINT) AS n_nfc,
        |  strip_accents(lower(nfc_normalize(variant))) AS key,
        |  CAST(count(*) OVER (PARTITION BY
        |    strip_accents(lower(nfc_normalize(variant)))) AS BIGINT)
        |    AS n_same
        |FROM v ORDER BY doc_id""".stripMargin
  )
}
