package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization for URL-keyed corpus dedup. Web crawls carry the
  * same page under many spellings — scheme/host case, explicit default
  * ports, tracking parameters, shuffled query order, fragments — and a
  * byte-level digest treats each as a distinct document. Canonicalizing
  * BEFORE the digest collapses them (the standard first pass of CommonCrawl
  * -style pipelines, ahead of content-level MinHash).
  *
  * Rules (deterministic, order-free, pure string expressions — whole-stage
  * codegen, no UDF, scan-shaped at any scale):
  *   1. scheme and host lowercase (path stays case-sensitive per RFC 3986);
  *   2. explicit default port dropped (`:80` for http, `:443` for https);
  *   3. fragment dropped;
  *   4. `utm_*` tracking parameters dropped;
  *   5. remaining query parameters sorted bytewise; empty query ⇒ no `?`;
  *   6. empty path ⇒ `/`.
  *
  * Non-URL strings (no `scheme://`) canonicalize to NULL — route them to a
  * reject side like Validation's cast guards.
  */
object Urls {

  private val schemeRe = "^([A-Za-z][A-Za-z0-9+.-]*)://"
  private val hostRe = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
  private val pathRe = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
  private val queryRe = "\\?([^#]*)"

  /** The sorted, tracking-free query string ('' when nothing survives). */
  private def canonQuery(url: Column): Column =
    array_join(
      array_sort(filter(split(regexp_extract(url, queryRe, 1), "&"),
        p => !p.startsWith("utm_") && p =!= "")),
      "&")

  /** Lowercased host with the scheme's default port stripped. */
  private def canonHost(url: Column): Column = {
    val scheme = lower(regexp_extract(url, schemeRe, 1))
    val host = lower(regexp_extract(url, hostRe, 1))
    when(scheme === "https" && host.endsWith(":443"),
      host.substr(lit(1), length(host) - 4))
      .when(scheme === "http" && host.endsWith(":80"),
        host.substr(lit(1), length(host) - 3))
      .otherwise(host)
  }

  /** Registered domain = last two dot-labels of the canonical host
    * (`www.news.example.com` → `example.com`) — the key crawl pipelines
    * block/cap on. Two labels is the eTLD+1 approximation for generic
    * TLDs; a full public-suffix list is a data file, not an algorithm
    * change (swap the `-2` slice for a longest-suffix-match join against
    * a broadcast suffix table). NULL for non-URLs, like [[canonicalize]].
    *
    * Kept expression-only so the EQUI-join below stays available: a
    * blocklist applied as `endsWith` scans would be a cartesian test per
    * (row × pattern); extracting the registered domain first turns
    * blocking into a hash anti-join on a single key. */
  def registeredDomain(url: Column): Column = {
    val host = lower(regexp_extract(url, hostRe, 1))
    val noPort = regexp_replace(host, ":[0-9]+$", "")
    val parts = split(noPort, "\\.")
    when(lower(regexp_extract(url, schemeRe, 1)) === "",
      lit(null).cast("string"))
      // single-label hosts (localhost, intranet names) are their own
      // registered domain; slice(-2) on a 1-element array would be empty
      .when(size(parts) < 2, noPort)
      .otherwise(array_join(slice(parts, -2, 2), "."))
  }

  /** Drop rows whose URL's registered domain is on the blocklist — the
    * spam/adult/boilerplate domain filter at the front of corpus assembly.
    * The blocklist rides a broadcast hash anti-join keyed on the extracted
    * domain: O(rows) work, no per-pattern scan, no shuffle of `df`. */
  def domainBlockFilter(df: DataFrame, urlCol: Column,
      blocked: Seq[String]): DataFrame = {
    require(!df.columns.contains("__dom"),
      "column __dom collides with domainBlockFilter internals; rename first")
    val spark = df.sparkSession
    import spark.implicits._
    val bl = blocked.map(_.toLowerCase).toSeq.toDF("__dom")
    df.withColumn("__dom", registeredDomain(urlCol))
      .join(org.apache.spark.sql.functions.broadcast(bl),
        Seq("__dom"), "left_anti")
      .drop("__dom")
  }

  /** `<a href="...">` targets of an HTML column — case-insensitive, so
    * `<A HREF="...">` and mixed-case markup extract too. LIMITATION:
    * double-quoted values only; single-quoted (`href='...'`) and unquoted
    * (`href=...`) attributes are not extracted (real-world crawls are
    * overwhelmingly double-quoted; widening the pattern would need
    * alternation with a different capture group per quote style). */
  val HrefPattern = "(?i)<a[^>]*href=\"([^\"]*)\""

  /** Outlink extraction — raw markup → the edge list the link-graph
    * layer (PageRank q107, k-hop q128, domain blocking q111) consumes.
    * One row per extracted href: `link_no` is the 0-based position among
    * ALL extracted hrefs (assigned BEFORE the absolute-URL filter, so
    * positions are stable however many relative/mailto links are
    * dropped), `url_canon` the canonical form, `domain` the registered
    * domain. Explode-shaped projection — per-row work only, no shuffle;
    * at corpus scale this runs at scan speed and its output feeds a
    * groupBy(domain) or an anti-join directly. */
  def extractLinks(df: DataFrame, idCol: String, htmlCol: String): DataFrame =
    df.select(col(idCol),
        posexplode(regexp_extract_all(col(htmlCol), lit(HrefPattern), lit(1)))
          .as(Seq("link_no", "url")))
      .filter(lower(col("url")).startsWith("http://") ||
        lower(col("url")).startsWith("https://"))
      .select(col(idCol), col("link_no").cast("long").as("link_no"),
        canonicalize(col("url")).as("url_canon"),
        registeredDomain(col("url")).as("domain"))

  /** Canonical form of `url`, NULL when `url` has no `scheme://` prefix. */
  def canonicalize(url: Column): Column = {
    val scheme = lower(regexp_extract(url, schemeRe, 1))
    val path = regexp_extract(url, pathRe, 1)
    val q = canonQuery(url)
    when(scheme === "", lit(null).cast("string"))
      .otherwise(concat(
        scheme, lit("://"), canonHost(url),
        when(path === "", lit("/")).otherwise(path),
        when(q === "", lit("")).otherwise(concat(lit("?"), q))))
  }
}
