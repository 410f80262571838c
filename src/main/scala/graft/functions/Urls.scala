package graft.functions

import org.apache.spark.sql.Column
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
