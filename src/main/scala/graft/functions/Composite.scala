package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Delimited-composite parsing (SURVEY.md §1.1/§2.8): the reference's
  * `Col_14` carries pipe-packed records ("10591512|125|23601231|E") that
  * its own pipeline never splits. These are the generic building blocks
  * behind [[graft.plans.FlightsPipeline.parseCol14]], usable on any
  * delimited composite column.
  *
  * Pure narrow expressions — they run at scan speed, survive pushdown and
  * stay inside whole-stage codegen.
  */
object Composite {

  /** The composite's fields as named columns. NULL-safe under ANSI mode:
    * a malformed composite with fewer parts yields NULL for the missing
    * fields via `try_element_at` (the reject-route pattern) — plain
    * `element_at` would kill the job on one bad row. `delim` is taken
    * literally (regex-quoted). */
  def parts(c: Column, delim: String, names: Seq[String]): Seq[Column] = {
    val arr = split(c, java.util.regex.Pattern.quote(delim))
    names.zipWithIndex.map { case (n, i) =>
      try_element_at(arr, lit(i + 1)).as(n)
    }
  }

  /** Python-`zfill` semantics: left-pad with zeros to `width` but NEVER
    * truncate — Spark's `lpad` silently truncates strings longer than
    * `width`, which corrupts long keys (3 of the reference's flight keys
    * exceed 8 chars). */
  def zfill(c: Column, width: Int): Column =
    when(length(c) >= width, c).otherwise(lpad(c, width, "0"))
}
