package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Validation / scalar-function family (SURVEY.md §2.8 F1–F8), after the
  * reference's notebook /root/reference/Seccion_2_Python/
  * ETL_Prueba_Tecnica.ipynb:79 (email regex) and :100 (phone rules).
  *
  * The reference implements these as row-at-a-time Python lambdas; here they
  * are pure Catalyst column expressions (`rlike`, `when`, `length`), so they
  * stay inside whole-stage codegen — no UDF, no serialization boundary, and
  * they remain DuckDB-oracle-comparable because every primitive has an exact
  * ANSI-SQL equivalent.
  */
object Validation {

  /** F3: the reference's email regex, verbatim. Python `re.match` anchors at
    * the start and the pattern ends in `$`, so full-match ≡ rlike with both
    * anchors (pattern uses only char classes + quantifiers — identical
    * semantics in Java and RE2/DuckDB). */
  val EmailRegex = "^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}$"

  def emailValid(c: Column): Column = c.rlike(EmailRegex)

  /** Character class reproducing Python's unicode-aware whitespace (`\s` in
    * `re`, `str.strip()`): ASCII whitespace plus the \x1c–\x1f separators,
    * NEL, NBSP and the unicode space block. Java's `\s` is ASCII-only and
    * Spark's `trim` strips EVERY char ≤ 0x20 (including control chars like
    * \x02 that Python keeps) — both would silently diverge from the
    * reference on dirty cells (measured: 3 rows of the flights union carry a
    * trailing \x02 that the golden export preserves). */
  private val PyWs =
    "[\\s\\u001c-\\u001f\\u0085\\u00a0\\u1680\\u2000-\\u200a\\u2028\\u2029\\u202f\\u205f\\u3000]"

  /** Python-`str.strip()`-equivalent: removes leading/trailing whitespace
    * only — control characters survive, exactly as in the reference. */
  def pyStrip(c: Column): Column =
    regexp_replace(c, s"^$PyWs+|$PyWs+$$", "")

  /** F4: strip `+`, `-` and (unicode) whitespace before phone
    * classification — the reference's `r'[+\-\s]'` with Python `\s`
    * semantics. */
  def cleanPhone(c: Column): Column = regexp_replace(c, s"[+\\-]|$PyWs", "")

  /** F5: the reference's Colombian phone rules as a when-chain, in the
    * notebook's exact rule order (all-digits gate first; empty string fails
    * the gate, matching Python `"".isdigit() == False`). */
  def classifyPhone(cleaned: Column): Column =
    when(!cleaned.rlike("^[0-9]+$"), lit("No Apto"))
      .when(length(cleaned) === 10 && cleaned.startsWith("3"), lit("Apto - Celular"))
      .when(length(cleaned) === 10 && cleaned.startsWith("601"), lit("Apto - Fijo"))
      .otherwise(lit("No Apto"))

  /** F7: text→number cast with error default (Power Query "replace errors
    * with 0"). ANSI-safe: try_cast yields NULL on bad input, never throws. */
  def castWithDefault(c: Column, default: Double): Column =
    coalesce(c.try_cast("double"), lit(default))

  /** F1/F2: normalize a padded string cell: cast to string, Python-strip
    * (NOT Spark `trim` — see [[pyStrip]]). */
  def normalize(c: Column): Column = pyStrip(c.cast("string"))

  /** Luhn checksum validity of a digits-only string — the check that
    * separates a real payment-card number from an arbitrary 16-digit run,
    * which is what keeps a card-number redactor's false-positive rate on
    * phone numbers / order ids tolerable. Pure array HOFs over the
    * reversed digit string (integer arithmetic only — exact in any
    * engine); false for anything outside 13–19 digits or containing a
    * non-digit. */
  def luhnValid(digits: Column): Column = {
    val rev = reverse(digits)
    val contrib = transform(sequence(lit(1), length(rev)), i => {
      val dig = rev.substr(i, lit(1)).cast("int")
      val doubled = dig * 2
      when(i % 2 === 0, when(doubled > 9, doubled - 9).otherwise(doubled))
        .otherwise(dig)
    })
    digits.rlike("^[0-9]{13,19}$") &&
      pmod(aggregate(contrib, lit(0), (acc, x) => acc + x), lit(10)) === 0
  }
}
