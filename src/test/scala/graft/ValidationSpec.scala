package graft

import org.apache.spark.sql.functions._

import graft.functions.Validation

/** Unit tests for the validation family against the measured invalid
  * inventory from the reference data (SURVEY.md §7.4 watch-item 4):
  * `NO TIENE`, `NOTIENE@.COM`, embedded spaces, doubled addresses,
  * scientific-notation phones. */
class ValidationSpec extends SparkSpec {
  import sqlImplicits._

  private def emailVerdicts(emails: Seq[String]): Map[String, Boolean] =
    emails.toDF("e")
      .select(col("e"), Validation.emailValid(col("e")).as("v"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap

  test("F3: email regex accepts the valid shapes") {
    val v = emailVerdicts(Seq(
      "user@example.com", "first.last@sub.domain.org", "a+tag@x.co",
      "UPPER@CASE.COM", "num123%x_y-z@h-o.st.io"))
    assert(v.values.forall(identity), v)
  }

  test("F3: email regex rejects the reference's measured invalid inventory") {
    val v = emailVerdicts(Seq(
      "NO TIENE",            // placeholder with embedded space
      "NA",                  // placeholder
      "NOTIENE@.COM",        // empty domain before the TLD dot
      "user@@double.com",    // doubled @
      "user@domain",         // no TLD
      "user name@domain.com", // embedded space in local part
      "a@b@c.com",           // two @s
      ""))                   // empty
    assert(!v.values.exists(identity), v)
  }

  test("F4: cleanPhone strips +, -, and whitespace only") {
    val got = Seq("+57-300 123 4567", "3-001234567", " 601 2345678 ", "3,14E+09")
      .toDF("p").select(Validation.cleanPhone(col("p")).as("c"))
      .collect().map(_.getString(0)).toSeq
    assert(got === Seq("573001234567", "3001234567", "6012345678", "3,14E09"))
  }

  test("F5: phone rules match the notebook's classifier semantics") {
    val cases = Seq(
      "3001234567" -> "Apto - Celular",  // 10 digits, starts 3
      "6012345678" -> "Apto - Fijo",     // 10 digits, starts 601
      "6091234567" -> "No Apto",         // 10 digits, starts 6 but not 601
      "30012345"   -> "No Apto",         // too short
      "300123456789" -> "No Apto",       // too long
      "3,14E09"    -> "No Apto",         // scientific-notation residue: non-digit
      ""           -> "No Apto")         // empty fails the all-digits gate
    val got = cases.map(_._1).toDF("p")
      .select(col("p"), Validation.classifyPhone(col("p")).as("s"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    cases.foreach { case (in, want) => assert(got(in) === want, s"input '$in'") }
  }

  test("pyStrip removes unicode whitespace but preserves control chars") {
    val got = Seq("  x  ", "a", " b ", "c")
      .toDF("s").select(Validation.pyStrip(col("s")).as("t"))
      .collect().map(_.getString(0)).toSeq
    assert(got === Seq("x", "a", "b", "c"))
  }

  test("F7: castWithDefault parses numbers and defaults errors") {
    val got = Seq("3.5", "998E", "", "-2", "nan")
      .toDF("s").select(Validation.castWithDefault(col("s"), 0.0).as("d"))
      .collect().map(_.getDouble(0)).toSeq
    // note: "nan" parses to Double.NaN via try_cast — it is a parseable
    // literal, not an error (matches pandas to_numeric behaviour)
    assert(got(0) === 3.5 && got(1) === 0.0 && got(2) === 0.0 && got(3) === -2.0)
    assert(got(4).isNaN)
  }

  test("F1/F2: normalize strips the reference's 200-char padding shape") {
    val padded = "MAIL@DOMAIN.COM" + (" " * 200)
    val got = Seq(padded).toDF("s")
      .select(Validation.normalize(col("s")).as("t")).head().getString(0)
    assert(got === "MAIL@DOMAIN.COM")
  }

  test("luhnValid accepts the standard public test card numbers only") {
    // widely-published network TEST numbers (not real cards)
    val cases = Seq(
      "4111111111111111" -> true,   // Visa test
      "5500005555555559" -> true,   // Mastercard test
      "378282246310005" -> true,    // Amex test (15 digits)
      "4111111111111112" -> false,  // checksum off by one
      "1234567890123456" -> false,
      "41111111"          -> false, // too short
      "4111-1111-1111-1111" -> false) // non-digit chars: reject, don't clean
    val got = cases.map(_._1).toDF("cc")
      .select(col("cc"), Validation.luhnValid(col("cc")).as("v"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    cases.foreach { case (cc, want) => assert(got(cc) == want, cc) }
  }
}
