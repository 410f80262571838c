package graft.expressions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization for corpus matching keys — NFC, NFKC, and
  * accent stripping (NFD → drop combining marks → NFC) as a native
  * expression.
  *
  * Why it matters at corpus scale: the same user-visible text arrives in
  * multiple byte encodings — "café" as U+00E9 (precomposed) or as
  * `e` + U+0301 (decomposed), full-width vs ASCII digits, ligatures —
  * and every byte-keyed stage downstream (exact dedup, URL keys, line
  * dedup, MinHash shingles) silently treats them as distinct documents.
  * Normalizing once at ingest collapses the variants; Spark has no
  * built-in normalizer (the reference's pandas `.str` surface has none
  * either — this is part of the §2.14 LLM-pipeline extension layer).
  *
  * The accent-strip mode matches DuckDB's `strip_accents` (both
  * decompose canonically, drop the Unicode Mn category, recompose) on
  * the Latin range the fixtures pin; parity for exotic scripts depends
  * on the two engines' Unicode table versions and is NOT contracted.
  *
  * ASCII fast path: normalization is a no-op on pure-ASCII strings, so
  * the expression returns the input UTF8String unchanged (zero copy)
  * after a vectorizable byte scan — on mostly-English corpora the
  * Normalizer round-trip (UTF8String → String → ICU-style tables →
  * UTF8String) is skipped for almost every row.
  */
case class UnicodeNormalize(child: Expression, mode: Int)
    extends UnaryExpression {
  require(UnicodeNormalize.Nfc <= mode && mode <= UnicodeNormalize.Strip,
    s"unknown normalization mode $mode")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string column, got $t")
  }

  override def dataType: DataType = StringType

  override def prettyName: String = mode match {
    case UnicodeNormalize.Nfc => "graft_nfc"
    case UnicodeNormalize.Nfkc => "graft_nfkc"
    case _ => "graft_strip_accents"
  }

  /** Public so generated code can call it through the captured reference. */
  def norm(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    var i = 0
    var ascii = true
    while (ascii && i < bytes.length) { ascii = bytes(i) >= 0; i += 1 }
    if (ascii) s
    else {
      val str = s.toString
      val out = mode match {
        case UnicodeNormalize.Nfc =>
          Normalizer.normalize(str, Normalizer.Form.NFC)
        case UnicodeNormalize.Nfkc =>
          Normalizer.normalize(str, Normalizer.Form.NFKC)
        case _ =>
          val decomposed = Normalizer.normalize(str, Normalizer.Form.NFD)
          val sb = new java.lang.StringBuilder(decomposed.length)
          var j = 0
          while (j < decomposed.length) {
            val c = decomposed.charAt(j)
            if (Character.getType(c) != Character.NON_SPACING_MARK) sb.append(c)
            j += 1
          }
          Normalizer.normalize(sb.toString, Normalizer.Form.NFC)
      }
      UTF8String.fromString(out)
    }
  }

  override protected def nullSafeEval(input: Any): Any =
    norm(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftNorm", this,
      classOf[UnicodeNormalize].getName)
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $ref.norm($s);")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : UnicodeNormalize = copy(child = newChild)
}

object UnicodeNormalize {
  val Nfc = 1
  val Nfkc = 2
  val Strip = 3
}
