package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Row-local MinHash signature of a shingle ARRAY: `numHashes` minima of
  * the universal family `h_i(x) = (a_i·base(x) + b_i) mod P` over the
  * array elements, with `base(x) = xxhash64(x) mod P` — bit-identical to
  * the explode + groupBy(`min` × numHashes) pipeline
  * (graft.operators.NearDup.minhashSignatures) on the same shingle set.
  *
  * Why a custom expression: the aggregate formulation EXPLODES one row
  * per (doc, shingle) and SHUFFLES doc-keyed partial signatures — the
  * signature of a 100 TB corpus pays a corpus-sized exchange even though
  * the result is one row per document and every input shingle lives in
  * the document's own row. This expression folds the whole signature
  * inside the projection: O(shingles × numHashes) integer ops per row,
  * zero exchange, whole-stage codegen. Banding the result
  * (NearDup.minHashLshRowLocal) keeps the only shuffle of the LSH
  * pipeline at the (id, band, bucket) rows.
  *
  * The aggregate spelling remains the right tool when shingle postings
  * are ALREADY materialized for other consumers (the staged q27/q28/q40
  * pipeline reuses one postings table across signature/verify/exact
  * paths); this is the dedicated-signature-job fast path.
  *
  * Null elements are skipped; an array with no usable element (empty, or
  * all null) yields a NULL signature — such a document has no shingle
  * set and never reaches the aggregate formulation either (no rows).
  * Arithmetic: base hash < P < 2^31 and a_i < P keep a_i·base + b_i
  * under 2^62 — no overflow under ANSI mode; `Math.floorMod` is `pmod`.
  */
case class MinHashSignature(child: Expression, numHashes: Int, seed: Long)
    extends UnaryExpression {
  require(numHashes >= 1 && numHashes <= 512,
    "numHashes must be in [1, 512]")

  private val P = 2147483647L

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash expects array<string>, got $t")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"
  // an empty / all-null shingle array yields NULL even from a non-null
  // child, so nullability must not be inherited (a non-nullable child
  // would pin ev.isNull to a constant and the empty-array branch could
  // not generate)
  override def nullable: Boolean = true

  private lazy val coefA: Array[Long] =
    graft.operators.NearDup.hashCoefficients(seed, numHashes)
      .map(_._1).toArray
  private lazy val coefB: Array[Long] =
    graft.operators.NearDup.hashCoefficients(seed, numHashes)
      .map(_._2).toArray

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = Array.fill(numHashes)(P)
    var any = false
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        any = true
        val h = Math.floorMod(
          XXH64.hashUTF8String(arr.getUTF8String(i), 42L), P)
        var j = 0
        while (j < numHashes) {
          val v = Math.floorMod(h * coefA(j) + coefB(j), P)
          if (v < out(j)) out(j) = v
          j += 1
        }
      }
      i += 1
    }
    if (!any) null else UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val a = ctx.addReferenceObj("minhashA", coefA, "long[]")
      val b = ctx.addReferenceObj("minhashB", coefB, "long[]")
      val out = ctx.freshName("out")
      val any = ctx.freshName("any")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      val uad = classOf[UnsafeArrayData].getName
      val xxh = classOf[XXH64].getName
      s"""
         |int $n = $arr.numElements();
         |long[] $out = new long[$numHashes];
         |java.util.Arrays.fill($out, ${P}L);
         |boolean $any = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$arr.isNullAt($i)) {
         |    $any = true;
         |    long $h = Math.floorMod(
         |      $xxh.hashUTF8String($arr.getUTF8String($i), 42L), ${P}L);
         |    for (int $j = 0; $j < $numHashes; $j++) {
         |      long $v = Math.floorMod($h * $a[$j] + $b[$j], ${P}L);
         |      if ($v < $out[$j]) $out[$j] = $v;
         |    }
         |  }
         |}
         |if (!$any) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $uad.fromPrimitiveArray($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression)
      : MinHashSignature = copy(child = newChild)
}
