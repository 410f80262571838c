package graft.expressions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Fused cosine similarity of two `array<double>` columns in ONE array
  * pass.
  *
  * The composed form `graft_dot(a,b) / (sqrt(graft_dot(a,a)) *
  * sqrt(graft_dot(b,b)))` traverses the arrays THREE times (and the two
  * norms are recomputed for every candidate pair in a similarity scan).
  * This expression keeps the three accumulators in one tight codegen'd
  * loop — for the broadcast one-pass similarity scans (bruteForceTopK,
  * cosine pair mining) the array traffic drops 3× on the hot path.
  *
  * Bit-compatibility is the contract: each accumulator is the same
  * sequential left-to-right float64 sum as [[DotProduct]], and the final
  * combination `s_ab / (sqrt(s_aa) * sqrt(s_bb))` is the identical
  * operation tree the composed form (and the DuckDB oracle's
  * `list_dot_product` formulation) evaluates — so fusing changes the
  * plan, never a bit of the result — with ONE deliberate exception:
  * zero-norm inputs. Under ANSI mode (Spark 4's default) the composed
  * form's `/` THROWS DIVIDE_BY_ZERO on a zero norm; this expression
  * follows IEEE (NaN) instead, because an all-zeros embedding is data —
  * a padding row or a failed encoder — and must not kill a corpus-wide
  * scan. Unequal lengths use the common prefix for s_ab while each norm
  * still spans its own full array, matching the composed form. */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_cosine expects (array<double>, array<double>), got ($l, $r)")
    }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_cosine"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    val n = math.min(nx, ny)
    var sab = 0.0
    var saa = 0.0
    var sbb = 0.0
    var i = 0
    while (i < n) {
      val xv = if (x.isNullAt(i)) 0.0 else x.getDouble(i)
      val yv = if (y.isNullAt(i)) 0.0 else y.getDouble(i)
      sab += xv * yv; saa += xv * xv; sbb += yv * yv
      i += 1
    }
    // norms span their own full arrays (the composed form's graft_dot(a,a)
    // does), so finish the longer side's tail
    while (i < nx) { val v = if (x.isNullAt(i)) 0.0 else x.getDouble(i); saa += v * v; i += 1 }
    var j = n
    while (j < ny) { val v = if (y.isNullAt(j)) 0.0 else y.getDouble(j); sbb += v * v; j += 1 }
    sab / (math.sqrt(saa) * math.sqrt(sbb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val n = ctx.freshName("n")
      val sab = ctx.freshName("sab")
      val saa = ctx.freshName("saa")
      val sbb = ctx.freshName("sbb")
      val j = ctx.freshName("j")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $nx = $a.numElements();
         |int $ny = $b.numElements();
         |int $n = java.lang.Math.min($nx, $ny);
         |double $sab = 0.0; double $saa = 0.0; double $sbb = 0.0;
         |int $i = 0;
         |for (; $i < $n; $i++) {
         |  double $xv = $a.isNullAt($i) ? 0.0 : $a.getDouble($i);
         |  double $yv = $b.isNullAt($i) ? 0.0 : $b.getDouble($i);
         |  $sab += $xv * $yv; $saa += $xv * $xv; $sbb += $yv * $yv;
         |}
         |for (; $i < $nx; $i++) {
         |  double $xv = $a.isNullAt($i) ? 0.0 : $a.getDouble($i);
         |  $saa += $xv * $xv;
         |}
         |for (int $j = $n; $j < $ny; $j++) {
         |  double $yv = $b.isNullAt($j) ? 0.0 : $b.getDouble($j);
         |  $sbb += $yv * $yv;
         |}
         |${ev.value} = $sab / (java.lang.Math.sqrt($saa) * java.lang.Math.sqrt($sbb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

object CosineSimFunction {
  val entry: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_cosine"),
    new ExpressionInfo(classOf[CosineSim].getName, "graft_cosine"),
    (children: Seq[Expression]) => {
      require(children.size == 2,
        s"graft_cosine requires exactly 2 arguments, got ${children.size}")
      CosineSim(children(0), children(1))
    })
}
