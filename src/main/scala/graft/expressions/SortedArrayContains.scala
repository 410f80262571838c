package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, LongType}

/** Membership test against a SORTED `array<bigint>` by binary search —
  * O(log n) per row where `array_contains` scans O(n).
  *
  * Why it exists: the broadcast-set prune pattern (bloom bit arrays,
  * digest allowlists) evaluates "is this row's hash in the broadcast
  * set?" once per corpus row per hash. With a million-entry set,
  * `array_contains`'s linear scan turns a scan-speed projection into a
  * per-row million-op loop; binary search keeps it ~20 ops. Correctness
  * is identical to `array_contains` PROVIDED the array is sorted
  * ascending and null-free — the caller owns that invariant (the
  * Sketches builders emit `sort_array(collect_list(...))`, which
  * guarantees it); on an unsorted array the result is undefined, same
  * contract as `java.util.Arrays.binarySearch`.
  */
case class SortedArrayContains(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), LongType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_sorted_contains expects (array<bigint>, bigint), got ($l, $r)")
    }

  override def dataType: DataType = BooleanType

  override def prettyName: String = "graft_sorted_contains"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val v = b.asInstanceOf[Long]
    var lo = 0
    var hi = arr.numElements() - 1
    var found = false
    while (!found && lo <= hi) {
      val mid = (lo + hi) >>> 1
      val mv = arr.getLong(mid)
      if (mv == v) found = true
      else if (mv < v) lo = mid + 1
      else hi = mid - 1
    }
    found
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val lo = ctx.freshName("lo")
      val hi = ctx.freshName("hi")
      val mid = ctx.freshName("mid")
      val mv = ctx.freshName("mv")
      val found = ctx.freshName("found")
      s"""
         |int $lo = 0;
         |int $hi = $a.numElements() - 1;
         |boolean $found = false;
         |while (!$found && $lo <= $hi) {
         |  int $mid = ($lo + $hi) >>> 1;
         |  long $mv = $a.getLong($mid);
         |  if ($mv == $b) { $found = true; }
         |  else if ($mv < $b) { $lo = $mid + 1; }
         |  else { $hi = $mid - 1; }
         |}
         |${ev.value} = $found;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedArrayContains =
    copy(left = newLeft, right = newRight)
}
