package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.{ColumnNodeToExpressionConverter, ExpressionUtils}

/** Bridge between the Column DSL and raw Catalyst expressions, so library
  * functions written once against `org.apache.spark.sql.functions` can also
  * be registered as SQL functions (graft.expressions.GraftFunctions) with no
  * second implementation.
  *
  * Lives under `org.apache.spark.sql` because the converter Spark 4 itself
  * uses to back the classic Column API (`ExpressionUtils`, spark source
  * sql/core/src/main/scala/org/apache/spark/sql/classic/columnNodeSupport
  * .scala) is `private[sql]` — this is the conventional shim-package access
  * used across the Spark library ecosystem, touching only public-repo Spark
  * internals that are stable across the 4.x line.
  */
object ColumnBridge {
  /** Eager node→expression conversion. `ExpressionUtils.expression` wraps
    * non-trivial Column trees in a LAZY `ColumnNodeExpression`, which is
    * only unwrapped on the classic Dataset path — returned from an
    * injected SQL function builder it reaches codegen still wrapped and
    * Spark throws INTERNAL_ERROR. The converter object is what the
    * analyzer itself applies: it recursively rewrites the whole node tree
    * into real Catalyst expressions (UnresolvedFunction / lambda nodes
    * included), which the analyzer then resolves to fixpoint exactly as it
    * would the hand-written SQL. */
  def toExpression(c: Column): Expression = ColumnNodeToExpressionConverter(c.node)
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)

  /** Lift a Column-DSL function into an injectable SQL function builder
    * (`SparkSessionExtensions.injectFunction`). The resulting tree still
    * contains unresolved functions; Spark's analyzer resolves it exactly as
    * it would the equivalent hand-written SQL. */
  def builder(arity: Int, name: String)(
      f: Seq[Column] => Column): Seq[Expression] => Expression =
    children => {
      require(children.size == arity,
        s"$name requires exactly $arity argument(s), got ${children.size}")
      toExpression(f(children.map(toColumn)))
    }
}
