package graft.expressions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}
import org.apache.spark.sql.SparkSessionExtensions

/** Native Catalyst expression for the float64 dot product of two
  * `array<double>` columns.
  *
  * Why a custom expression (the one place SURVEY.md §7.3 reserved for it):
  * the composable form `aggregate(zip_with(a, b, _*_), 0d, _+_)` is built
  * from higher-order functions, which are CodegenFallback in Spark 4 —
  * every row pays interpreted-expression overhead plus a materialized
  * intermediate product array. This expression generates a tight primitive
  * loop inside whole-stage codegen: no allocation, no virtual calls.
  *
  * Semantics are IDENTICAL where both are defined: a sequential
  * left-to-right float64 sum (bit-for-bit equal to the fold form and to
  * DuckDB's `list_dot_product` on `DOUBLE[]`, which the correctness oracle
  * relies on). Inputs of unequal length use the common prefix; a NULL
  * array yields NULL. Array *elements* must be non-null (embedding vectors
  * are) — a null element's slot reads as 0.0 rather than poisoning the sum.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  // no ExpectsInputTypes (its AbstractDataType is private[sql]): exact
  // array<double> check, callers cast float arrays explicitly
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_dot expects (array<double>, array<double>), got ($l, $r)")
    }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("sum")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $s += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Registration for the engine's native expressions — injected through the
  * public `SparkSessionExtensions` API (see graft.Sessions). */
object GraftFunctions {

  val dotProduct: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_dot"),
    new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
    (children: Seq[Expression]) => {
      require(children.size == 2,
        s"graft_dot requires exactly 2 arguments, got ${children.size}")
      DotProduct(children(0), children(1))
    })

  /** Column-DSL library functions lifted to SQL names (one implementation,
    * two surfaces): a pure-SQL user of the engine gets the text/quality/
    * dedup primitives without touching the Scala API. Each builder emits
    * the same expression tree the Column API emits, so plans, codegen and
    * results are identical by construction. */
  private def liftedFunctions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = {
    import org.apache.spark.sql.Column
    import org.apache.spark.sql.graft.ColumnBridge.builder
    def entry(name: String, arity: Int)(f: Seq[Column] => Column) = (
      FunctionIdentifier(name),
      new ExpressionInfo(GraftFunctions.getClass.getName, name),
      builder(arity, name)(f))
    Seq(
      entry("graft_url_canon", 1)(cs =>
        graft.functions.Urls.canonicalize(cs.head)),
      entry("graft_lang_id", 1)(cs =>
        graft.functions.TextAnalysis.langId(cs.head)),
      entry("graft_quality_score", 1)(cs =>
        graft.functions.TextAnalysis.qualityScore(cs.head)),
      entry("graft_token_count", 1)(cs =>
        graft.functions.TextAnalysis.tokenCount(cs.head)),
      entry("graft_md5h60", 1)(cs =>
        graft.operators.NearDup.md5Hash60(cs.head)),
      entry("graft_luhn", 1)(cs =>
        graft.functions.Validation.luhnValid(cs.head)),
      entry("graft_reg_domain", 1)(cs =>
        graft.functions.Urls.registeredDomain(cs.head)),
      entry("graft_dup_gram_frac", 1)(cs =>
        graft.functions.TextAnalysis.dupGramFraction(cs.head)),
      entry("graft_first_digit", 1)(cs =>
        graft.operators.Stats.firstDigit(cs.head)),
      entry("graft_redact_pii", 1)(cs =>
        graft.functions.TextAnalysis.redactPii(cs.head)),
      entry("graft_nfc", 1)(cs =>
        graft.functions.TextAnalysis.nfc(cs.head)),
      entry("graft_nfkc", 1)(cs =>
        graft.functions.TextAnalysis.nfkc(cs.head)),
      entry("graft_strip_accents", 1)(cs =>
        graft.functions.TextAnalysis.stripAccents(cs.head)),
      entry("graft_match_key", 1)(cs =>
        graft.functions.TextAnalysis.matchKey(cs.head)),
      entry("graft_strip_markup", 1)(cs =>
        graft.functions.TextAnalysis.stripMarkup(cs.head)))
  }

  /** graft_rolling_hash(text, n): all n-byte window hashes, O(len) — the
    * window length must be a literal (it shapes the generated loop). */
  val rollingHash: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_rolling_hash"),
    new ExpressionInfo(classOf[RollingHash].getName, "graft_rolling_hash"),
    (children: Seq[Expression]) => {
      require(children.size == 2,
        s"graft_rolling_hash requires 2 arguments, got ${children.size}")
      val n = children(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(i: Int, _) => i
        case other => throw new IllegalArgumentException(
          s"graft_rolling_hash window must be an integer literal, got $other")
      }
      RollingHash(children(0), n, RollingHash.DefaultBase)
    })

  /** graft_sorted_contains(sorted_array<bigint>, bigint): binary-search
    * membership — the broadcast-set prune primitive (see
    * [[SortedArrayContains]] for the sortedness contract). */
  val sortedContains: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_sorted_contains"),
    new ExpressionInfo(classOf[SortedArrayContains].getName,
      "graft_sorted_contains"),
    (children: Seq[Expression]) => {
      require(children.size == 2,
        s"graft_sorted_contains requires 2 arguments, got ${children.size}")
      SortedArrayContains(children(0), children(1))
    })

  /** graft_hilbert(x0, x1, …, bits): d-dimensional Hilbert-curve index of
    * integral grid ordinals (auto-cast to bigint); `bits` must be an
    * integer literal — it shapes the generated loop, like
    * graft_rolling_hash's window. */
  val hilbert: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_hilbert"),
    new ExpressionInfo(classOf[HilbertIndex].getName, "graft_hilbert"),
    (children: Seq[Expression]) => {
      require(children.size >= 3,
        s"graft_hilbert requires >= 2 coordinates plus bits, got ${children.size}")
      val bits = children.last match {
        case org.apache.spark.sql.catalyst.expressions.Literal(i: Int, _) => i
        case other => throw new IllegalArgumentException(
          s"graft_hilbert bits must be an integer literal, got $other")
      }
      import org.apache.spark.sql.catalyst.expressions.Cast
      import org.apache.spark.sql.types.LongType
      HilbertIndex(children.init.map(c =>
        if (c.dataType == LongType) c else Cast(c, LongType)), bits)
    })

  def install(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(dotProduct)
    ext.injectFunction(CosineSimFunction.entry)
    ext.injectFunction(rollingHash)
    ext.injectFunction(sortedContains)
    ext.injectFunction(hilbert)
    liftedFunctions.foreach(ext.injectFunction)
  }
}
