package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, LongType}

/** d-dimensional Hilbert-curve index of `d` non-negative grid ordinals
  * (`bits` bits each) — the locality-preserving alternative to the Morton
  * z-value for multi-column layout clustering
  * ([[graft.operators.Layout.clusteredWrite]]): consecutive Hilbert
  * indices are ALWAYS adjacent grid cells (one step in exactly one
  * dimension), where the z-curve takes long diagonal jumps at power-of-two
  * boundaries — so range-partitioned files cover tighter per-dimension
  * min/max boxes and footer-stats pruning discards more files on
  * single-dimension predicates.
  *
  * Algorithm: Skilling's transform (John Skilling, "Programming the
  * Hilbert curve", AIP Conf. Proc. 707, 2004 — public domain): undo the
  * excess-work pass per bit plane (invert/exchange against x[0]), Gray
  * encode across dimensions, fold the parity correction, then interleave
  * the transposed bits (dimension 0 most significant per plane). Pure
  * integer ops on longs, O(bits·d) per row.
  *
  * Why a custom expression: the per-plane exchange step feeds x[0] back
  * into every subsequent step, so a composed Column spelling duplicates
  * the whole prefix tree per reference (exponential expression blowup —
  * measured: the 4-bit/3-dim unroll is already unplannable). An
  * imperative loop inside whole-stage codegen is the honest shape; the
  * interpreted path runs the identical Scala loop
  * ([[HilbertIndex.compute]]).
  *
  * Nulls: any null coordinate yields a null index. Inputs must be in
  * [0, 2^bits) — grid-bucket upstream like [[graft.operators.Layout
  * .zValueN]]; `bits · d ≤ 62` keeps the index in a long.
  */
case class HilbertIndex(children: Seq[Expression], bits: Int)
    extends Expression {
  require(children.size >= 2, "graft_hilbert needs at least 2 dimensions")
  require(bits >= 1 && bits * children.size <= 62,
    s"bit budget: bits * ${children.size} must be <= 62")

  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "graft_hilbert"

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == LongType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_hilbert expects long columns, got " +
        children.map(_.dataType).mkString(", "))

  override def eval(input: InternalRow): Any = {
    val coords = new Array[Long](children.length)
    var i = 0
    while (i < children.length) {
      val v = children(i).eval(input)
      if (v == null) return null
      coords(i) = v.asInstanceOf[Long]
      i += 1
    }
    HilbertIndex.compute(coords, bits)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val n = children.length
    val evals = children.map(_.genCode(ctx))
    val c = ctx.freshName("coords")
    val q = ctx.freshName("q")
    val p = ctx.freshName("p")
    val t = ctx.freshName("t")
    val i = ctx.freshName("i")
    val bi = ctx.freshName("bi")
    val j = ctx.freshName("j")
    val childCode = evals.map(_.code.toString).mkString("\n")
    val anyNull = evals.map(_.isNull.toString).mkString(" || ")
    val assigns = evals.zipWithIndex
      .map { case (e, k) => s"$c[$k] = ${e.value};" }.mkString("\n")
    ev.copy(code = code"""
      $childCode
      boolean ${ev.isNull} = $anyNull;
      long ${ev.value} = -1L;
      if (!${ev.isNull}) {
        long[] $c = new long[$n];
        $assigns
        long $q = 1L << ${bits - 1};
        while ($q > 1L) {
          long $p = $q - 1L;
          for (int $i = 0; $i < $n; $i++) {
            if (($c[$i] & $q) != 0L) { $c[0] ^= $p; }
            else { long $t = ($c[0] ^ $c[$i]) & $p; $c[0] ^= $t; $c[$i] ^= $t; }
          }
          $q >>= 1;
        }
        for (int $i = 1; $i < $n; $i++) { $c[$i] ^= $c[$i - 1]; }
        long $t = 0L;
        $q = 1L << ${bits - 1};
        while ($q > 1L) {
          if (($c[${n - 1}] & $q) != 0L) { $t ^= $q - 1L; }
          $q >>= 1;
        }
        for (int $i = 0; $i < $n; $i++) { $c[$i] ^= $t; }
        long acc$t = 0L;
        for (int $bi = ${bits - 1}; $bi >= 0; $bi--) {
          for (int $j = 0; $j < $n; $j++) {
            acc$t = (acc$t << 1) | (($c[$j] >> $bi) & 1L);
          }
        }
        ${ev.value} = acc$t;
      }
    """)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HilbertIndex =
    copy(children = newChildren)
}

object HilbertIndex {
  /** Skilling coords → Hilbert index; the interpreted twin of the codegen
    * loop (bit-identical by construction — same integer ops). */
  def compute(coordsIn: Array[Long], bits: Int): Long = {
    val n = coordsIn.length
    val x = java.util.Arrays.copyOf(coordsIn, n)
    var q = 1L << (bits - 1)
    while (q > 1) {
      val p = q - 1
      var i = 0
      while (i < n) {
        if ((x(i) & q) != 0) x(0) ^= p
        else { val t = (x(0) ^ x(i)) & p; x(0) ^= t; x(i) ^= t }
        i += 1
      }
      q >>= 1
    }
    var i = 1
    while (i < n) { x(i) ^= x(i - 1); i += 1 }
    var t = 0L
    q = 1L << (bits - 1)
    while (q > 1) { if ((x(n - 1) & q) != 0) t ^= q - 1; q >>= 1 }
    i = 0
    while (i < n) { x(i) ^= t; i += 1 }
    var h = 0L
    var bi = bits - 1
    while (bi >= 0) {
      var j = 0
      while (j < n) { h = (h << 1) | ((x(j) >> bi) & 1L); j += 1 }
      bi -= 1
    }
    h
  }
}
