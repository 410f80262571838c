package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed sweep-line primitives: order-the-timeline running sums,
  * computed WITHOUT the naive `Window.orderBy(t)` global window — that
  * plan collapses to ONE partition (Spark literally warns "No Partition
  * Defined for Window operation") and is the classic 100 TB cliff for
  * interval analytics.
  *
  * Two-pass distributed prefix sum instead:
  *   1. range-bucket the timeline (boundaries from `approxQuantile` — an
  *      execution detail: bucket placement affects parallelism, never the
  *      result, because buckets are value-ranges of `t` itself);
  *   2. per-bucket window sums run in parallel (window partitioned by
  *      bucket), while whole-bucket totals — one row per bucket — get a
  *      tiny cumulative pass and come back as a broadcast offset join.
  *
  * Supports inclusive (`t' <= t`) and exclusive (`t' < t`) frames, which
  * is exactly what interval-overlap counting needs (ends strictly before
  * the probe vs starts at-or-before). Both are RANGE frames, so rows tied
  * on `t` are peers and the result is deterministic under any tie order.
  *
  * Exclusive frames REQUIRE an integral time column: the frame is
  * `rangeBetween(unboundedPreceding, -1)`, i.e. `t' <= t - 1`, which
  * equals strict `t' < t` only when `t` has no fractional values — a
  * double/decimal timestamp would silently drop events in `(t-1, t)`.
  * [[prefixSums]] enforces this with a `require` (convert fractional
  * time to ticks — micros/nanos as integers — first).
  */
object Sweep {

  /** One requested running sum: `out` = Σ `value` over the frame. */
  case class SumSpec(out: String, value: Column, inclusive: Boolean)

  /** Appends each spec's timeline-running sum to `df`. `t` must be a
    * numeric column (e.g. epoch micros). `buckets` bounds the parallelism
    * of the big window pass. */
  def prefixSums(df: DataFrame, t: String, specs: Seq[SumSpec],
      buckets: Int = 64): DataFrame = {
    require(specs.nonEmpty)
    if (specs.exists(!_.inclusive)) {
      import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
      val dt = df.schema(t).dataType
      require(Seq(ByteType, ShortType, IntegerType, LongType).contains(dt),
        s"exclusive frames need an integral time column (t'<t is computed as " +
          s"t'<=t-1); '$t' is $dt — convert to integer ticks first")
    }
    val probs = (1 until buckets).map(_.toDouble / buckets).toArray
    val bounds =
      if (probs.isEmpty) Array.empty[Double]
      else df.stat.approxQuantile(t, probs, 0.01).distinct.sorted
    // rows with t == boundary land in the lower bucket, so bucket ranges
    // partition the timeline: every row of bucket i precedes (strictly)
    // every row of bucket i+1 — which is what lets whole-bucket totals
    // serve as frame-independent offsets.
    val bucketOf = bounds.zipWithIndex.foldLeft(lit(0)) {
      case (acc, (b, i)) => when(col(t) > b, lit(i + 1)).otherwise(acc)
    }
    val withB = df.withColumn("_bkt", bucketOf)

    val totals = withB.groupBy(col("_bkt"))
      .agg(sum(specs.head.value).as(s"_tot_${specs.head.out}"),
        specs.tail.map(sp => sum(sp.value).as(s"_tot_${sp.out}")): _*)
    // ≤ `buckets` rows: the single-partition window here is the POINT —
    // the sequential dependency is reduced to one row per bucket.
    val wOff = Window.orderBy(col("_bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = totals.select(
      col("_bkt") +: specs.map(sp =>
        coalesce(sum(col(s"_tot_${sp.out}")).over(wOff), lit(0L))
          .as(s"_off_${sp.out}")): _*)

    val base = Window.partitionBy(col("_bkt")).orderBy(col(t))
    val withLocal = specs.foldLeft(withB) { (d, sp) =>
      val frame =
        if (sp.inclusive) base.rangeBetween(Window.unboundedPreceding, 0)
        else base.rangeBetween(Window.unboundedPreceding, -1)
      d.withColumn(s"_loc_${sp.out}",
        coalesce(sum(sp.value).over(frame), lit(0L)))
    }
    val joined = withLocal.join(broadcast(offsets), "_bkt")
    val outCols = df.columns.map(col).toSeq ++ specs.map(sp =>
      (col(s"_loc_${sp.out}") + col(s"_off_${sp.out}")).as(sp.out))
    joined.select(outCols: _*)
  }

  /** Interval-concurrency at each interval's start: for intervals
    * [`startCol`, `endCol`] (inclusive ends), how many intervals overlap
    * each start instant — sweep-line (starts at-or-before minus ends
    * strictly-before), never the O(n²) self-join. Output: the interval
    * rows plus `concurrency`. */
  def concurrencyAtStarts(intervals: DataFrame, startCol: String,
      endCol: String, buckets: Int = 64): DataFrame = {
    val others = intervals.columns.filterNot(_ == endCol).map(col).toSeq
    val pts = intervals
      .select(others :+ col(startCol).as("_t") :+ lit(1L).as("_is_s")
        :+ lit(0L).as("_is_e"): _*)
      .unionAll(intervals
        .select(others :+ col(endCol).as("_t") :+ lit(0L).as("_is_s")
          :+ lit(1L).as("_is_e"): _*))
    prefixSums(pts, "_t",
      Seq(SumSpec("_s_incl", col("_is_s"), inclusive = true),
        SumSpec("_e_excl", col("_is_e"), inclusive = false)), buckets)
      .filter(col("_is_s") === 1)
      .select(others :+ (col("_s_incl") - col("_e_excl")).as("concurrency"): _*)
  }
}
