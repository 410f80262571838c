package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join — "which interval(s) does each event fall
  * in" — an operator Spark has no native physical strategy for: a plain
  * `points.join(intervals, p >= s && p < e)` plans as a broadcast
  * NESTED-LOOP (O(|points| × |intervals|) comparisons) or, without a
  * broadcastable side, a cartesian product. At 100 TB both are fatal.
  *
  * The scale shape here is the classic time-bucket equi-join: quantize time
  * into fixed-width buckets, explode each interval to the buckets it covers,
  * map each point to its single bucket, and hash-join on the bucket before
  * applying the exact range predicate. Cost model:
  *
  *   - one shuffle of each side, keyed by bucket (hash-partitioned, AQE
  *     coalescible) — never a cross product;
  *   - interval replication factor = ceil(length / bucketWidth) + 1, so
  *     `bucketWidth` should sit near the TYPICAL interval length: too small
  *     replicates intervals, too large widens the per-bucket candidate set
  *     (both degrade gracefully, neither explodes);
  *   - each point owns exactly ONE bucket, so a (point, interval) candidate
  *     pair arises exactly once — no post-join dedup pass.
  *
  * Correctness does not depend on the width — the exact predicate filters
  * every candidate — only performance does.
  */
object RangeJoin {

  /** The bucket is keyed by its START VALUE `x - pmod(x, w)` rather than an
    * index `x / w`: pure integer arithmetic, exact at any magnitude —
    * `Column./` on longs routes through doubles and would corrupt bucket
    * ids past 2^53 (epoch-nanos territory). Floor semantics for negative
    * times too, since pmod is non-negative. */
  private[operators] def bucketStart(x: Column, w: Long): Column =
    x - pmod(x, lit(w))

  /** One interval may explode to at most this many covering buckets. The
    * explode builds the bucket list as ONE in-memory array per row, so a
    * pathological interval (a year-long range against a minute-wide
    * bucket ≈ 0.5M entries) is an executor-OOM vector precisely when the
    * data is dirtiest. Rows beyond the cap fail fast with a named error —
    * a wrong `bucketWidth` should surface as a message saying so, not as
    * a dying executor. */
  val MaxBucketsPerInterval: Long = 1L << 20

  /** Covering-bucket explode with the fail-fast cap. */
  private def explodeBuckets(s: Column, e: Column, w: Long): Column = {
    val n = (bucketStart(e - 1, w) - bucketStart(s, w)) / w + 1
    explode(when(n <= MaxBucketsPerInterval,
      sequence(bucketStart(s, w), bucketStart(e - 1, w), lit(w)))
      .otherwise(raise_error(concat(
        lit(s"interval spans more than $MaxBucketsPerInterval buckets " +
          "(bucketWidth too small for interval ["), s,
        lit(", "), e, lit(")); pick a width near the typical length")))))
  }

  /** Inner point-in-interval join: every (point, interval) pair with
    * `start <= pointTime < end` (end-exclusive). All columns of both inputs
    * survive; names must not collide (callers project/rename first —
    * consistent with AsOfJoin's contract). Empty/inverted intervals
    * (end <= start) match nothing.
    *
    * @param points      side holding one `pointTime` long column (epoch
    *                    micros or any integral time)
    * @param intervals   side holding `[startCol, endCol)` long bounds
    * @param bucketWidth time-bucket width in the same unit; pick ~ the
    *                    typical interval length
    */
  def pointInInterval(points: DataFrame, pointTime: String,
      intervals: DataFrame, startCol: String, endCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val reserved = Set("__bucket")
    val clash = (points.columns ++ intervals.columns).filter(reserved)
    require(clash.isEmpty, s"column(s) ${clash.mkString(", ")} collide with " +
      "RangeJoin internals (__bucket); rename before joining")

    val s = col(startCol)
    val e = col(endCol)
    // sequence(a, b) steps DOWNWARD when b < a, so empty intervals must be
    // filtered before the explode rather than relying on an empty sequence
    val ivB = intervals
      .filter(e > s)
      .withColumn("__bucket", explodeBuckets(s, e, bucketWidth))
    val ptB = points.withColumn("__bucket",
      bucketStart(col(pointTime), bucketWidth))
    ptB.join(ivB, Seq("__bucket"))
      .filter(col(pointTime) >= s && col(pointTime) < e)
      .drop("__bucket")
  }

  /** Interval×interval overlap join: every (left, right) pair whose
    * half-open ranges `[ls, le) × [rs, re)` intersect. Same bucket-quantize
    * design as [[pointInInterval]] — both sides explode to the buckets they
    * cover and hash-join on the bucket — plus the standard emit-once rule:
    * a surviving pair is kept only in the bucket containing
    * `max(ls, rs)` (the first bucket where both intervals are live), so no
    * post-join `distinct` pass is needed even though a long overlap spans
    * many shared buckets.
    *
    * Replication factor per side = ceil(length / bucketWidth) + 1; pick the
    * width near the typical interval length (correctness never depends on
    * it). All columns of both inputs survive; names must not collide
    * (project/rename first). Empty intervals (end <= start) match nothing.
    */
  def intervalOverlap(left: DataFrame, ls: String, le: String,
      right: DataFrame, rs: String, re: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val reserved = Set("__bucket")
    val clash = (left.columns ++ right.columns).filter(reserved)
    require(clash.isEmpty, s"column(s) ${clash.mkString(", ")} collide with " +
      "RangeJoin internals (__bucket); rename before joining")

    def cover(df: DataFrame, s: Column, e: Column): DataFrame = df
      .filter(e > s)
      .withColumn("__bucket", explodeBuckets(s, e, bucketWidth))
    val lB = cover(left, col(ls), col(le))
    val rB = cover(right, col(rs), col(re))
    lB.join(rB, Seq("__bucket"))
      .filter(col(ls) < col(re) && col(rs) < col(le))
      .filter(col("__bucket") ===
        bucketStart(greatest(col(ls), col(rs)), bucketWidth))
      .drop("__bucket")
  }
}
