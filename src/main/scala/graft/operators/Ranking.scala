package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact global ranking and equal-frequency binning WITHOUT the
  * single-partition cliff. The naive plans —
  * `row_number() OVER (ORDER BY x)` / `ntile(k) OVER (ORDER BY x)` —
  * funnel every row through one task (Spark warns "No Partition Defined
  * for Window operation"); at corpus scale that is the job killer, and
  * it is why most pipelines settle for APPROXIMATE quantile binning.
  *
  * The distributed-exact construction (the classic zipWithIndex shape,
  * relational form):
  *   1. range-repartition by the order key — partition boundaries come
  *      from sampling, an execution detail: boundary PLACEMENT affects
  *      parallelism, never results, because every row of range i sorts
  *      strictly before every row of range i+1 under the total order;
  *   2. per-partition `row_number` windows run in parallel;
  *   3. whole-partition counts (one row per partition) take a tiny
  *      single-partition cumulative pass — the sequential dependency
  *      reduced to ≤ `parts` rows — and come back as a broadcast offset.
  * Same two-pass discipline as [[Sweep.prefixSums]], applied to ranks.
  *
  * The order must be TOTAL (pass a unique tiebreaker last) — ranks of
  * tied rows would otherwise depend on partition placement.
  */
object Ranking {

  /** Appends `rank` (1-based, dense-free, unique) under `order`. The
    * repartitioned input is materialized once (localCheckpoint) so the
    * counts pass and the rank pass read the same layout instead of
    * re-exchanging. */
  /** (materialized range-parted input, ranked output) — split out so
    * [[equalFreqBins]] can derive the total row count from the checkpoint
    * instead of re-running the rank pass. */
  private def rankStages(df: DataFrame, order: Seq[Column],
      parts: Int): (DataFrame, DataFrame) = {
    require(order.nonEmpty && parts > 0, "need order columns and parts > 0")
    val clash = df.columns.filter(Set("rank", "_pid"))
    require(clash.isEmpty, s"column(s) ${clash.mkString(", ")} collide with " +
      "globalRank internals; rename first")
    val parted = df.repartitionByRange(parts, order: _*)
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint(true)
    val counts = parted.groupBy(col("_pid")).agg(count(lit(1)).as("_n"))
    val wOff = Window.orderBy(col("_pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = counts.select(col("_pid"),
      coalesce(sum(col("_n")).over(wOff), lit(0L)).as("_off"))
    val wLoc = Window.partitionBy(col("_pid")).orderBy(order: _*)
    val ranked = parted
      .withColumn("_loc", row_number().over(wLoc))
      .join(broadcast(offsets), Seq("_pid"))
      .withColumn("rank", (col("_off") + col("_loc")).cast("long"))
      .drop("_pid", "_loc", "_off")
    (parted, ranked)
  }

  def globalRank(df: DataFrame, order: Seq[Column],
      parts: Int = 64): DataFrame = rankStages(df, order, parts)._2

  /** Exact equal-frequency bins: bin = floor((rank−1)·k / N), 0-based.
    * Bucket sizes are balanced to within one row, with the N mod k larger
    * buckets SPREAD EVENLY across the range — deliberately the floor
    * form, not SQL `ntile`, which front-loads every larger bucket onto
    * the lowest bins (same ±1 balance, different placement; the floor
    * form keeps bucket-size bias uncorrelated with the order key).
    * Planned as [[globalRank]] + a broadcast of the 1-row total instead
    * of the global window. Integer cross-multiplication only — bit-exact
    * in any engine while (N·k) stays under 2^53. */
  def equalFreqBins(df: DataFrame, order: Seq[Column], k: Int,
      parts: Int = 64): DataFrame = {
    require(k > 0, "k must be positive")
    val (parted, ranked) = rankStages(df, order, parts)
    // N from the checkpointed layout — the rank pass (window + join) runs
    // exactly once, for the output branch
    val total = parted.agg(count(lit(1)).as("_nn"))
    val scaled = (col("rank") - 1) * k
    ranked.crossJoin(broadcast(total))
      .withColumn("bin",
        ((scaled - pmod(scaled, col("_nn"))) / col("_nn")).cast("long"))
      .drop("_nn")
  }
}
