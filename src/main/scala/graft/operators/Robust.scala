package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Robust (median/MAD-based) per-group statistics — the outlier screen that
  * survives the outliers it is looking for. Mean/stddev gates move with
  * every extreme value (one corrupted sensor shifts the gate that was
  * supposed to catch it); the median and the median absolute deviation
  * have a 50% breakdown point, which is why data-quality monitors use
  * them for value-range checks over telemetry and price columns.
  *
  * Median convention: the LOWER MEDIAN — the value at rank ⌊(n+1)/2⌋ in
  * ascending order. It is an actual data value (never an interpolated
  * midpoint), which makes every downstream number portable: |x − med| is
  * one IEEE subtraction of two observed doubles, the MAD is again an
  * observed deviation value, and the outlier gate `|x − med| > c·MAD` is
  * one multiply and one compare — bit-identical in any engine. (The
  * interpolating median differs across engines in the even-n tie
  * handling and adds a rounding step; the lower median has neither
  * problem.)
  *
  * Scale shape: two window passes and one broadcast join, ALL windows
  * partitioned by the group key — no global sort, no single-partition
  * exchange anywhere. Per-group data streams through the window sort
  * (spilling external sort at scale); the per-group medians table is one
  * row per group and broadcasts back onto the rows.
  */
object Robust {

  /** Per-group n, lower median, MAD and outlier count.
    *
    * @param df     input rows
    * @param group  grouping column name
    * @param value  numeric column name (doubles pass through untouched)
    * @param tie    total-order tiebreak within (group, value) — required
    *               for deterministic ranks (the selected VALUE is already
    *               unique given ties sort adjacent, but a total order keeps
    *               every intermediate reproducible)
    * @param factor outlier gate: |x − median| > factor · MAD
    * @return (<group>, n, median, mad, n_outliers)
    */
  def groupRobustStats(df: DataFrame, group: String, value: String,
      tie: Column, factor: Double = 3.0): DataFrame = {
    val rows = df.select(col(group), col(value).as("_x"), tie.as("_tb"))
      .filter(col("_x").isNotNull)

    val wv = Window.partitionBy(col(group)).orderBy(col("_x"), col("_tb"))
    val medians = rows
      .withColumn("_rn", row_number().over(wv))
      .withColumn("_n", count(lit(1)).over(Window.partitionBy(col(group))))
      // lower-median rank ⌊(n+1)/2⌋ — n+1 < 2^52 so the double div is exact
      .filter(col("_rn") === floor((col("_n") + 1) / 2))
      .select(col(group), col("_x").as("median"), col("_n").as("n"))

    val dev = rows.join(broadcast(medians), Seq(group))
      .withColumn("_d", abs(col("_x") - col("median")))

    val wd = Window.partitionBy(col(group)).orderBy(col("_d"), col("_tb"))
    val mads = dev
      .withColumn("_rn", row_number().over(wd))
      .filter(col("_rn") === floor((col("n") + 1) / 2))
      .select(col(group), col("_d").as("mad"))

    dev.join(broadcast(mads), Seq(group))
      .groupBy(col(group), col("n"), col("median"), col("mad"))
      .agg(sum(when(col("_d") > col("mad") * factor, 1L).otherwise(0L))
        .as("n_outliers"))
      .select(col(group), col("n"), col("median"), col("mad"),
        col("n_outliers"))
  }
}
