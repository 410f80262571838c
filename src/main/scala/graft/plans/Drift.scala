package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Run-over-run drift detection (SURVEY.md §2.13; reference notebook cell
  * 17, `ETL_Prueba_Tecnica.ipynb:340-365`): compare the current batch
  * snapshot against the previous one — per-group volume deltas beyond a
  * tolerance (the reference flags ±30%) and category-distribution shift.
  * The batch-over-batch comparator that closes the loop with
  * [[ControlTable]]: the control table says a batch ran and how many rows
  * it wrote; Drift says whether the SHAPE of what it wrote moved.
  *
  * Scale shape: both inputs aggregate FIRST (map-side partial counts, one
  * shuffle each on the group key), then the two tiny per-group count
  * tables full-outer join — never a row-level join of the batches
  * themselves. Group/category cardinality is assumed small relative to
  * the batches (that is what makes them categories); the join is
  * broadcast-able either way at any corpus size.
  */
object Drift {

  /** Per-group volume drift: row counts of `cur` vs `prev` grouped by
    * `keys`, with the relative delta and a verdict. Groups absent from a
    * side count 0. `delta_ratio` is NULL for NEW groups (no baseline);
    * verdicts: NEW (no prev rows), GONE (no cur rows), DRIFT (|delta| >
    * `tolerance`), OK. */
  def volumeDrift(prev: DataFrame, cur: DataFrame, keys: Seq[String],
      tolerance: Double = 0.3): DataFrame = {
    val p = prev.groupBy(keys.map(col): _*).agg(count(lit(1)).as("prev_rows"))
    val c = cur.groupBy(keys.map(col): _*).agg(count(lit(1)).as("cur_rows"))
    p.join(c, keys, "full_outer")
      .select(keys.map(col) ++ Seq(
        coalesce(col("prev_rows"), lit(0L)).as("prev_rows"),
        coalesce(col("cur_rows"), lit(0L)).as("cur_rows")): _*)
      .withColumn("delta_ratio",
        when(col("prev_rows") > 0,
          round((col("cur_rows") - col("prev_rows")).cast("double") /
            col("prev_rows"), 4)))
      .withColumn("status",
        when(col("prev_rows") === 0, lit("NEW"))
          .when(col("cur_rows") === 0, lit("GONE"))
          .when(abs((col("cur_rows") - col("prev_rows")).cast("double") /
            col("prev_rows")) > tolerance, lit("DRIFT"))
          .otherwise(lit("OK")))
  }

  /** Histogram (distribution) drift: L1 distance between the two batches'
    * bucket distributions — the "did the document-length / value profile
    * move" monitor that [[volumeDrift]] (totals) and [[categoryDrift]]
    * (labels) both miss when the SHAPE shifts at constant volume and mix.
    *
    * The distance is computed in CROSS-MULTIPLIED INTEGERS
    * (|n_prev·N_cur − n_cur·N_prev| per bucket, one division at the end),
    * so every engine produces the identical double — no float-sum order
    * anywhere. Overflow bound: N_prev·N_cur must stay under 2^63 (fine to
    * ~3·10^9 rows a side; beyond that, pre-aggregate buckets
    * hierarchically).
    *
    * Scale shape: one aggregate per batch (map-side partials), a
    * full-outer join of the tiny bucket tables, single-partition window
    * only over those bucket rows — same discipline as [[categoryDrift]].
    *
    * @return per bucket: (bucket, n_prev, n_cur, share_diff, l1) where
    *         l1 (constant across rows) is Σ|share_prev − share_cur|
    */
  def histogramDrift(prev: DataFrame, cur: DataFrame,
      bucket: Column): DataFrame = {
    def counts(df: DataFrame, out: String) =
      df.select(bucket.as("bucket")).groupBy(col("bucket"))
        .agg(count(lit(1)).as(out))
    val joined = counts(prev, "n_prev")
      .join(counts(cur, "n_cur"), Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("n_prev"), lit(0L)).as("n_prev"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
    val all = Window.partitionBy()
    joined
      .withColumn("__tp", sum(col("n_prev")).over(all))
      .withColumn("__tc", sum(col("n_cur")).over(all))
      .withColumn("__num",
        abs(col("n_prev") * col("__tc") - col("n_cur") * col("__tp")))
      .withColumn("share_diff", round(col("__num").cast("double") /
        (col("__tp") * col("__tc")).cast("double"), 6))
      .withColumn("l1", round(sum(col("__num")).over(all).cast("double") /
        (col("__tp") * col("__tc")).cast("double"), 6))
      .select(col("bucket"), col("n_prev"), col("n_cur"),
        col("share_diff"), col("l1"))
  }

  /** Category-distribution drift: each category's SHARE of its batch in
    * `prev` vs `cur` and the share delta — volume-independent, so a batch
    * that doubled uniformly shows zero drift here while a category mix
    * shift shows up even at constant volume. `drifted` flags |delta| >
    * `tolerance` (absolute share points). Missing categories take share
    * 0. */
  def categoryDrift(prev: DataFrame, cur: DataFrame, category: String,
      tolerance: Double = 0.05): DataFrame = {
    def shares(df: DataFrame, outCol: String): DataFrame = {
      val counts = df.groupBy(col(category)).agg(count(lit(1)).as("n"))
      // Global total via an unpartitioned window OVER THE AGGREGATE, not the
      // rows: the single-partition exchange holds one row per category (tiny
      // by the assumption above), and the batch is scanned/aggregated exactly
      // once — a broadcast of counts.agg(...) would reference the unpersisted
      // counts subplan twice and recompute the aggregation per consumer.
      counts.select(col(category),
        (col("n").cast("double") /
          sum(col("n")).over(Window.partitionBy())).as(outCol))
    }
    val raw = shares(prev, "_ps").join(shares(cur, "_cs"), Seq(category), "full_outer")
      .select(col(category),
        coalesce(col("_ps"), lit(0.0)).as("_ps"),
        coalesce(col("_cs"), lit(0.0)).as("_cs"))
    raw.select(col(category),
      round(col("_ps"), 4).as("prev_share"),
      round(col("_cs"), 4).as("cur_share"),
      round(col("_cs") - col("_ps"), 4).as("share_delta"),
      (abs(col("_cs") - col("_ps")) > tolerance).as("drifted"))
  }

  /** Row-level snapshot diff: classify every key across two corpus
    * snapshots as NEW (key only in `cur`), GONE (only in `prev`), CHANGED
    * (both, digests differ) or SAME — the per-document regression report
    * run between two builds of a training corpus (volumeDrift is its
    * aggregate sibling). Both inputs carry `(keyCol, digestCol)`; pass a
    * content digest (e.g. `md5(text)`), never raw content — the full-outer
    * join then shuffles 2×32 bytes per row instead of the documents
    * themselves, which is what makes the diff runnable at snapshot scale.
    * One shuffle per side, keyed by `keyCol`.
    */
  def snapshotDiff(prev: DataFrame, cur: DataFrame, keyCol: String,
      digestCol: String): DataFrame = {
    val p = prev.select(col(keyCol), col(digestCol).as("_pd"))
    val c = cur.select(col(keyCol), col(digestCol).as("_cd"))
    p.join(c, Seq(keyCol), "full_outer")
      .select(col(keyCol),
        when(col("_pd").isNull, lit("NEW"))
          .when(col("_cd").isNull, lit("GONE"))
          .when(col("_pd") =!= col("_cd"), lit("CHANGED"))
          .otherwise(lit("SAME")).as("status"))
  }
}
