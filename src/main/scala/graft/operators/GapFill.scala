package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Missing-value repair over ordered per-key series — the companion to the
  * date-spine densification query: once the spine exists (or the raw
  * series has holes), sensor dropouts / sparse snapshots carry the last
  * known observation forward (LOCF) or the next one backward (NOCB).
  *
  * One window per direction, partitioned by the series key — a single hash
  * shuffle of the table, never a global sort; `last/first(ignoreNulls)`
  * scans each frame incrementally (Spark's running-frame window, not
  * O(n²) re-evaluation). The fill NEVER invents values: it copies an
  * observed value verbatim (no float arithmetic), so filled outputs are
  * bit-identical to their source observation in any engine. */
object GapFill {

  /** Last observation carried forward: for each column in `cols`, nulls
    * take the latest non-null value at or before the row within its key
    * group; leading nulls (no prior observation) stay null. `order` must
    * be a total order within a key for deterministic results. */
  def locf(df: DataFrame, keys: Seq[String], order: Seq[Column],
      cols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cols.foldLeft(df) { (d, c) =>
      d.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
  }

  /** Next observation carried backward — the mirror fill for trailing
    * gaps (value known only after the fact, e.g. backfilled labels). */
  def nocb(df: DataFrame, keys: Seq[String], order: Seq[Column],
      cols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    cols.foldLeft(df) { (d, c) =>
      d.withColumn(c, first(col(c), ignoreNulls = true).over(w))
    }
  }

  /** Resample an irregular per-key series onto a DENSE integral bucket grid
    * (the date spine) with LOCF fill — the step that turns raw event
    * streams into the fixed-frequency panel a feature store or forecaster
    * consumes. Composes the two halves this object documents: spine
    * construction (here) and fill ([[locf]]).
    *
    * Per (key, bucket) the LAST observation wins, picked by `order` via a
    * single max-of-struct aggregate (one shuffle, no window): the struct
    * comparison is lexicographic on (order…, value), so with a total
    * `order` the chosen value is unique and engine-independent. The spine
    * is keys × [global min bucket, global max bucket] — the span is a
    * 1-row aggregate broadcast into the key list, the grid materializes
    * O(keys × span) rows (the OUTPUT size — nothing larger exists at any
    * point), and the fill is one per-key window over the grid.
    *
    * The fill copies observed values verbatim (no arithmetic), so outputs
    * are bit-identical to their source observations in any engine.
    *
    * @param bucket integral bucket expression (e.g. `t div 86400000000L`)
    * @param order  total order within (key, bucket) — last row wins
    * @return (<keys…>, bucket, observed, <valueCol>) — one row per key per
    *         bucket in the global span; `observed` marks real data points,
    *         unfilled leading buckets stay null
    */
  def gridLocf(df: DataFrame, keys: Seq[String], bucket: Column,
      order: Seq[Column], valueCol: String): DataFrame = {
    val b = df.withColumn("_bk", bucket)
    val span = b.agg(min(col("_bk")).as("_lo"), max(col("_bk")).as("_hi"))
    val spine = b.select(keys.map(col): _*).distinct()
      .crossJoin(broadcast(span)) // 1 row — the span rides to every key
      .select(keys.map(col) :+
        explode(sequence(col("_lo"), col("_hi"))).as("_bk"): _*)

    val picked = b
      .groupBy(keys.map(col) :+ col("_bk"): _*)
      .agg(max(struct(order :+ col(valueCol).as("_v"): _*)).as("_s"))
      .select(keys.map(col) :+ col("_bk") :+
        col("_s").getField("_v").as(valueCol): _*)

    val joined = spine.join(picked, keys :+ "_bk", "left")
      .withColumn("observed", col(valueCol).isNotNull)
    locf(joined, keys, Seq(col("_bk")), Seq(valueCol))
      .withColumnRenamed("_bk", "bucket")
      .select((keys.map(col) :+ col("bucket") :+ col("observed") :+
        col(valueCol)): _*)
  }
}
