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
}
