package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sessionization (gaps-and-islands): number each key's events into
  * sessions, where a new session starts whenever the time since the
  * previous event exceeds `gap`. The standard shape — `lag` to find the
  * boundaries, running `sum` of the boundary flags to number the islands —
  * two window passes over ONE shuffle by key (both windows share the
  * (key, time) sort), no join, no state. At 100 TB the cost is the single
  * sort; skewed keys (one user = one partition's worth of events) are the
  * thing to watch, and a bot-like key is better handled by capping events
  * per key upstream than by salting (sessions are inherently sequential
  * per key).
  *
  * For unbounded streams the same semantics run incrementally as
  * `session_window` / `flatMapGroupsWithState` (graft.streaming); this is
  * the batch/backfill form.
  */
object Sessionize {

  /** Adds `session_id` (1-based, per key, in time order) to `events`.
    * `time` must be numeric (e.g. epoch micros) so gap arithmetic is exact;
    * `order` is the within-key total tiebreak after the time column. */
  def sessionize(events: DataFrame, key: String, time: String, gap: Long,
      order: Seq[Column] = Nil): DataFrame = {
    val w = Window.partitionBy(col(key))
      .orderBy((col(time).asc +: order): _*)
    val isNew = when(
      col(time) - lag(col(time), 1).over(w) > gap ||
        lag(col(time), 1).over(w).isNull, 1L).otherwise(0L)
    events
      .withColumn("session_id",
        sum(isNew).over(w.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
  }

  /** Per-session rollup: event count, span, and bounds. */
  def sessionStats(sessionized: DataFrame, key: String,
      time: String): DataFrame =
    sessionized.groupBy(col(key), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col(time)).as("t_start"),
        max(col(time)).as("t_end"),
        (max(col(time)) - min(col(time))).as("span"))
}
