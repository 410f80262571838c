package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) history construction — turning a
  * stack of full snapshots into per-key validity intervals. The upsert
  * family (Upsert.merge, q09) keeps only the LATEST value; dimension
  * history keeps every version with [valid_from, valid_to) bounds so a
  * fact row can be joined to the attribute values that were true AT ITS
  * TIME (the other half of the as-of join story).
  *
  * Semantics: rows are (key, attrs…, batch). Within a key, versions are
  * delimited by CHANGE POINTS — batches where the attribute tuple differs
  * (null-safely) from the previous batch's tuple. Each version spans from
  * its first batch to the next version's first batch (exclusive); the last
  * version is open (valid_to NULL, is_current true). A key absent from
  * intermediate snapshots simply has no row to change on — absence is not
  * a tombstone (soft deletes need an explicit deleted flag column, which
  * then participates in the attrs tuple like any other).
  *
  * Scale shape: one window pass partitioned by key ordered by batch (lag +
  * running change-count), one aggregation keyed by (key, version), one
  * more per-key window for the interval close — three shuffles on the key,
  * no global sort, nothing driver-side. Exactly the shape that survives a
  * 1000-batch × 10^9-key dimension.
  */
object Scd {

  /** Build the version history.
    *
    * @param snaps stacked snapshots
    * @param key   business key column
    * @param attrs tracked attribute columns (a change in ANY starts a new
    *              version); compared null-safely as a tuple
    * @param batch integral/orderable snapshot id column
    * @return (<key>, <attrs…>, ver, valid_from, valid_to, is_current) —
    *         ver numbers versions 1.. within the key in batch order
    */
  def scd2History(snaps: DataFrame, key: String, attrs: Seq[String],
      batch: String): DataFrame = {
    require(attrs.nonEmpty, "need at least one tracked attribute")
    val cur = struct(attrs.map(col): _*)
    val wk = Window.partitionBy(col(key)).orderBy(col(batch))

    val versioned = snaps
      .withColumn("_chg",
        when(lag(cur, 1).over(wk) <=> cur, 0L).otherwise(1L))
      .withColumn("ver", sum(col("_chg"))
        .over(wk.rowsBetween(Window.unboundedPreceding, Window.currentRow)))

    val spans = versioned
      .groupBy((col(key) +: col("ver") +: attrs.map(col)): _*)
      .agg(min(col(batch)).as("valid_from"))

    val wv = Window.partitionBy(col(key)).orderBy(col("valid_from"))
    spans
      .withColumn("valid_to", lead(col("valid_from"), 1).over(wv))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** Effective-dated lookup: join facts to the dimension version that was
    * valid AT THE FACT'S TIME — the consumption side of [[scd2History]]
    * (a fact joined to `is_current` attributes silently rewrites
    * history). The join is an EQUI-join on the business key; the interval
    * condition `valid_from ≤ t < valid_to` is a residual predicate on
    * that key join, which is the right plan because a key's history is a
    * handful of versions: per-fact fan-out is bounded by the key's
    * version count, never by the interval width (no range-join machinery
    * needed — contrast RangeJoin.pointInInterval, where there is no
    * key to join on). Versions partition the timeline per key, so at
    * most one version matches; facts before the key's first version (or
    * with no key match) keep NULL attributes via the left join.
    *
    * @param history output of [[scd2History]]
    * @param facts   fact rows carrying `key` and the integral time `tCol`
    * @return facts + the matching version's columns */
  def lookupAsOf(history: DataFrame, facts: DataFrame, key: String,
      tCol: String): DataFrame =
    facts.join(history,
      facts(key) === history(key) &&
        history("valid_from") <= facts(tCol) &&
        (history("valid_to").isNull || facts(tCol) < history("valid_to")),
      "left")
      .drop(history(key))
}
