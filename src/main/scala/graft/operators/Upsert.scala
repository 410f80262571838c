package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** UPSERT / MERGE family, re-expressed as pure dataflow (SURVEY.md §2.5
  * J1–J3 and §2.10 O1), after the reference's stored procedure
  * /root/reference/Seccion_3_SQL/seccion3_sql.sql:142-318 (`ON CONFLICT
  * (Col_1) DO UPDATE`, new row wins).
  *
  * Core Spark has no mutable table, so the merge is: new rows ∪ (old rows
  * whose key does not appear in new). This is idempotent by construction
  * (running it twice with the same `newDf` is a fixed point — property-tested
  * in UpsertSpec), which is the reference's own stated goal for ON CONFLICT
  * (seccion3_sql.sql:130,205).
  *
  * Scale notes: the anti join shuffles both sides by the key unless the new
  * side is small enough to broadcast — Catalyst + AQE decide; when `newDf` is
  * a small delta against a huge base (the common incremental-ETL shape), the
  * plan becomes a broadcast anti join with NO shuffle of the base. Callers
  * that reuse `newDf` across the audit counts and the merge should pass a
  * cached DataFrame (mirrors the reference's temp staging table, §4.1).
  */
object Upsert {

  /** J3: key-preserving merge — every key in `newDf` takes the new row,
    * keys only in `base` keep the old row. Both inputs must be unique by
    * `key` (pre-dedup with Dedup.keepFirst, as the reference pre-dedups
    * into its temp table). */
  def upsert(base: DataFrame, newDf: DataFrame, key: String): DataFrame =
    newDf.unionByName(base.join(newDf, Seq(key), "left_anti"))

  /** J1: rows of `newDf` that would UPDATE (key exists in base). */
  def updates(base: DataFrame, newDf: DataFrame, key: String): DataFrame =
    newDf.join(base, Seq(key), "left_semi")

  /** J2: rows of `newDf` that would INSERT (key absent from base). */
  def inserts(base: DataFrame, newDf: DataFrame, key: String): DataFrame =
    newDf.join(base, Seq(key), "left_anti")

  /** O1/A1: one-row audit frame with the stage counters the reference's
    * stored procedure RAISE-NOTICEs (base/new/updates/inserts/final).
    *
    * Single-pass: one full-outer join on the key (projected to the key column
    * only — nothing else shuffles) followed by one global aggregate. At 100 TB
    * this is exactly one shuffle of the keys instead of round-1's five
    * separate jobs (3 of them shuffled). Precondition: both inputs unique by
    * `key` (pre-dedup with Dedup.keepFirst, as the reference pre-dedups into
    * its temp table) — then `final = base − updates + new` holds and
    * `final_count` is simply the outer join's row count. */
  def audit(base: DataFrame, newDf: DataFrame, key: String): DataFrame = {
    val b = base.select(col(key)).withColumn("__in_base", lit(1))
    val n = newDf.select(col(key)).withColumn("__in_new", lit(1))
    b.join(n, Seq(key), "full_outer").agg(
      count(col("__in_base")).as("base_count"),
      count(col("__in_new")).as("new_count"),
      count(when(col("__in_base").isNotNull && col("__in_new").isNotNull, 1))
        .as("updates"),
      count(when(col("__in_base").isNull && col("__in_new").isNotNull, 1))
        .as("inserts"),
      count(lit(1)).as("final_count"))
  }

  /** SCD type 2 merge: history-preserving upsert. `dim` rows carry
    * (`valid_from`, `valid_to`, `is_current`); applying `changes` (one row
    * per key, pre-collapsed to the latest with Dedup if a batch can carry
    * several) at time `tsCol`:
    *
    *   - a matched current row is CLOSED (`valid_to` = change time,
    *     `is_current` = false) and the change opens a new current version;
    *   - an unmatched change INSERTS a new open version;
    *   - everything else (history rows, untouched current rows) passes
    *     through unchanged.
    *
    * One equi-join by key against only the CURRENT slice (history never
    * shuffles — it is unioned back untouched), so the cost profile is the
    * same as [[upsert]]: broadcast when the delta is small, one key
    * shuffle otherwise. Append-only by construction — no row is ever
    * rewritten in place, which is what makes the pattern work on
    * immutable storage at 100 TB. */
  def scd2Merge(dim: DataFrame, changes: DataFrame, key: String,
      tsCol: String): DataFrame = {
    val attrs = changes.columns.filterNot(c => c == key || c == tsCol)
    val history = dim.filter(!col("is_current"))
    val current = dim.filter(col("is_current"))
    val delta = changes.select(
      col(key) +: col(tsCol).as("__ts") +: attrs.map(col): _*)

    val joined = current.join(delta.select(col(key), col("__ts")), Seq(key), "left")
    val closed = joined.filter(col("__ts").isNotNull)
      .withColumn("valid_to", col("__ts"))
      .withColumn("is_current", lit(false))
      .drop("__ts")
    val untouched = joined.filter(col("__ts").isNull).drop("__ts")

    val dimCols = dim.columns
    val opened = delta
      .withColumn("valid_from", col("__ts"))
      .withColumn("valid_to", lit(null).cast(dim.schema("valid_to").dataType))
      .withColumn("is_current", lit(true))
      .select(dimCols.map(col): _*)

    history.unionByName(untouched).unionByName(closed).unionByName(opened)
  }

  /** Q4/F8: the reference's post-load verification — total vs distinct keys
    * and an OK/ERROR verdict string (seccion3_sql.sql:331-361). */
  def verifyUnique(df: DataFrame, key: String): DataFrame =
    df.agg(
      count(lit(1)).as("total_rows"),
      countDistinct(col(key)).as("distinct_keys"))
      .withColumn("estado",
        when(col("total_rows") === col("distinct_keys"), lit("OK"))
          .otherwise(lit("ERROR")))
}
