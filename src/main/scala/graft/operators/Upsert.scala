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
    * Built as five 1-row aggregates cross-joined — each is a full plan, so
    * pass cached inputs when running all counters at once. */
  def audit(base: DataFrame, newDf: DataFrame, key: String): DataFrame = {
    val bc  = base.agg(count(lit(1)).as("base_count"))
    val nc  = newDf.agg(count(lit(1)).as("new_count"))
    val up  = updates(base, newDf, key).agg(count(lit(1)).as("updates"))
    val ins = inserts(base, newDf, key).agg(count(lit(1)).as("inserts"))
    val fin = upsert(base, newDf, key).agg(count(lit(1)).as("final_count"))
    bc.crossJoin(nc).crossJoin(up).crossJoin(ins).crossJoin(fin)
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
