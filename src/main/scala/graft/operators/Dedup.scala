package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication family — the reference's signature operation, present in all
  * three of its engines (pandas `drop_duplicates`, Postgres `MIN(ctid)` /
  * `DISTINCT ON`, Excel pivot mode analysis). See SURVEY.md §2.4 (D1–D5),
  * citing /root/reference/Seccion_2_Python/ETL_Prueba_Tecnica.ipynb:60 and
  * /root/reference/Seccion_3_SQL/seccion3_sql.sql:184-229.
  *
  * Scale notes (100 TB): every dedup here is a single hash-shuffle on the key
  * (window or aggregate) — no global sort, no driver collect. Skewed keys are
  * handled by AQE (enabled in Verify/Bench sessions); for pathological skew,
  * pre-aggregate with a salted key then re-reduce (the `count`-based forms
  * below already do map-side partial aggregation).
  */
object Dedup {

  /** D1: number of duplicate rows by key = total - distinct keys.
    * Single row, computed as one aggregate (map-side partial combine). */
  def duplicateCount(df: DataFrame, key: String): DataFrame =
    df.agg((count(lit(1)) - countDistinct(col(key))).as("dup_count"))

  /** D2/D3: deterministic keep-first dedup. One row per key — the row that
    * sorts first by `order` (e.g. source priority, then intra-file sequence).
    * The reference's pandas `keep='first'` and Postgres `MIN(ctid)` both
    * depend on physical row order; here the order is explicit so the result
    * is reproducible on any cluster (SURVEY.md §7.4 watch-item 1). */
  def keepFirst(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** D4: `DISTINCT ON (key) ORDER BY ...` with an explicit, total tiebreak
    * (the reference's ORDER BY lists only the key, leaving the survivor
    * nondeterministic — we document the deviation and make it testable). */
  def distinctOn(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame =
    keepFirst(df, keys, order)

  /** D5 / T1: most-duplicated values — top-k keys by frequency with a
    * deterministic tiebreak on the key itself. */
  def modeTopK(df: DataFrame, key: String, k: Int): DataFrame =
    df.groupBy(col(key))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), col(key))
      .limit(k)

  /** A3/P4: leftover-duplicates check — keys appearing more than once.
    * Empty result == uniqueness holds (the reference's post-UPSERT
    * verification, seccion3_sql.sql:342-345). */
  def duplicateKeys(df: DataFrame, key: String): DataFrame =
    df.groupBy(col(key))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > 1)

  /** Exact content dedup at scale: fingerprint rows by a digest of selected
    * columns, keep the smallest `idCol` per fingerprint. This is the 100 TB
    * form of D2: the shuffle key is the (well-distributed) digest, so there
    * is no key skew by construction. */
  def exactDedupByDigest(df: DataFrame, digest: Column, idCol: String): DataFrame =
    keepFirst(df.withColumn("__fp", digest), Seq("__fp"), Seq(col(idCol)))
      .drop("__fp")

  /** Cross-batch incremental dedup — the shape every append-only corpus
    * pipeline runs nightly: keep only the rows of `batch` whose content is
    * NEW, i.e. absent from the accumulated digest registry of all prior
    * batches AND not already kept earlier in this batch. Two steps, both
    * keyed on the digest: within-batch [[exactDedupByDigest]], then a
    * LEFT ANTI join against the registry's digest column.
    *
    * Scale: the registry carries one digest per historical distinct row —
    * tiny next to the corpus — and the anti join shuffles on the digest
    * (well-distributed by construction, no key skew); when the registry
    * fits in memory AQE turns it into a broadcast anti join with zero
    * batch-side shuffle. The registry for the NEXT run is the union of
    * `seenDigests` and the survivors' digests — the caller appends it,
    * keeping the whole history out of the hot path. */
  def incrementalNew(batch: DataFrame, digest: Column, idCol: String,
      seenDigests: DataFrame): DataFrame = {
    val reg = seenDigests.select(col(seenDigests.columns.head).as("__fp")).distinct()
    exactDedupByDigest(batch, digest, idCol)
      .withColumn("__fp", digest)
      .join(reg, Seq("__fp"), "left_anti")
      .drop("__fp")
  }
}
