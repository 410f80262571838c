package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for heavy-hitter keys (SURVEY.md §2.14 scale notes).
  *
  * AQE's skew-join handling covers joins; for *aggregations* over a skewed
  * key the classic fix is two-phase salted aggregation: partial-aggregate on
  * (key, salt) so a hot key's rows spread over `saltBuckets` reducers, then
  * re-aggregate on the key alone. The second shuffle carries one row per
  * (key, salt) — bounded — instead of every row of the hot key hitting one
  * reducer.
  *
  * The salt must be deterministic (re-runs and retries must agree): it is
  * derived by hashing a caller-chosen high-cardinality column, NOT from
  * rand().
  */
object Skew {

  def saltColumn(highCardCol: Column, saltBuckets: Int): Column =
    pmod(xxhash64(highCardCol), lit(saltBuckets.toLong))

  /** Two-phase salted COUNT by `key`: identical result to
    * `df.groupBy(key).count()`, resilient to hot keys. */
  def saltedCount(df: DataFrame, key: String, saltCol: Column,
      saltBuckets: Int): DataFrame =
    df.withColumn("__salt", saltColumn(saltCol, saltBuckets))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as("cnt"))

  /** Two-phase salted SUM. Same contract: equals the unsalted groupBy-sum. */
  def saltedSum(df: DataFrame, key: String, valueCol: String, saltCol: Column,
      saltBuckets: Int): DataFrame =
    df.withColumn("__salt", saltColumn(saltCol, saltBuckets))
      .groupBy(col(key), col("__salt"))
      .agg(sum(col(valueCol)).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as("sum_val"))

  /** Salted equi-join for a skewed FACT side: the fact's hot key no longer
    * lands on one reducer — each fact row gets a deterministic salt in
    * [0, saltBuckets), the (small) dim side is replicated once per salt,
    * and the join key becomes (key, salt). Same rows as a plain inner
    * equi-join. Use when the dim is too big to broadcast but the fact is
    * skewed; with a broadcastable dim, `broadcast()` is strictly better,
    * and AQE's runtime skew splitting covers sort-merge joins it can see —
    * this is the explicit form for when neither applies (e.g. the skew is
    * known ahead of time and the planner's stats miss it). */
  /** Skew DETECTION, ahead of the salted mitigations below: per hot key,
    * its row count, its integer-exact share verdicts against two
    * thresholds — `heavy` (share > 1/heavyDen: a "heavy hitter" by the
    * classic 1/k definition) and `skewed` (count > skewFactor × the mean
    * rows-per-key) — plus the corpus-level context (n_rows, n_keys)
    * needed to read the numbers. All comparisons are cross-multiplied
    * integers, so the verdicts are bit-exact in any engine.
    *
    * This is the report a 100 TB job runs BEFORE choosing a join
    * strategy: a handful of heavy keys ⇒ salt or AQE-skew-join that key
    * set; none ⇒ plain hash join. One aggregate pass (map-side partials)
    * + a top-k (TakeOrdered); the two global scalars ride a tiny
    * single-partition aggregate joined back by broadcast cross.
    */
  def skewReport(df: DataFrame, key: Column, topK: Int = 20,
      heavyDen: Long = 100L, skewFactor: Long = 4L): DataFrame = {
    require(topK > 0 && heavyDen > 1 && skewFactor > 0,
      "need topK > 0, heavyDen > 1, skewFactor > 0")
    // materialize the per-key aggregate ONCE (it feeds both the totals
    // reduction and the report): without it the corpus is scanned and
    // aggregated twice — Spark's exchange reuse does not fire here because
    // the two branches prune different columns below the exchange. |keys|
    // rows, the aggregation output — cheap to hold at any corpus size.
    val counts = df.groupBy(key.as("key")).agg(count(lit(1)).as("cnt"))
      .localCheckpoint(true)
    val totals = counts.agg(sum(col("cnt")).as("n_rows"),
      count(lit(1)).as("n_keys"))
    counts.crossJoin(broadcast(totals))
      .select(col("key"), col("cnt"), col("n_rows"), col("n_keys"),
        (col("cnt") * heavyDen > col("n_rows")).as("heavy"),
        (col("cnt") * col("n_keys") > col("n_rows") * skewFactor)
          .as("skewed"))
      .orderBy(col("cnt").desc, col("key"))
      .limit(topK)
  }

  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      saltCol: Column, saltBuckets: Int): DataFrame = {
    val salted = fact.withColumn("__salt", saltColumn(saltCol, saltBuckets))
    val replicated = dim
      .withColumn("__salt", explode(sequence(lit(0L), lit(saltBuckets - 1L))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
