package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate string matching (entity resolution) by deletion-neighborhood
  * blocking — the FastSS construction: a pair of strings is within
  * Levenshtein distance 1 if and only if they share a key in the set
  * {s} ∪ {s minus one character}. Substitution deletes the differing
  * position on both sides, insertion/deletion deletes the extra character
  * on the longer side, equality matches on the strings themselves — so an
  * EQUI-join on the variant key generates a complete candidate set, and a
  * single `levenshtein` verification removes the false positives (distinct
  * variant positions can coincide on the same key without the originals
  * being close).
  *
  * Scale shape: each row fans out to |s|+1 variant keys (a pure narrow
  * explode — linear, never quadratic), the candidate join is an equi-join
  * on the key (shuffle or broadcast like any other), and verification runs
  * once per DISTINCT candidate pair. Compare the naive approach — a cross
  * join with a `levenshtein ≤ 1` predicate — which plans as a nested loop
  * over n·m pairs and is unrunnable at corpus scale. The classic use:
  * matching dirty records (OCR noise, typos) back to a clean registry.
  *
  * Variant keys are length-prefixed ("len|variant") so strings whose
  * lengths differ by more than 1 can never meet in the join — the length
  * filter is built into the key, not a post-hoc predicate.
  */
object FuzzyMatch {

  /** (id, key) variant rows for one side: the string itself plus every
    * single-character deletion, each prefixed with the VARIANT's length so
    * only compatible lengths collide. */
  private def variants(df: DataFrame, idCol: String, strCol: String,
      idOut: String, strOut: String): DataFrame = {
    val s = col(strOut)
    df.select(col(idCol).as(idOut), col(strCol).as(strOut))
      .select(col(idOut), s,
        explode(concat(array(lit(0)),
          when(length(s) > 0, sequence(lit(1), length(s)))
            .otherwise(array().cast("array<int>")))).as("p"))
      .select(col(idOut), s,
        when(col("p") === 0, s)
          .otherwise(concat(
            s.substr(lit(1), col("p") - 1),
            s.substr(col("p") + 1, length(s) - col("p")))).as("v"))
      .select(col(idOut), s,
        concat_ws("|", length(col("v")).cast("string"), col("v")).as("vk"))
      .distinct()
  }

  /** All (left, right) pairs within Levenshtein distance ≤ 1, exactly.
    *
    * @return (<leftId>, <rightId>, <left str>, <right str>, dist) — one row
    *         per matching pair, dist ∈ {0, 1}
    */
  def distance1Join(left: DataFrame, leftId: String, leftStr: String,
      right: DataFrame, rightId: String, rightStr: String): DataFrame = {
    require(Seq(leftId, leftStr, rightId, rightStr).distinct.size == 4,
      "left and right id/string column names must be pairwise distinct")
    val lv = variants(left, leftId, leftStr, leftId, leftStr)
    val rv = variants(right, rightId, rightStr, rightId, rightStr)
    lv.join(rv, Seq("vk"))
      .select(col(leftId), col(rightId), col(leftStr), col(rightStr))
      .distinct()
      .withColumn("dist",
        levenshtein(col(leftStr), col(rightStr)).cast("long"))
      .filter(col("dist") <= 1)
  }

  /** Sorted-neighborhood matching — the OTHER classic entity-resolution
    * blocking scheme: order all records under a sort key that co-locates
    * likely matches, then compare each record only to its next `window`
    * neighbors in that order. Where [[distance1Join]] is exact for
    * distance ≤ 1, sorted neighborhood trades exactness for an arbitrary
    * verifier at higher distances (recall depends on the sort key — the
    * standard multi-pass remedy is a union over several keys).
    *
    * Scale construction: the global order comes from
    * [[Ranking.globalRank]] (range-repartition + per-partition windows +
    * broadcast offsets — never a single-partition window), and the
    * rank-distance join `0 < r₂ − r₁ ≤ window` becomes an EQUI-join on
    * the rank bucket ⌊(rank−1)/window⌋ with the left side exploded to
    * (bucket, bucket+1) — candidate fan-out exactly `window` per record,
    * never a nested loop.
    *
    * @return (d1, d2, dist) — d1 the lower-ranked record, verified
    *         levenshtein ≤ maxDist
    */
  def sortedNeighborhoodPairs(df: DataFrame, idCol: String, strCol: String,
      sortKey: Column, window: Int, maxDist: Int,
      parts: Int = 32): DataFrame = {
    require(window >= 1, "window must be >= 1")
    require(maxDist >= 0, "maxDist must be >= 0")
    val ranked = Ranking.globalRank(
      df.select(col(idCol), col(strCol)),
      Seq(sortKey, col(idCol)), parts)
    def bucketOf(r: Column): Column = {
      val z = r - 1
      ((z - pmod(z, lit(window.toLong))) / window).cast("long")
    }
    val a = ranked.select(col(idCol).as("d1"), col(strCol).as("_s1"),
        col("rank").as("_r1"),
        explode(array(bucketOf(col("rank")), bucketOf(col("rank")) + 1))
          .as("_bk"))
    val b = ranked.select(col(idCol).as("d2"), col(strCol).as("_s2"),
      col("rank").as("_r2"), bucketOf(col("rank")).as("_bk"))
    a.join(b, Seq("_bk"))
      .filter(col("_r2") > col("_r1") && col("_r2") <= col("_r1") + window)
      .withColumn("dist", levenshtein(col("_s1"), col("_s2")).cast("long"))
      .filter(col("dist") <= maxDist)
      .select(col("d1"), col("d2"), col("dist"))
  }
}
