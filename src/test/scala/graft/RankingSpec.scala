package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Ranking

/** Distributed-exact ranking: equality with the single-partition window
  * under adversarial partitioning, the ntile identity, and the collision
  * guard. */
class RankingSpec extends SparkSpec {
  import sqlImplicits._

  // values with heavy ties — the tiebreaker (id) must make ranks unique
  private def rows = (0L until 500L).map(i => (i, (i % 7) * 10)).toDF("id", "v")

  test("globalRank equals the single-partition row_number, any partitioning") {
    val order = Seq(col("v"), col("id"))
    val naive = rows.coalesce(1)
      .withColumn("rank",
        row_number().over(Window.orderBy(order: _*)).cast("long"))
      .select("id", "rank").collect().map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    Seq(rows, rows.repartition(13), rows.repartition(1)).foreach { in =>
      val got = Ranking.globalRank(in, order, parts = 8)
        .select("id", "rank").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == naive)
    }
  }

  test("equalFreqBins matches the floor form, balanced within one row") {
    // 500 rows, k = 7: 500 = 7*71 + 3 — three buckets get the extra row,
    // spread across the range (NOT ntile's front-loaded placement; the
    // floor form keeps bucket-size bias uncorrelated with the order key)
    val order = Seq(col("v"), col("id"))
    val viaWindow = rows.coalesce(1)
      .withColumn("r", row_number().over(Window.orderBy(order: _*)))
      .withColumn("bin", (((col("r") - 1) * 7) / 500).cast("long"))
      .select("id", "bin").collect().map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    val got = Ranking.equalFreqBins(rows, order, k = 7, parts = 8)
      .select("id", "bin").collect().map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(got == viaWindow)
    // bins are balanced: sizes differ by at most 1, larger buckets spread
    val sizes = got.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(sizes.values.max - sizes.values.min <= 1)
    assert(sizes.filter(_._2 == 72).keySet != Set(0L, 1L, 2L),
      "larger buckets should not be ntile-style front-loaded")
  }

  test("colliding column names are rejected") {
    assertThrows[IllegalArgumentException] {
      Ranking.globalRank(rows.withColumnRenamed("v", "rank"),
        Seq(col("id")), parts = 4)
    }
  }
}
