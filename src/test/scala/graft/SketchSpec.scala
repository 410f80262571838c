package graft

import org.apache.spark.sql.functions._

/** Sketch aggregates — the approximate forms that replace exact
  * count-distinct / percentiles at 100 TB (bounded memory, one pass,
  * mergeable across partitions). Accuracy is contract-checked against the
  * exact answers on real testdata, since no SQL oracle can reproduce
  * HLL/KLL internals. */
class SketchSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("approx_count_distinct lands within 5% of exact at rsd=0.02") {
    val li = Tables.load(spark, dir, "lineitem")
    val exact = li.select(countDistinct(col("l_partkey"))).head().getLong(0)
    val approx = li.select(approx_count_distinct(col("l_partkey"), 0.02))
      .head().getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx=$approx exact=$exact")
  }

  test("percentile_approx median sits at rank 0.5 within 1%") {
    val li = Tables.load(spark, dir, "lineitem")
    val total = li.count().toDouble
    val ap = li.select(percentile_approx(col("l_extendedprice"), lit(0.5),
      lit(10000))).head().getDouble(0)
    val rank = li.filter(col("l_extendedprice") <= ap).count() / total
    assert(rank > 0.49 && rank < 0.51, s"median estimate at rank $rank")
  }

  test("sketches merge: per-group HLLs sum to the global estimate's ballpark") {
    val li = Tables.load(spark, dir, "lineitem")
    // partial sketches per returnflag, then the union of the groups' key
    // sets equals the whole table's — merged estimate must track it
    val global = li.select(approx_count_distinct(col("l_partkey"), 0.02))
      .head().getLong(0)
    val grouped = li.groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey"), 0.02).as("d"))
      .collect().map(_.getLong(1))
    // keys repeat across groups, so max(group) <= global <= sum(groups)
    assert(grouped.max <= (global * 1.05).toLong)
    assert(global <= (grouped.sum * 1.05).toLong)
  }
}
