package graft

import org.apache.spark.sql.functions._

/** Storage-layout levers that matter at 100 TB: partitioned writes that
  * prune at the source, and bucketed tables that join with zero exchanges.
  * Both are asserted on the PLAN, not just the result — the point is what
  * the scan/join avoids reading/shuffling. */
class ScaleIoSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("partitionBy write → reads with a partition filter prune at the source") {
    val out = java.nio.file.Files.createTempDirectory("graft-part").toString
    val orders = Tables.load(spark, dir, "orders")
    orders.withColumn("status", col("o_orderstatus"))
      .write.partitionBy("status").mode("overwrite").parquet(out)

    val rd = spark.read.parquet(out).filter(col("status") === "F")
    val plan = rd.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan)
    assert(plan.contains("(status#") || plan.contains("status ="), plan)
    // pruned read returns exactly the partition's rows
    assert(rd.count() ===
      orders.filter(col("o_orderstatus") === "F").count())
  }

  test("bucketed + sorted tables sort-merge join with ZERO exchanges") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      spark.sql("DROP TABLE IF EXISTS graft_bkt_orders")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_lineitem")
      Tables.load(spark, dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("graft_bkt_orders")
      Tables.load(spark, dir, "lineitem")
        .select("l_orderkey", "l_quantity")
        .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("graft_bkt_lineitem")

      val j = spark.table("graft_bkt_orders")
        .join(spark.table("graft_bkt_lineitem"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderkey").agg(sum("l_quantity").as("q"))
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), plan) // co-located: no shuffle at all
      assert(j.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS graft_bkt_orders")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_lineitem")
    }
  }

  test("ORC round-trip preserves rows and pushes filters into the scan") {
    val out = java.nio.file.Files.createTempDirectory("graft-orc").toString
    val orders = Tables.load(spark, dir, "orders")
    orders.write.mode("overwrite").orc(out)
    val rd = spark.read.orc(out).filter(col("o_totalprice") > 1000.0)
      .select("o_orderkey", "o_totalprice")
    val plan = rd.queryExecution.executedPlan.toString
    assert(plan.contains("FileScan orc"), plan)
    assert(plan.contains("PushedFilters: [IsNotNull(o_totalprice), " +
      "GreaterThan(o_totalprice,1000.0)]"), plan)
    // projection pruned to the two selected columns
    assert(plan.contains("ReadSchema: struct<o_orderkey:bigint,o_totalprice:double>"), plan)
    assert(rd.count() === orders.filter(col("o_totalprice") > 1000.0).count())
  }

  test("JSON-lines round-trip preserves rows and values") {
    val out = java.nio.file.Files.createTempDirectory("graft-jsonl").toString
    val orders = Tables.load(spark, dir, "orders")
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    orders.write.mode("overwrite").json(out)
    // explicit schema on read: no inference pass over 100 TB, and types
    // come back exact instead of best-guess
    val rd = spark.read.schema(orders.schema).json(out)
    assert(rd.count() === orders.count())
    val a = orders.orderBy("o_orderkey").collect()
    val b = rd.orderBy("o_orderkey").collect()
    assert(a.sameElements(b))
  }
}
