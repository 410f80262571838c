package graft

import org.apache.spark.sql.functions._

/** Q1: the re-runnable DDL/view surface — Tables.registerAll exposes every
  * testdata table as a temp view so `spark.sql` works against the same
  * names the DuckDB oracle uses. Idempotent by construction
  * (createOrReplaceTempView). */
class SqlSurfaceSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("registerAll exposes all tables to spark.sql and is re-runnable") {
    Tables.registerAll(spark, dir)
    Tables.registerAll(spark, dir) // idempotent re-run (DROP/CREATE shape)
    val cnt = spark.sql("SELECT count(*) AS c FROM orders").head().getLong(0)
    assert(cnt === Tables.load(spark, dir, "orders").count())
    assert(Tables.names.forall(spark.catalog.tableExists))
  }

  test("spark.sql joins and aggregates over the registered views") {
    Tables.registerAll(spark, dir)
    val got = spark.sql(
      """SELECT o.o_orderstatus, count(*) AS cnt
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |GROUP BY o.o_orderstatus ORDER BY o.o_orderstatus""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expect = Tables.load(spark, dir, "orders")
      .join(Tables.load(spark, dir, "customer"),
        col("o_custkey") === col("c_custkey"))
      .groupBy("o_orderstatus").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === expect)
  }
}
