package graft

import org.apache.spark.sql.functions._

import graft.sources.Jdbc

/** S5 integration-tested against embedded Derby (ships with Spark's jars):
  * replace/append writes, single and range-partitioned parallel reads, and
  * predicate pushdown into the remote query — the full JDBC surface the
  * reference only documents. */
class JdbcSpec extends SparkSpec {

  private lazy val dbDir =
    java.nio.file.Files.createTempDirectory("graft-derby").toString
  private lazy val url = s"jdbc:derby:$dbDir/db;create=true"
  private val driver = "org.apache.derby.jdbc.EmbeddedDriver"
  private lazy val p = Jdbc.props("app", "app", driver)

  test("writeReplace + readTable round-trips a table slice") {
    val orders = Tables.load(spark, "/root/testdata/sf0.001", "orders")
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
      .filter(col("o_orderkey") < 500)
    Jdbc.writeReplace(orders, url, "orders_rt", p)
    val back = Jdbc.readTable(spark, url, "orders_rt", p)
    assert(back.count() === orders.count())
    assert(back.agg(round(sum(col("o_totalprice")), 2)).head().getDouble(0) ===
      orders.agg(round(sum(col("o_totalprice")), 2)).head().getDouble(0))
  }

  test("writeAppend accumulates; partitioned read slices into N range queries") {
    import sqlImplicits._
    val a = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val b = Seq((3L, "c"), (4L, "d")).toDF("k", "v")
    Jdbc.writeReplace(a, url, "appends", p)
    Jdbc.writeAppend(b, url, "appends", p)
    val rd = Jdbc.read(spark, url, "appends", "k", 1L, 4L, 3, p)
    assert(rd.rdd.getNumPartitions === 3) // three parallel range cursors
    assert(rd.collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L, 3L, 4L))
  }

  test("filters push down into the JDBC scan") {
    val rd = Jdbc.readTable(spark, url, "orders_rt", p)
      .filter(col("o_orderkey") > 100)
    val plan = rd.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("o_orderkey"), plan)
    assert(rd.count() > 0)
  }
}
