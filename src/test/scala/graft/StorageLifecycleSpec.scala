package graft

import org.apache.spark.sql.functions._

/** Storage lifecycle at scale: schema evolution across parquet batches
  * (readers must keep working as columns appear), and compaction of a
  * small-files directory to bounded file counts/sizes — the two
  * operational chores every long-lived 100 TB table hits. */
class StorageLifecycleSpec extends SparkSpec {
  import sqlImplicits._

  test("mergeSchema reads old+new batches; old rows surface null for added columns") {
    val dir = java.nio.file.Files.createTempDirectory("graft-evo").toString
    Seq((1L, "a"), (2L, "b")).toDF("k", "v")
      .write.parquet(s"$dir/batch=1")
    Seq((3L, "c", 9.5), (4L, "d", 8.0)).toDF("k", "v", "score")
      .write.parquet(s"$dir/batch=2")

    val rd = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(rd.columns.toSet === Set("k", "v", "score", "batch"))
    assert(rd.count() === 4)
    assert(rd.filter(col("batch") === 1)
      .agg(count(col("score"))).head().getLong(0) === 0L) // nulls, not errors
    assert(rd.filter(col("score") > 9).count() === 1L)
  }

  test("JSON-lines round-trip with explicit schema (no inference scan)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-json").toString
    val orders = Tables.load(spark, "/root/testdata/sf0.001", "orders")
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
      .filter(col("o_orderkey") < 300)
    orders.write.json(s"$dir/j")
    // explicit schema: one pass, no sampling job, stable types
    val back = spark.read.schema(orders.schema).json(s"$dir/j")
    assert(back.count() === orders.count())
    assert(back.schema === orders.schema)
    assert(back.agg(round(sum("o_totalprice"), 2)).head().getDouble(0) ===
      orders.agg(round(sum("o_totalprice"), 2)).head().getDouble(0))
  }

  test("compaction: many tiny files rewritten to a bounded file count") {
    val dir = java.nio.file.Files.createTempDirectory("graft-compact").toString
    // simulate a streaming sink's droppings: 32 two-row files. Partition at
    // the SOURCE (range with numPartitions), not via repartition(): a
    // round-robin shuffle is AQE-coalescible, so the fixture file count
    // would depend on advisory sizes rather than being deterministic.
    spark.range(0, 64, 1, 32)
      .write.mode("overwrite").parquet(s"$dir/small")
    def parquetFiles(p: String) =
      new java.io.File(p).listFiles().count(_.getName.endsWith(".parquet"))
    assert(parquetFiles(s"$dir/small") === 32)

    // the compaction pass: read, range-repartition by the sort key so
    // files are both few AND clustered (min/max stats stay selective)
    spark.read.parquet(s"$dir/small")
      .repartitionByRange(2, col("id"))
      .write.mode("overwrite").parquet(s"$dir/compact")
    assert(parquetFiles(s"$dir/compact") === 2)
    // content survives
    assert(spark.read.parquet(s"$dir/compact").agg(sum("id")).head().getLong(0)
      === (0L until 64L).sum)
  }
}
