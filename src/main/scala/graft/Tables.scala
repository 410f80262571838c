package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated testdata tables (see TESTDATA.md).
  *
  * Each table is a single parquet file under `sfDir`. At 100 TB these would be
  * partitioned directories; `spark.read.parquet` handles both shapes, and all
  * downstream operators avoid assumptions about partition count (filters and
  * projections are declared on the scan so Catalyst pushes them into the
  * parquet reader — verify with `.explain`: `PushedFilters`, `ReadSchema`).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    // events.ts contract: epoch-NANOS LongType, whatever the generator
    // wrote. TIMESTAMP(NANOS) testdata already surfaces as that long (the
    // nanosAsLong session flag); TIMESTAMP(MICROS) testdata arrives as
    // (NTZ) TimestampType and is normalized here — the session timezone is
    // pinned to UTC, so the cast is the identity instant and `epoch nanos
    // DIV 1000` equals DuckDB's epoch_us(ts) exactly, either way.
    if (name == "events" &&
        df.schema("ts").dataType != org.apache.spark.sql.types.LongType)
      df.withColumn("ts",
        org.apache.spark.sql.functions.expr(
          "unix_micros(cast(ts AS timestamp)) * 1000L"))
    else df
  }

  /** Register every table as a temp view so `spark.sql` mirrors the DuckDB
    * oracle's naming exactly. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
