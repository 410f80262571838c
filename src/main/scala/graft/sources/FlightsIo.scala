package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** CSV ingestion for the reference's flights data (SURVEY.md §2.1 S1–S4).
  *
  * The reference's only input format is CSV in two dialects:
  *  - v2 files (`Seccion_2_Python/flights_{10000,5000}v2.csv`): `;`-separated,
  *    UTF-8 BOM, and `flights_5000v2.csv` has a CORRUPT header row (position 6
  *    named `Col_7`, 16 named `Col_17`, 18 named `Col_13` — see
  *    `flights_5000v2.csv:1`). The reference repairs it by overriding names
  *    positionally (`ETL_Prueba_Tecnica.ipynb:44`).
  *  - section-3 files (`Seccion_3_SQL/flights_{5000,10000}.csv`):
  *    `,`-separated, UTF-8 BOM, clean headers (`seccion3_sql.sql:92-108`).
  *
  * Spark-first port: supply the 19×StringType schema explicitly and set
  * `header=true` — with an explicit schema Spark *skips* the header line and
  * ignores its (possibly corrupt) names entirely, which is precisely the
  * reference's repair. The BOM sits on the skipped header line, so no
  * special handling is needed. Everything is read as nullable StringType
  * because the data is untyped and mixed-format (e.g. `Col_4` holds "998E");
  * numeric meaning is applied downstream with try_cast (SURVEY.md §1.2).
  *
  * Scale: `spark.read.csv` is a distributed scan (each file split is a task);
  * the same code reads a directory of thousands of CSVs on a cluster — the
  * Spark equivalent of the reference's server-side COPY fast path (S3).
  */
object FlightsIo {

  val columns: Seq[String] = (1 to 19).map(i => s"Col_$i")

  val schema: StructType =
    StructType(columns.map(c => StructField(c, StringType, nullable = true)))

  /** S1/S2: v2 dialect — `;`-separated, BOM, header skipped (repairs the
    * corrupt names in flights_5000v2.csv). */
  def readV2(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(schema)
      .option("header", "true")
      .option("sep", ";")
      .csv(path)

  /** S3: section-3 dialect — `,`-separated, BOM, clean headers (still
    * skipped; the explicit schema is the single source of truth). */
  def readSection3(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(schema)
      .option("header", "true")
      .option("sep", ",")
      .csv(path)

  /** S1 as a stream: monitor a directory for arriving v2-dialect CSV files
    * (the reference's declared file-arrival ingestion, SURVEY.md §2.12) —
    * same schema-override header repair as [[readV2]], incremental batches
    * bounded by maxFilesPerTrigger. */
  def streamV2(spark: SparkSession, dir: String,
      maxFilesPerTrigger: Int = 10): DataFrame =
    spark.readStream
      .schema(schema)
      .option("header", "true")
      .option("sep", ";")
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .csv(dir)

  /** Tag a source with dedup priority and an intra-file sequence so
    * keep-first dedup is deterministic (SURVEY.md §2.4 D2: pandas
    * `keep='first'` depends on physical row order — here the order is an
    * explicit column). `monotonically_increasing_id` puts the partition
    * index in the high bits and the row-in-partition in the low bits, and
    * CSV splits of one file are sequential byte ranges, so sorting by it
    * reproduces file order. */
  def withIngestOrder(df: DataFrame, priority: Int): DataFrame =
    df.withColumn("source_priority", lit(priority))
      .withColumn("ingest_seq", monotonically_increasing_id())

  /** S4: CSV sink matching the reference's export
    * (`ETL_Prueba_Tecnica.ipynb:116`): header, `,`-separated, UTF-8 with
    * BOM (`utf-8-sig`, so Excel on Windows opens it cleanly), empty strings
    * written bare (pandas style) rather than quoted. Writes a single file:
    * `outFile` is a real file path, not a directory.
    *
    * Single-file CSV is inherently a driver-side convenience (the reference's
    * consumers are Excel/pandas); at scale callers write the distributed
    * form instead (`df.write.csv(dir)` — same options, no coalesce). */
  def writeCsvUtf8Sig(df: DataFrame, outFile: String): Unit = {
    val tmp = outFile + ".spark-tmp"
    df.coalesce(1)
      .write.mode("overwrite")
      .option("header", "true")
      .option("emptyValue", "")
      // Spark's CSV writer trims leading/trailing chars <= 0x20 by default
      // (univocity), which would strip control bytes (e.g. \x02) that the
      // reference's pandas export preserves verbatim.
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .csv(tmp)
    val dir = new java.io.File(tmp)
    val part = dir.listFiles().find(_.getName.startsWith("part-")).get
    val out = new java.io.FileOutputStream(outFile)
    try {
      out.write(Array[Byte](0xEF.toByte, 0xBB.toByte, 0xBF.toByte)) // BOM
      java.nio.file.Files.copy(part.toPath, out)
    } finally out.close()
    dir.listFiles().foreach(_.delete())
    dir.delete()
  }
}
