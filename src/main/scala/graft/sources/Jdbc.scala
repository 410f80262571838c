package graft.sources

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** S5: JDBC source/sink (SURVEY.md §2.1) — the reference documents (but does
  * not execute) pyodbc/SQLAlchemy access to SQL Server
  * (/root/reference/Seccion_2_Python/ETL_Prueba_Tecnica.ipynb:119-188, cell
  * 13). This is the Spark-native equivalent: `spark.read.jdbc` with
  * partitioned reads and `df.write.jdbc`.
  *
  * Integration-tested against embedded Derby (ships with Spark's jars —
  * see JdbcSpec): replace/append round-trip, range-partitioned parallel
  * read, predicate pushdown into the remote query. The read is
  * partitioned on a numeric column so a cluster pulls N parallel range
  * queries instead of one serial cursor — the detail that matters at
  * scale and that `pd.read_sql` cannot express.
  */
object Jdbc {

  def props(user: String, password: String, driver: String): Properties = {
    val p = new Properties()
    p.setProperty("user", user)
    p.setProperty("password", password)
    p.setProperty("driver", driver)
    p
  }

  /** Partitioned parallel read: `numPartitions` range-sliced queries on
    * `partitionCol` between the given bounds. */
  def read(spark: SparkSession, url: String, table: String,
      partitionCol: String, lowerBound: Long, upperBound: Long,
      numPartitions: Int, connProps: Properties): DataFrame =
    spark.read.jdbc(url, table, partitionCol, lowerBound, upperBound,
      numPartitions, connProps)

  /** Single-query read for small tables (dimension lookups). */
  def readTable(spark: SparkSession, url: String, table: String,
      connProps: Properties): DataFrame =
    spark.read.jdbc(url, table, connProps)

  /** Write with the reference's `if_exists='replace'` semantics
    * (`to_sql(..., if_exists='replace')` → `SaveMode.Overwrite`). */
  def writeReplace(df: DataFrame, url: String, table: String,
      connProps: Properties): Unit =
    df.write.mode(SaveMode.Overwrite).jdbc(url, table, connProps)

  /** Append-load (the staging-table shape used before an UPSERT merge). */
  def writeAppend(df: DataFrame, url: String, table: String,
      connProps: Properties): Unit =
    df.write.mode(SaveMode.Append).jdbc(url, table, connProps)
}
