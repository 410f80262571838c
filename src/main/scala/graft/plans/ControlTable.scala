package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Batch control table (SURVEY.md §2.13: "idempotency, control table
  * (batch_id, estado), watermarks" — declared in the reference's ETL-design
  * prose, cell 17). A parquet-backed registry of completed batches: a
  * pipeline wrapped in [[runIdempotent]] is skip-if-done, so re-running a
  * failed orchestration never double-applies a batch.
  *
  * The registry append is the transaction boundary: state is recorded ONLY
  * after the batch body returns. A crash mid-body leaves no record, so the
  * retry re-runs the body — the body itself must be idempotent-on-retry
  * (pure transforms + overwrite sinks are; the Upsert operator is by
  * construction). At real scale this table lives in a transactional store;
  * parquet-append is the dependency-free local equivalent.
  */
class ControlTable(spark: SparkSession, path: String) {

  private def exists: Boolean =
    new java.io.File(path).exists()

  def completed(): DataFrame =
    if (exists) spark.read.parquet(path)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("batch_id",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("estado",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("rows_out",
          org.apache.spark.sql.types.LongType))))

  /** NB: an unreadable/corrupted registry THROWS here by design — answering
    * "not done" would re-run (double-apply) every batch behind it. */
  def isDone(batchId: String): Boolean =
    exists && completed()
      .filter(col("batch_id") === batchId && col("estado") === "OK")
      .limit(1).count() > 0

  private def markDone(batchId: String, rowsOut: Long): Unit = {
    import spark.implicits._
    Seq((batchId, "OK", rowsOut)).toDF("batch_id", "estado", "rows_out")
      .write.mode("append").parquet(path)
  }

  /** Run `body` once per batchId: returns Some(rowsOut) when executed,
    * None when skipped because the batch already completed. */
  def runIdempotent(batchId: String)(body: => Long): Option[Long] =
    if (isDone(batchId)) None
    else {
      val rows = body
      markDone(batchId, rows)
      Some(rows)
    }

  /** Run-over-run volume check straight from the registry (closing the
    * loop with [[Drift]]: the control table records WHAT ran and how many
    * rows; this flags a batch whose volume moved beyond `tolerance` vs a
    * reference batch without re-reading any data). None when either batch
    * has no OK record. For the SHAPE of the drift — per-group counts,
    * category mix — run [[Drift.volumeDrift]]/[[Drift.categoryDrift]] on
    * the batch snapshots themselves. */
  def volumeCheck(batchId: String, prevBatchId: String,
      tolerance: Double = 0.3): Option[graft.functions.Quality.VolumeCheck] = {
    // Two concurrent runIdempotent racers can both append an OK record for
    // the same batch; collapse duplicates with max() so the check is
    // deterministic rather than whichever record .toMap kept last.
    val rows = completed()
      .filter(col("estado") === "OK" &&
        col("batch_id").isin(batchId, prevBatchId))
      .groupBy(col("batch_id")).agg(max(col("rows_out")).as("rows_out"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for {
      prev <- rows.get(prevBatchId)
      cur <- rows.get(batchId)
    } yield graft.functions.Quality.volumeDelta(prev, cur, tolerance)
  }
}
