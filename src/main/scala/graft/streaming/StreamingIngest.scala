package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.StructType

import graft.operators.Upsert

/** Structured Streaming realization of the reference's *declared* incremental
  * design (SURVEY.md §2.12–2.13: watermark-based incremental extraction,
  * file-arrival detection on monitored folders, staged idempotent UPSERT
  * load — /root/reference/Seccion_2_Python/ETL_Prueba_Tecnica.ipynb cells
  * 16–18, prose only; this module is the parity-plus implementation).
  *
  * Shapes:
  *  - file-arrival source with `maxFilesPerTrigger` (bounded incremental
  *    batches — the reference's "monitored folder");
  *  - event-time watermark + `dropDuplicatesWithinWatermark` (idempotent
  *    ingest under at-least-once delivery, with bounded state — plain
  *    `dropDuplicates` on a stream would grow state forever);
  *  - windowed aggregation with late-data handling;
  *  - `foreachBatch` UPSERT into a parquet target via the same
  *    [[graft.operators.Upsert]] used in batch (write-then-swap for
  *    atomicity, as SURVEY.md §2.13's staged-load row prescribes).
  *
  * Scale notes: state stores shard by the grouping key across executors;
  * the watermark bounds their size. The foreachBatch upsert re-reads the
  * target per micro-batch — at real scale the target would be a Delta/
  * Iceberg table with MERGE; core-Spark parquet is the dependency-free
  * equivalent with the same dataflow.
  */
object StreamingIngest {

  /** File-arrival source: pick up new parquet files dropped into `dir`,
    * at most `maxFilesPerTrigger` per micro-batch. */
  def fileSource(spark: SparkSession, schema: StructType, dir: String,
      maxFilesPerTrigger: Int = 10): DataFrame =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(dir)

  /** Idempotent-ingest dedup: drop key duplicates arriving within the
    * watermark horizon. State is bounded by the watermark (old keys age
    * out), unlike stream `dropDuplicates`. */
  def dedupedWithinWatermark(df: DataFrame, tsCol: String, watermark: String,
      keys: Seq[String]): DataFrame =
    df.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keys)

  /** Tumbling-window event counts with late-data tolerance `watermark` —
    * the streaming form of the A5 frequency table. */
  def windowedCounts(df: DataFrame, tsCol: String, watermark: String,
      windowLen: String, keyCol: String): DataFrame =
    df.withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen), col(keyCol))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("win_start"),
        col("window.end").as("win_end"), col(keyCol), col("cnt"))

  /** Session-window counts: the streaming realization of the batch
    * [[graft.operators.Sessionize]] operator. `session_window` merges
    * events whose start falls strictly inside the previous window
    * (prev + gap); the batch operator's `t - prev > gap` boundary is the
    * same partition of the timeline except for events at EXACTLY prev+gap
    * (streaming opens a new session, batch does not) — timestamps at µs
    * resolution make that tie measure-zero. State is per (key, open
    * session) and the watermark closes sessions, bounding the store. */
  def sessionCounts(df: DataFrame, tsCol: String, watermark: String,
      gap: String, keyCol: String): DataFrame =
    df.withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap), col(keyCol))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("t_start"),
        col("session_window.end").as("t_end"), col(keyCol), col("n_events"))

  /** Stream-stream inner join with an event-time proximity bound: left
    * rows match right rows of the same key whose time is in
    * [leftTime - lookback, leftTime]. BOTH sides need watermarks — that is
    * what lets the engine discard buffered state once no counterpart can
    * arrive; without the time bound the join state grows forever. The
    * range condition doubles as the state-retention contract: right rows
    * older than watermark + lookback are dropped.
    *
    * Column names must be disjoint across the two sides (standard Spark
    * stream-join constraint; rename upstream). */
  def withinJoin(left: DataFrame, leftKey: String, leftTs: String,
      leftWatermark: String, right: DataFrame, rightKey: String,
      rightTs: String, rightWatermark: String, lookback: String): DataFrame = {
    val l = left.withWatermark(leftTs, leftWatermark)
    val r = right.withWatermark(rightTs, rightWatermark)
    l.join(r, col(leftKey) === col(rightKey) &&
      col(rightTs) >= col(leftTs) - expr(s"INTERVAL $lookback") &&
      col(rightTs) <= col(leftTs))
  }

  /** Emitted by [[runningCounts]]: the running event total for a key. */
  case class KeyCount(key: String, total: Long)

  /** Custom keyed state via `flatMapGroupsWithState`: a running per-key
    * event counter. With `idleTimeout = Some(d)` idle keys expire after d,
    * bounding the state store by the *active* key set — but the timeout
    * makes the engine schedule continuous cleanup triggers, so
    * `processAllAvailable` never settles (use in always-on deployments
    * only). `None` (default) uses NoTimeout: state is bounded by the
    * all-time key set, and the query quiesces between batches. State
    * shards by key across executors; each micro-batch touches only the
    * keys it contains. */
  def runningCounts(events: Dataset[(String, Long)],
      idleTimeout: Option[String] = None): Dataset[KeyCount] = {
    import events.sparkSession.implicits._
    val timeoutConf = idleTimeout
      .map(_ => GroupStateTimeout.ProcessingTimeTimeout)
      .getOrElse(GroupStateTimeout.NoTimeout)
    events.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, timeoutConf) {
        (key: String, rows: Iterator[(String, Long)], state: GroupState[Long]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val total = state.getOption.getOrElse(0L) + rows.size
            state.update(total)
            idleTimeout.foreach(state.setTimeoutDuration)
            Iterator.single(KeyCount(key, total))
          }
      }
  }

  /** foreachBatch UPSERT sink: each micro-batch merges into the parquet at
    * `targetPath` by `key` (new rows win), writing to a temp dir first and
    * swapping — the batch Upsert operator reused unchanged, which is the
    * point: one merge semantics for batch and streaming. */
  def upsertSink(stream: DataFrame, key: String, targetPath: String,
      checkpointDir: String): DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val target = new java.io.File(targetPath)
        val merged =
          if (target.exists())
            Upsert.upsert(spark.read.parquet(targetPath), batch, key)
          else batch
        val tmp = targetPath + ".tmp"
        merged.write.mode("overwrite").parquet(tmp)
        // swap: atomic enough for a local target; real deployments use a
        // transactional table format here
        val fs = org.apache.hadoop.fs.FileSystem.get(
          spark.sparkContext.hadoopConfiguration)
        val dst = new org.apache.hadoop.fs.Path(targetPath)
        fs.delete(dst, true)
        fs.rename(new org.apache.hadoop.fs.Path(tmp), dst)
        ()
      }
}
