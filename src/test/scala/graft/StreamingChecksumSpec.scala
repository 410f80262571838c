package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.{Layout, NearDup}

/** Continuous form of the loader-shard integrity card (q258/q262's
  * fingerprints): appended manifest rows (a nightly admit packs new
  * bins past the current tail) stream in, and the per-part state —
  * row/token counts, [first, last] position range and the
  * XOR-of-md5(pos:key) fingerprint — is maintained by ONE grouped
  * merge per micro-batch, because every column is a commutative fold
  * (count/sum/min/max/XOR) over FIXED-WIDTH parts (an append only
  * touches the tail part; earlier parts' membership is a pure function
  * of pos).
  *
  * The batchId guard matters MORE here than for additive counters: a
  * replayed batch doesn't just double-count — XOR TOGGLES, so replay
  * silently cancels the replayed rows out of the fingerprint and the
  * card reads clean while being wrong. The spec pins the toggle and
  * the guard. */
class StreamingChecksumSpec extends SparkSpec {
  import sqlImplicits._

  // three appends of an epoch-order manifest: positions arrive in
  // order, each batch extends the tail (partSize 4 → parts p0..p2)
  private val batches: Seq[Seq[(Long, Long, Long, Long)]] = Seq(
    (1 to 4).map(i => (i.toLong, i.toLong % 3, i.toLong, 10L + i)),
    (5 to 9).map(i => (i.toLong, i.toLong % 3, i.toLong, 10L + i)),
    (10 to 11).map(i => (i.toLong, i.toLong % 3, i.toLong, 10L + i)))

  private def manifestDf(rows: Seq[(Long, Long, Long, Long)]) =
    rows.toDF("pos", "shard", "bin", "n_tokens")

  private def oneShot(rows: Seq[(Long, Long, Long, Long)]) =
    Layout.shardFingerprintsFixed(manifestDf(rows), "pos",
      concat_ws(":", col("shard"), col("bin")), "n_tokens", partSize = 4L)

  /** The per-part merge state a night maintains (no ~release row — the
    * release row is a fold of the parts, derived at read time). */
  private def fold(df: org.apache.spark.sql.DataFrame) =
    df.groupBy(col("part")).agg(
      sum(col("n_rows")).as("n_rows"), sum(col("n_tokens")).as("n_tokens"),
      min(col("first_pos")).as("first_pos"),
      max(col("last_pos")).as("last_pos"),
      expr("bit_xor(fp)").as("fp"))

  test("foreachBatch per-part XOR/min/max/sum state converges to the " +
      "one-shot fixed-width card, appends only touch the tail part, " +
      "and a replayed batch is a no-op (unguarded XOR would TOGGLE)") {
    implicit val ctx = spark.sqlContext
    var store = Seq.empty[(Long, Long, Long, Long, Long, Long)]
      .toDF("part", "n_rows", "n_tokens", "first_pos", "last_pos", "fp")
      .localCheckpoint(true)
    var lastApplied = -1L
    var touched = Seq.empty[Set[Long]]
    val merge = (batch: org.apache.spark.sql.DataFrame, batchId: Long) => {
      if (batchId > lastApplied) {
        val delta = batch
          .withColumn("part", expr("(pos - 1) div 4"))
          .withColumn("fp", NearDup.md5Hash60(concat_ws(":", col("pos"),
            concat_ws(":", col("shard"), col("bin")))))
          .groupBy(col("part")).agg(count(lit(1)).as("n_rows"),
            sum(col("n_tokens")).as("n_tokens"),
            min(col("pos")).as("first_pos"), max(col("pos")).as("last_pos"),
            expr("bit_xor(fp)").as("fp"))
        touched = touched :+ delta.select(col("part")).collect()
          .map(_.getLong(0)).toSet
        store = fold(store.unionByName(delta)).localCheckpoint(true)
        lastApplied = batchId
      }
      ()
    }
    val in = MemoryStream[(Long, Long, Long, Long)]
    val q = in.toDF().toDF("pos", "shard", "bin", "n_tokens").writeStream
      .foreachBatch(merge)
      .start()
    try {
      batches.foreach { rows =>
        in.addData(rows: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    // each append touched only parts at/after the previous tail
    assert(touched.length === 3)
    assert(touched(0) === Set(0L) && touched(1) === Set(1L, 2L) &&
      touched(2) === Set(2L),
      s"appends must only touch the tail part(s): $touched")
    // the maintained parts equal the one-shot card's part rows
    val got = store
      .select(format_string("p%06d", col("part")).as("part"),
        col("n_rows"), col("n_tokens"), col("first_pos"), col("last_pos"),
        col("fp"))
      .collect().map(_.toSeq).toSet
    val want = oneShot(batches.flatten)
      .filter(col("part") =!= "~release")
      .collect().map(_.toSeq).toSet
    assert(got === want,
      "streamed per-part state must equal the one-shot fingerprints")
    // guarded replay: a re-delivered batchId changes nothing
    val before = store.collect().toSet
    merge(manifestDf(batches.last), lastApplied)
    assert(store.collect().toSet === before)
    // the guard is load-bearing: an UNGUARDED replay toggles the
    // replayed rows out of the XOR and the tail fingerprint silently
    // reads as the pre-append state
    val replayDelta = manifestDf(batches.last)
      .withColumn("part", expr("(pos - 1) div 4"))
      .withColumn("fp", NearDup.md5Hash60(concat_ws(":", col("pos"),
        concat_ws(":", col("shard"), col("bin")))))
      .groupBy(col("part")).agg(count(lit(1)).as("n_rows"),
        sum(col("n_tokens")).as("n_tokens"),
        min(col("pos")).as("first_pos"), max(col("pos")).as("last_pos"),
        expr("bit_xor(fp)").as("fp"))
    val unguarded = fold(store.unionByName(replayDelta))
    val tailFpTwice = unguarded.filter(col("part") === 2L)
      .head().getAs[Long]("fp")
    val tailFpOnce = store.filter(col("part") === 2L)
      .head().getAs[Long]("fp")
    assert(tailFpTwice !== tailFpOnce,
      "replaying a batch into the XOR must visibly corrupt the state " +
        "this spec guards against")
  }
}
