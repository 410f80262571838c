package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.StreamingIngest

/** flatMapGroupsWithState running counts: totals accumulate across
  * micro-batches, only touched keys emit per batch. */
class StatefulStreamingSpec extends SparkSpec {
  import sqlImplicits._

  test("runningCounts accumulates per-key state across micro-batches") {
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(String, Long)]
    val counts = StreamingIngest.runningCounts(mem.toDS())
    val q = counts.writeStream.format("memory").queryName("rc")
      .outputMode("update").start()
    try {
      mem.addData(("a", 1L), ("a", 2L), ("b", 3L))
      q.processAllAvailable()
      val batch1 = spark.table("rc")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(batch1 === Map("a" -> 2L, "b" -> 1L))

      mem.addData(("a", 4L), ("c", 5L))
      q.processAllAvailable()
      // update mode appends the new emissions; latest per key is the total
      val latest = spark.table("rc")
        .collect().map(r => r.getString(0) -> r.getLong(1))
        .groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
      assert(latest === Map("a" -> 3L, "b" -> 1L, "c" -> 1L))
    } finally q.stop()
  }
}
