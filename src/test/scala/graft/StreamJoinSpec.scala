package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamingIngest

/** Stream-stream event-time join: clicks pick up errors of the same user
  * within a 10-minute lookback — watermarks on both sides bound the join
  * state. */
class StreamJoinSpec extends SparkSpec {
  import sqlImplicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("stream-static join enriches each micro-batch against a broadcast dim") {
    implicit val ctx = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("uid", "tier")
    val ev = MemoryStream[(Timestamp, Long)]
    val enriched = ev.toDF().toDF("ts", "uid")
      .join(broadcast(dim), Seq("uid"), "left")
    val q = enriched.writeStream.format("memory").queryName("enr")
      .outputMode("append").start()
    try {
      ev.addData((ts("2026-01-01 00:00:01"), 1L), (ts("2026-01-01 00:00:02"), 3L))
      q.processAllAvailable()
      val got = spark.table("enr").select("uid", "tier").collect()
        .map(r => (r.getLong(0), Option(r.getString(1)))).toSet
      assert(got === Set((1L, Some("gold")), (3L, None)))
    } finally q.stop()
  }

  test("withinJoin matches same-key rows inside the lookback only") {
    implicit val ctx = spark.sqlContext
    val clicks = MemoryStream[(Timestamp, Long, String)]
    val errors = MemoryStream[(Timestamp, Long, String)]
    val joined = StreamingIngest.withinJoin(
      clicks.toDF().toDF("cts", "cuid", "page"), "cuid", "cts", "1 minute",
      errors.toDF().toDF("ets", "euid", "code"), "euid", "ets", "1 minute",
      lookback = "10 minutes")
    val q = joined.writeStream.format("memory").queryName("sj")
      .outputMode("append").start()
    try {
      errors.addData(
        (ts("2026-01-01 00:00:00"), 1L, "E1"),   // 5 min before click: match
        (ts("2026-01-01 00:20:00"), 1L, "E2"),   // after the click: no match
        (ts("2026-01-01 00:01:00"), 2L, "E3"))   // other user
      clicks.addData(
        (ts("2026-01-01 00:05:00"), 1L, "/home"),
        (ts("2026-01-01 00:30:00"), 2L, "/buy")) // 29 min after E3: outside
      q.processAllAvailable()
      val got = spark.table("sj")
        .select("cuid", "page", "code").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
      assert(got === Set((1L, "/home", "E1")))
    } finally q.stop()
  }
}
