package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Skew

/** The governance layer runs INCREMENTALLY: per-key counts maintained in
  * update mode across micro-batches converge to exactly what the batch
  * skew report computes over the same data — so a 100 TB pipeline can
  * watch its key distribution drift live instead of re-scanning the
  * corpus per report. */
class StreamingGovernanceSpec extends SparkSpec {
  import sqlImplicits._

  test("streaming per-key counts converge to the batch skew report") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[String]
    val counts = in.toDF().toDF("k")
      .groupBy(col("k")).agg(count(lit(1)).as("cnt"))
    val q = counts.writeStream.format("memory").queryName("skmon")
      .outputMode("complete").start()
    val batch1 = Seq.fill(40)("hot") ++ Seq("a", "b", "c")
    val batch2 = Seq.fill(40)("hot") ++ Seq("a", "d")
    try {
      in.addData(batch1: _*)
      q.processAllAvailable()
      in.addData(batch2: _*)
      q.processAllAvailable()
      val streamed = spark.table("skmon").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap

      // the batch report over the union of everything that streamed
      val report = Skew.skewReport((batch1 ++ batch2).toDF("k"), col("k"),
        topK = 10, heavyDen = 2L, skewFactor = 2L)
        .collect().map(r => (r.getString(0), r.getLong(1),
          r.getBoolean(4), r.getBoolean(5))).toList

      // counts agree exactly key-for-key
      report.foreach { case (k, cnt, _, _) => assert(streamed(k) == cnt) }
      assert(streamed.values.sum == (batch1.size + batch2.size).toLong)
      // and the verdicts read correctly off the converged counts:
      // hot = 80/85 rows (heavy + skewed), the singletons neither
      val hot = report.find(_._1 == "hot").get
      assert(hot._2 == 80L && hot._3 && hot._4)
      assert(report.filter(_._1 != "hot").forall(r => !r._3 && !r._4))
    } finally q.stop()
  }
}
