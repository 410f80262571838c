package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.functions.Urls

/** The ingest-side cleaning layer runs INCREMENTALLY: markup-stripped
  * link extraction is stateless (pure projection — trivially streamable),
  * and the per-domain outlink counts it feeds are maintained in update
  * mode across micro-batches, converging to the batch extraction over
  * the same pages. A crawl frontier can therefore rank domains live
  * while pages arrive, instead of re-scanning the crawl per report. */
class StreamingCleaningSpec extends SparkSpec {
  import sqlImplicits._

  private def page(id: Long, host: String): (Long, String) =
    (id, s"""<p>x</p><a href="https://$host/p/$id?utm_s=1&a=1">t</a>""" +
      (if (id % 2 == 0) s"""<a href="/rel$id">r</a>""" else ""))

  test("streaming link extraction + per-domain counts converge to the " +
    "batch edge list") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val links = Urls.extractLinks(in.toDF().toDF("doc_id", "html"),
      "doc_id", "html")
    val counts = links.groupBy(col("domain"))
      .agg(count(lit(1)).as("n_links"))
    val q = counts.writeStream.format("memory").queryName("linkmon")
      .outputMode("complete").start()
    val b1 = Seq(page(1, "a.Example.com"), page(2, "b.example.com"),
      page(3, "News.Other.org"))
    val b2 = Seq(page(4, "a.example.com"), page(5, "news.other.ORG"),
      page(6, "c.example.com"))
    try {
      in.addData(b1: _*)
      q.processAllAvailable()
      in.addData(b2: _*)
      q.processAllAvailable()
      val streamed = spark.table("linkmon").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap

      val batch = Urls.extractLinks((b1 ++ b2).toDF("doc_id", "html"),
        "doc_id", "html")
        .groupBy(col("domain")).agg(count(lit(1)).as("n_links"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

      assert(streamed === batch)
      // host case folds into one registered domain; relative links never
      // reach the counts
      assert(streamed === Map("example.com" -> 4L, "other.org" -> 2L))
    } finally q.stop()
  }
}
