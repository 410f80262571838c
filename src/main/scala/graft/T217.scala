package graft
import org.apache.spark.sql.functions._
object T217 {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("t217")
    val dir = "/root/testdata/sf0.1"
    def time(n: String)(f: => Any): Unit = {
      val t0 = System.nanoTime; f
      println(f"$n: ${(System.nanoTime-t0)/1e9}%.2fs") }
    for (q <- Seq("q81_repetition", "q97_gopher_rules", "q217_filter_overlap")) {
      val df = SparkEntry.queries(q)(spark, dir)
      time(s"$q.noop") { df.write.format("noop").mode("overwrite").save() }
      val df2 = SparkEntry.queries(q)(spark, dir)
      time(s"$q.noop_warm") { df2.write.format("noop").mode("overwrite").save() }
    }
    graft.queries.PipelineQueries.clearStages()
    time("doc_features_build") {
      // force through a consumer that rides it
      SparkEntry.queries("q207_dedup_overlap")(spark, dir).count() }
    spark.stop()
  }
}
