package graft
import graft.queries.{CoreQueries, PipelineQueries}
object PlanDebug {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("plan")
    val dir = "/root/testdata/sf0.001"
    for (q <- Seq("q01_scan_filter_project", "q07_semi_join", "q13_group_agg")) {
      println(s"=== $q"); println(CoreQueries.queries(q)(spark, dir).queryExecution.executedPlan.toString.take(2500))
    }
    for (q <- Seq("q19_email_validity", "q29_cosine_topk")) {
      println(s"=== $q"); println(PipelineQueries.queries(q)(spark, dir).queryExecution.executedPlan.toString.take(2200))
    }
    spark.stop()
  }
}
