package graft

/** Dev utility: time one named query at a given SF dir (warm JVM, N
  * passes) — `sbt "Test/runMain graft.TimeOne <query> [sfDir] [passes]"`.
  * Keeps perf iteration off the full Bench loop. */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val passes = if (args.length > 2) args(2).toInt else 3
    val spark = Sessions.local("graft-timeone")
    val q = SparkEntry.queries(name)
    (1 to passes).foreach { p =>
      graft.queries.PipelineQueries.clearStages()
      spark.sparkContext.setJobGroup(name, name)
      val t0 = System.nanoTime()
      val n = q(spark, dir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"PASS $p: $name rows=$n $sec%.3f s")
    }
    spark.stop()
  }
}
