package graft
object ProbeOne {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("probe-one")
    val dir = args(0)
    args.drop(1).foreach { q =>
      val t0 = System.nanoTime()
      try {
        val n = SparkEntry.queries(q)(spark, dir).count()
        println(f"[probeone] $q rows=$n sec=${(System.nanoTime()-t0)/1e9}%.1f")
      } catch { case e: Throwable =>
        println(s"[probeone] $q FAILED: $e")
        e.printStackTrace()
      }
    }
    spark.stop()
  }
}
