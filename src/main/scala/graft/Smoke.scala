package graft

/** Driver-contract smoke: `SparkEntry.entry` on sf0.001 must return rows.
  * Prints ONE line `SMOKE_ROWS=<n>` and exits nonzero on an empty result. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("graft-smoke")
    val n = SparkEntry.entry(spark).count()
    println(s"SMOKE_ROWS=$n")
    spark.stop()
    if (n <= 0) sys.exit(1)
  }
}
