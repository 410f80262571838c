package graft

import graft.queries.PipelineQueries

/** Persisted-stage cache lifecycle: keyed by applicationId, foreign-app
  * entries (necessarily from stopped contexts — one live SparkContext per
  * JVM) are evicted on access, so nothing leaks across sessions. */
class StageCacheSpec extends SparkSpec {
  import sqlImplicits._

  test("stage cache keys by applicationId and evicts stopped-app entries") {
    PipelineQueries.clearStages()
    // seed an entry as if left behind by a previous, stopped application
    PipelineQueries.stages.put(("dead-app", "/dir", "postings"), Seq(1).toDF("x"))
    // any staged query touched from the live app evicts the foreign entry
    PipelineQueries.queries("q27_minhash_neardup")(spark, "/root/testdata/sf0.001")
      .count()
    val app = spark.sparkContext.applicationId
    assert(!PipelineQueries.stages.keys.exists(_._1 == "dead-app"))
    assert(PipelineQueries.stages.nonEmpty)
    assert(PipelineQueries.stages.keys.forall(_._1 == app))
    PipelineQueries.clearStages()
  }
}
