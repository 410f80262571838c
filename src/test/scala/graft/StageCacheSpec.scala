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

  test("a consumer whose action throws does not poison the cached stage " +
    "for its siblings") {
    PipelineQueries.clearStages()
    var builds = 0
    def staged() = PipelineQueries.stage(spark, "/spec", "shared") {
      builds += 1
      Seq(1, 2, 3).toDF("x")
    }
    // consumer 1: the stage materializes, then the consumer's own action
    // fails downstream of it
    intercept[Exception] {
      staged().select(org.apache.spark.sql.functions.raise_error(
        org.apache.spark.sql.functions.lit("consumer boom"))).collect()
    }
    // sibling: reads the SAME cached stage (no rebuild) and is correct
    assert(staged().as[Int].collect().sorted.toSeq === Seq(1, 2, 3))
    assert(builds === 1, "failed consumer must not evict or rebuild the stage")
    PipelineQueries.clearStages()
  }

  test("a build that throws inserts nothing — the next consumer retries " +
    "and succeeds") {
    PipelineQueries.clearStages()
    var attempts = 0
    def flaky() = PipelineQueries.stage(spark, "/spec", "flaky") {
      attempts += 1
      if (attempts == 1) sys.error("transient build failure")
      Seq(42).toDF("x")
    }
    intercept[RuntimeException](flaky())
    assert(!PipelineQueries.stages.keys.exists(_._3 == "flaky"),
      "a throwing build must leave no dead entry behind")
    assert(flaky().as[Int].head() === 42)
    assert(attempts === 2)
    PipelineQueries.clearStages()
  }
}
