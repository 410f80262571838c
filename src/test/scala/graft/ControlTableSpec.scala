package graft

import graft.plans.ControlTable

/** Idempotent-batch registry: run-once semantics, skip-if-done, state
  * survives a new ControlTable instance (parquet-backed). */
class ControlTableSpec extends SparkSpec {

  test("runIdempotent executes once per batch_id and skips re-runs") {
    val path = java.nio.file.Files.createTempDirectory("graft-ctl")
      .resolve("control").toString
    val ctl = new ControlTable(spark, path)
    var executions = 0

    val first = ctl.runIdempotent("batch-2026-01-01") { executions += 1; 42L }
    assert(first === Some(42L) && executions === 1)

    val second = ctl.runIdempotent("batch-2026-01-01") { executions += 1; 99L }
    assert(second === None, "completed batch must be skipped")
    assert(executions === 1)

    // a different batch id runs
    assert(ctl.runIdempotent("batch-2026-01-02") { executions += 1; 7L } === Some(7L))
    assert(executions === 2)

    // a NEW instance over the same path sees the completed state
    val ctl2 = new ControlTable(spark, path)
    assert(ctl2.isDone("batch-2026-01-01"))
    assert(ctl2.runIdempotent("batch-2026-01-01") { executions += 1; 0L } === None)
    assert(executions === 2)
    assert(ctl2.completed().count() === 2L)
  }

  test("volumeCheck flags a registry-recorded volume jump, None when unrecorded") {
    val path = java.nio.file.Files.createTempDirectory("graft-ctl-vol")
      .resolve("control").toString
    val ctl = new ControlTable(spark, path)
    ctl.runIdempotent("b1") { 1000L }
    ctl.runIdempotent("b2") { 1200L }   // +20% — within ±30%
    ctl.runIdempotent("b3") { 2000L }   // +67% vs b2 — drift
    assert(ctl.volumeCheck("b2", "b1").exists(_.ok))
    val jump = ctl.volumeCheck("b3", "b2")
    assert(jump.exists(!_.ok))
    assert(jump.exists(c => math.abs(c.delta - 2000.0 / 1200 + 1) < 1e-9))
    assert(ctl.volumeCheck("b3", "never-ran").isEmpty)
  }

  test("a failed body leaves no record — the retry re-runs it") {
    val path = java.nio.file.Files.createTempDirectory("graft-ctl2")
      .resolve("control").toString
    val ctl = new ControlTable(spark, path)
    intercept[RuntimeException] {
      ctl.runIdempotent("b1") { throw new RuntimeException("boom") }
    }
    assert(!ctl.isDone("b1"))
    assert(ctl.runIdempotent("b1") { 5L } === Some(5L), "retry must execute")
  }
}
