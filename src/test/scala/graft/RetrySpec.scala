package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.plans.Retry

class RetrySpec extends AnyFunSuite {

  test("succeeds first try: no sleeps, one attempt") {
    var sleeps = List.empty[Long]
    val r = Retry.withBackoff(3, 100, d => sleeps ::= d) { 42 }
    assert(r === Right(42) && sleeps.isEmpty)
  }

  test("transient failures: backoff doubles, eventually succeeds") {
    var sleeps = List.empty[Long]
    var calls = 0
    val r = Retry.withBackoff(5, 100, d => sleeps ::= d) {
      calls += 1
      if (calls < 3) throw new RuntimeException(s"transient $calls")
      "ok"
    }
    assert(r === Right("ok"))
    assert(sleeps.reverse === List(100L, 200L))
  }

  test("permanent failure: Left carries every attempt's error in order") {
    val r = Retry.withBackoff(3, 1, _ => ()) {
      throw new RuntimeException("always")
    }
    assert(r.isLeft)
    assert(r.left.toOption.get.size === 3)
  }

  test("composes with ControlTable semantics: retried success records once") {
    // retry wraps the idempotent unit; a success after failures yields one value
    var calls = 0
    val r = Retry.withBackoff(4, 1, _ => ()) {
      calls += 1
      if (calls < 4) throw new RuntimeException("flaky")
      calls
    }
    assert(r === Right(4))
  }
}
