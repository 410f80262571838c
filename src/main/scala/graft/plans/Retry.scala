package graft.plans

import scala.annotation.tailrec

/** Driver-side resilience wrapper (SURVEY.md §2.13: "retry w/ exponential
  * backoff, DLQ, rollback, checkpointing" — the reference's declared
  * error-handling design, cell 18).
  *
  * Retries are DRIVER-side on purpose: a Spark action either commits its
  * sink atomically or fails whole, so re-invoking the action is the unit of
  * retry. (Task-level retries inside a job are Spark's own
  * `spark.task.maxFailures` — not this layer.) Combine with
  * [[ControlTable.runIdempotent]] so a retried batch never double-applies.
  */
object Retry {

  /** Run `body`, retrying up to `maxAttempts` with exponential backoff.
    * Returns Right(result) or, after exhausting attempts, Left(all failures
    * in order) — the dead-letter record for the caller to persist. */
  def withBackoff[A](maxAttempts: Int, initialDelayMs: Long = 100,
      sleep: Long => Unit = Thread.sleep)(body: => A): Either[Seq[Throwable], A] = {
    @tailrec
    def attempt(n: Int, delayMs: Long, failures: Vector[Throwable]): Either[Seq[Throwable], A] = {
      val r =
        try Right(body)
        catch { case e: Exception => Left(e) }
      r match {
        case Right(a) => Right(a)
        case Left(e) if n >= maxAttempts => Left(failures :+ e)
        case Left(e) =>
          sleep(delayMs)
          attempt(n + 1, delayMs * 2, failures :+ e)
      }
    }
    attempt(1, initialDelayMs, Vector.empty)
  }
}
