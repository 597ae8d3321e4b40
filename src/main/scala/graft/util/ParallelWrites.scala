package graft.util

import java.util.concurrent.Executors
import scala.concurrent.duration.Duration
import scala.concurrent.{Await, ExecutionContext, Future}

/** Bounded-parallel execution of independent per-collection write jobs.
  *
  * The reference drains its middleware buffer through dedicated writer
  * queues (connector/s3/S3DatabaseHandler.java:389-479) rather than one
  * table at a time; here the equivalent is submitting the per-collection
  * Spark write jobs from a small thread pool. The jobs are independent by
  * construction — disjoint sink paths, per-collection manifests,
  * per-attempt Observations — and the driver-side overhead of C
  * sequential job submissions is the one cost local measurements showed
  * growing linearly with collection count. Submission order is preserved,
  * so the caller's largest-first flush policy still front-loads the
  * biggest write under FIFO scheduling.
  *
  * Failure semantics match the sequential loop's barrier contract: every
  * task runs to completion before the first failure is rethrown, so a
  * batch abort never leaves an unsupervised write racing the replay.
  */
object ParallelWrites {
  def run[A, B](items: Seq[A], parallelism: Int)(f: A => B): Seq[B] =
    if (parallelism <= 1 || items.size <= 1) items.map(f)
    else {
      val pool = Executors.newFixedThreadPool(math.min(parallelism, items.size))
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      try {
        // EVERY Throwable is captured inside the task (scala.util.Try only
        // holds NonFatal — a fatal task error would fail the Future and
        // bypass the all-finished barrier), so Future.sequence can only
        // complete after each task ended one way or the other. The one
        // remaining early exit is an interrupt of the AWAITING thread
        // (StreamExecution.stop): pool threads inherit the caller's job
        // group (InheritableThreadLocal local properties), so Spark's
        // group cancellation reaps the in-flight jobs there.
        val done = Await.result(
          Future.sequence(items.map(a => Future(
            try Right(f(a)) catch { case t: Throwable => Left(t) }))),
          Duration.Inf)
        // first failure (submission order) rethrown only after ALL
        // finished; the rest ride along as suppressed so a multi-collection
        // outage keeps every stack trace
        val failures = done.collect { case Left(t) => t }
        failures.headOption.foreach { first =>
          failures.drop(1).filter(_ ne first).foreach(first.addSuppressed)
          throw first
        }
        done.collect { case Right(b) => b }
      } finally pool.shutdown()
    }
}
