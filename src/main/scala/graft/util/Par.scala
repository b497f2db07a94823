package graft.util

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

/** Overlap INDEPENDENT Spark job chains from one driver (guide §2.6:
  * actions are only sequential because driver code calls them
  * sequentially). The ingest-family queries run two legs that share no
  * state until a final verdict — the persistent-index ingests and the
  * exact replay — and at bench scale both legs are chains of small jobs
  * that individually leave most cores idle, so running them
  * concurrently converts the sum of the two chains into their max.
  *
  * Semantics are untouched by construction: a leg goes through [[async]]
  * only when no action of the other leg reads state it writes; the
  * caller [[await]]s before the first dependent action. Failures
  * propagate: `await` rethrows the leg's exception on the calling
  * thread.
  *
  * The pool is unbounded-cached and daemon (never blocks JVM exit);
  * threads only ever WAIT on Spark job results, so the pool adds no
  * compute of its own.
  */
object Par {
  private lazy val ec: ExecutionContext =
    ExecutionContext.fromExecutorService(
      java.util.concurrent.Executors.newCachedThreadPool(r => {
        val t = new Thread(r, "graft-par")
        t.setDaemon(true)
        t
      }))

  def async[T](body: => T): Future[T] = Future(body)(ec)

  def await[T](f: Future[T]): T = Await.result(f, Duration.Inf)
}
