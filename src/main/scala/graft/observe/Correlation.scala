package graft.observe

import java.util.UUID
import org.apache.logging.log4j.ThreadContext

/** Correlation-ID generation and propagation (reference:
  * `src/utils/correlation.py:22-151` — contextvar-based ID propagation
  * with a logging filter; the dataflow column half lives in
  * `Transforms.withCorrelationId`, T7).
  *
  * Driver-side context uses log4j2's ThreadContext (MDC): every log line
  * emitted inside `withContext` carries the correlation id, so a
  * reconcile run / stream batch can be traced end-to-end across logs and
  * data (the column) with one id.
  */
object Correlation {

  val Key = "correlation_id"

  /** UUIDv4, lowercase canonical — matches the column-side generator. */
  def newId(): String = UUID.randomUUID().toString.toLowerCase

  def currentId: Option[String] = Option(ThreadContext.get(Key))

  /** Run `body` with a correlation id in the logging context; restores
    * any enclosing id afterwards (nestable). */
  def withContext[T](id: String = newId())(body: String => T): T = {
    val previous = Option(ThreadContext.get(Key))
    ThreadContext.put(Key, id)
    try body(id)
    finally previous match {
      case Some(p) => ThreadContext.put(Key, p)
      case None => ThreadContext.remove(Key)
    }
  }
}
