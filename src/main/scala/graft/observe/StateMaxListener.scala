package graft.observe

import org.apache.spark.sql.streaming.StreamingQueryListener

/** Per-query maxima of state-store keys/bytes across EVERY micro-batch
  * of a run — the state-bound telemetry [[graft.ops.SessionCensusCli]]
  * prints after each drain and `graft.ScaleBench`'s decade probes
  * record next to their walls.
  *
  * Why a listener and not `query.recentProgress`: recentProgress is a
  * ring buffer of `spark.sql.streaming.numRecentProgressUpdates`
  * (default 100) entries, so a drain of 300 one-file micro-batches read
  * back through it silently forgets the first 200 — exactly where a
  * mid-run state peak can live. The listener sees every progress event
  * as it happens and folds the max immediately.
  *
  * The listener bus is ASYNC: the last trigger's event can land after
  * `awaitTermination` returns. Call [[settle]] (bounded poll, outside
  * any timed window) before reading. */
final class StateMaxListener extends StreamingQueryListener {
  private val maxima =
    scala.collection.concurrent.TrieMap.empty[String, (Long, Long)]
  @volatile private var events = 0L

  override def onQueryStarted(
      e: StreamingQueryListener.QueryStartedEvent): Unit = ()
  override def onQueryTerminated(
      e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
  override def onQueryProgress(
      e: StreamingQueryListener.QueryProgressEvent): Unit = {
    events += 1
    val p = e.progress
    val sos = Option(p.stateOperators).toSeq.flatten
    if (sos.nonEmpty) {
      val name = Option(p.name).getOrElse(p.id.toString)
      val k = sos.map(_.numRowsTotal).max
      val b = sos.map(_.memoryUsedBytes).max
      maxima.updateWith(name) {
        case Some((pk, pb)) => Some((math.max(pk, k), math.max(pb, b)))
        case None => Some((k, b))
      }
    }
  }

  /** (max keys in state, max provider-reported bytes) seen for the
    * named query, if any of its batches carried state operators. */
  def maxFor(name: String): Option[(Long, Long)] = maxima.get(name)

  /** Every per-query maximum observed (query name — or id when
    * unnamed — → (keys, bytes)); empty when no batch of any query
    * carried state operators. Lets a launcher whose queries are
    * unnamed ([[graft.ops.CdcReplicateCli]]) report its state bounds
    * without threading query handles through. */
  def all: Map[String, (Long, Long)] = maxima.toMap

  /** Bounded wait for the async listener bus to drain. */
  def settle(): Unit = ListenerDrain.settle(() => events)
}

/** The ONE bounded listener-bus drain (graft.Bench's BatchTimes and
  * [[StateMaxListener]] share it): Spark's StreamingQueryListener bus
  * is async and the last trigger's event can land after
  * `awaitTermination`, so readers spin while the counter still moves —
  * 100 ms polls, ~2 s cap. Changing the drain bound changes it
  * everywhere. */
object ListenerDrain {
  def settle(events: () => Long): Unit = {
    var last = -1L
    var spins = 0
    while (events() != last && spins < 20) {
      last = events()
      Thread.sleep(100)
      spins += 1
    }
  }
}
