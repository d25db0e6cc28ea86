package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._

/** Session-level streaming-progress collector (r10 judge stretch #8).
  *
  * BENCH_DETAILS records shuffle bytes per entry for batch plans; the
  * number a streaming deployment actually pages on is STATE — peak state
  * rows/bytes per query — plus where the micro-batch wall-clock goes
  * (addBatch vs WAL/offset bookkeeping). A single
  * [[StreamingQueryListener]] covers every query the session runs,
  * regardless of which StreamReplay/StreamingFit helper started it, so
  * none of the ~38 replay sites needs touching.
  *
  * Usage: [[install]] once per session; [[drain]] between bench entries —
  * it returns the queries that COMPLETED since the last drain (replay
  * queries always terminate before the entry returns, so attribution to
  * the running entry is exact, not time-sliced).
  */
object StreamStats {

  /** One completed streaming query's rollup.
    * Durations are summed across micro-batches, ms. */
  final case class QueryStats(
      name: String,
      batches: Int,
      peakStateRows: Long,
      peakStateBytes: Long,
      triggerMs: Long,
      addBatchMs: Long)

  private final class Acc {
    var batches = 0
    var peakRows = 0L
    var peakBytes = 0L
    var triggerMs = 0L
    var addBatchMs = 0L
    var name = ""
  }

  private val live = new ConcurrentHashMap[java.util.UUID, Acc]()
  private val done = new ConcurrentLinkedQueue[QueryStats]()
  // WEAK keys: a strong SparkSession reference here would pin every
  // installed-on session (and its SparkContext state) for the process
  // lifetime; the listener lives ON the session, so the session's own
  // lifecycle owns it. install() is synchronized, covering the
  // non-thread-safe WeakHashMap.
  private val sessions = new java.util.WeakHashMap[SparkSession, java.lang.Boolean]()
  // started/terminated counters: a synchronous-enough signal for callers
  // to (a) skip draining entirely when an entry ran no streaming query
  // and (b) wait for the async listener bus to deliver exactly the
  // terminations it owes before attributing stats to an entry
  private val startedN = new java.util.concurrent.atomic.AtomicLong(0)
  private val terminatedN = new java.util.concurrent.atomic.AtomicLong(0)

  /** Queries the listener has seen start since process boot. */
  def started: Long = startedN.get()

  /** Register the listener on this session (idempotent per session). */
  def install(spark: SparkSession): Unit = synchronized {
    if (sessions.put(spark, java.lang.Boolean.TRUE) == null) {
      spark.streams.addListener(new StreamingQueryListener {
        override def onQueryStarted(
            e: StreamingQueryListener.QueryStartedEvent): Unit =
          startedN.incrementAndGet()
        override def onQueryProgress(
            e: StreamingQueryListener.QueryProgressEvent): Unit = {
          val p = e.progress
          val acc = live.computeIfAbsent(p.id, _ => new Acc)
          acc.synchronized {
            acc.name = p.name
            acc.batches += 1
            val rows = p.stateOperators.map(_.numRowsTotal).sum
            val bytes = p.stateOperators.map(_.memoryUsedBytes).sum
            if (rows > acc.peakRows) acc.peakRows = rows
            if (bytes > acc.peakBytes) acc.peakBytes = bytes
            val d = p.durationMs
            acc.triggerMs += Option(d.get("triggerExecution")).map(_.longValue).getOrElse(0L)
            acc.addBatchMs += Option(d.get("addBatch")).map(_.longValue).getOrElse(0L)
          }
        }
        override def onQueryTerminated(
            e: StreamingQueryListener.QueryTerminatedEvent): Unit = {
          val acc = live.remove(e.id)
          if (acc != null) acc.synchronized {
            done.add(QueryStats(acc.name, acc.batches, acc.peakRows,
              acc.peakBytes, acc.triggerMs, acc.addBatchMs))
          }
          terminatedN.incrementAndGet()
        }
      })
    }
  }

  /** Queries completed since the last drain. Listener delivery is async;
    * callers that need exact attribution use [[drainAwait]] (or sleep
    * briefly first — the old Bench metricSnapshot convention). */
  def drain(): Seq[QueryStats] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[QueryStats]
    var s = done.poll()
    while (s != null) { out += s; s = done.poll() }
    out.toSeq
  }

  /** [[drain]] after waiting (≤ maxWaitMs) for the listener bus to
    * deliver a termination event for every started query — replay
    * queries terminate before their entry returns, so once terminated
    * catches up to started, attribution to the just-finished entry is
    * exact rather than a fixed-sleep guess. */
  def drainAwait(maxWaitMs: Long = 2000): Seq[QueryStats] = {
    val deadline = System.nanoTime() + maxWaitMs * 1000000L
    while (terminatedN.get() < startedN.get() && System.nanoTime() < deadline)
      Thread.sleep(5)
    drain()
  }
}
