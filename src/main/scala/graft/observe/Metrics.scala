package graft.observe

import java.util.concurrent.ConcurrentLinkedDeque

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.util.QueryExecutionListener

/** Operational metrics surface — the engine-side counterpart of the
  * reference's Prometheus/JMX scrape stack (reference prometheus.yml
  * scrapes Spark's JMX sink; the monitoring yml dashboards read it).
  * Spark's own metrics sinks are config (spark.metrics.conf) — what the
  * engine must contribute is the per-query signal, which these two
  * listeners capture:
  *
  *  - [[GraftStreamingListener]]: per-micro-batch progress of every
  *    StreamingQuery (rows in, trigger latency, rows/s) — the day-one
  *    "is my pipeline keeping up" regression signal.
  *  - [[GraftBatchListener]]: per-action runtime of batch queries.
  *
  * Events land in bounded in-memory ring buffers, queryable via
  * [[streamSnapshot]]/[[batchSnapshot]] (what a /metrics endpoint or
  * JMX gauge would export) and logged one line per event through slf4j
  * so an ops stack scrapes them with zero engine changes. Buffers are
  * process-global: one metrics plane per JVM, like a metrics registry.
  */
object Metrics {

  /** One micro-batch of one streaming query. */
  final case class StreamProgress(queryName: String, queryId: String,
      batchId: Long, numInputRows: Long, processedRowsPerSecond: Double,
      triggerDurationMs: Long, timestamp: String)

  /** One batch action (count/collect/write/...). */
  final case class BatchRun(action: String, durationMs: Long, failed: Boolean)

  private val MaxEvents = 1024
  private val log = org.slf4j.LoggerFactory.getLogger(getClass)
  private val streamEvents = new ConcurrentLinkedDeque[StreamProgress]()
  private val batchEvents = new ConcurrentLinkedDeque[BatchRun]()
  // element counts tracked separately: ConcurrentLinkedDeque.size() is
  // an O(n) traversal, too hot for a per-event listener path
  private val streamCount = new java.util.concurrent.atomic.AtomicInteger(0)
  private val batchCount = new java.util.concurrent.atomic.AtomicInteger(0)

  private def push[A](q: ConcurrentLinkedDeque[A],
      n: java.util.concurrent.atomic.AtomicInteger, a: A): Unit = {
    q.addLast(a)
    if (n.incrementAndGet() > MaxEvents && q.pollFirst() != null)
      n.decrementAndGet() // bounded: drop oldest
  }

  final class GraftStreamingListener extends StreamingQueryListener {
    override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
      val p = e.progress
      val rec = StreamProgress(
        Option(p.name).getOrElse(""), p.id.toString, p.batchId, p.numInputRows,
        p.processedRowsPerSecond,
        Option(p.durationMs.get("triggerExecution")).map(_.longValue).getOrElse(-1L),
        p.timestamp)
      push(streamEvents, streamCount, rec)
      log.info("stream_progress query={} batch={} rows={} trigger_ms={}",
        rec.queryName, rec.batchId.toString, rec.numInputRows.toString,
        rec.triggerDurationMs.toString)
    }
    override def onQueryTerminated(
        e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
  }

  final class GraftBatchListener extends QueryExecutionListener {
    override def onSuccess(funcName: String, qe: QueryExecution,
        durationNs: Long): Unit =
      push(batchEvents, batchCount,
        BatchRun(funcName, durationNs / 1000000L, failed = false))
    override def onFailure(funcName: String, qe: QueryExecution,
        exception: Exception): Unit =
      push(batchEvents, batchCount, BatchRun(funcName, -1L, failed = true))
  }

  /** Register both listeners on a session, once per session (guarded by
    * a session conf flag — `Sessions.local` calls this on every build,
    * and getOrCreate may return an already-instrumented session).
    */
  def register(spark: SparkSession): Unit =
    if (!spark.conf.getOption("graft.metrics.registered").contains("true")) {
      spark.streams.addListener(new GraftStreamingListener)
      spark.listenerManager.register(new GraftBatchListener)
      spark.conf.set("graft.metrics.registered", "true")
    }

  def streamSnapshot: Seq[StreamProgress] = streamEvents.asScala.toSeq
  def batchSnapshot: Seq[BatchRun] = batchEvents.asScala.toSeq

  /** Test hook: empty both buffers. */
  def reset(): Unit = {
    streamEvents.clear(); batchEvents.clear()
    streamCount.set(0); batchCount.set(0)
  }
}
