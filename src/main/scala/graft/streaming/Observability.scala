package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

import java.util.concurrent.ConcurrentLinkedDeque
import java.util.concurrent.atomic.{AtomicLong, AtomicReference}

/** §2.7 observability parity: the reference exposes JMX counters for
  * record/flush/error counts and per-phase latency
  * (kafka/KafkaRealTimeWorker.java:87-96,394-455); Structured Streaming
  * already publishes the equivalents in `StreamingQueryProgress` — this
  * listener aggregates them and drives the C5 circuit breaker.
  */
final class IngestMetricsListener(
    onTrip: String => Unit = msg => throw new IllegalStateException(msg),
    errorRateThreshold: Double = 0.4,    // ref kafka/KafkaUtil.java:158-166
    windowMillis: Long = 5 * 60 * 1000L,
    minRecords: Long = 100L)
    extends StreamingQueryListener {

  val recordsIn = new AtomicLong(0)
  val batches = new AtomicLong(0)
  val lastProgress = new AtomicReference[QueryProgressEvent]()
  private val errorEvents = new ConcurrentLinkedDeque[(Long, Long)]() // (ts, errCount)
  private val recordEvents = new ConcurrentLinkedDeque[(Long, Long)]()
  private val phases =
    new java.util.concurrent.ConcurrentHashMap[String, PhaseStat]()

  override def onQueryStarted(event: QueryStartedEvent): Unit = ()
  override def onQueryTerminated(event: QueryTerminatedEvent): Unit = ()

  override def onQueryProgress(event: QueryProgressEvent): Unit = {
    lastProgress.set(event)
    batches.incrementAndGet()
    val n = event.progress.numInputRows
    recordsIn.addAndGet(n)
    record(recordEvents, n)
    // per-phase latency distributions (the reference tracks POLLING /
    // FLUSHING_* / CHECKPOINTING wall-time shares,
    // kafka/KafkaRealTimeWorker.java:394-455); Structured Streaming reports
    // the same breakdown per batch in durationMs (latestOffset+getBatch ≈
    // POLLING, addBatch ≈ FLUSHING, walCommit+commitOffsets ≈ CHECKPOINTING)
    event.progress.durationMs.forEach { (phase, millis) =>
      phases.compute(phase, (_, cur) =>
        if (cur == null) PhaseStat(1, millis, millis)
        else PhaseStat(cur.count + 1, cur.totalMillis + millis,
                       math.max(cur.maxMillis, millis)))
    }
    checkBreaker()
  }

  /** Per-phase latency distribution over the query's lifetime. */
  def phaseStats: Map[String, PhaseStat] = {
    import scala.jdk.CollectionConverters._
    phases.asScala.toMap
  }

  /** Call from the batch function when records are skipped/failed (F3
    * malformed counts, sink insert failures).
    */
  def recordErrors(n: Long): Unit = { record(errorEvents, n); checkBreaker() }

  // synchronized: recordErrors runs on the writer pool while the listener
  // bus trims the same deque — an unsynchronized peek/poll pair can NPE
  // (peekFirst after a concurrent poll) or drop a fresh in-window entry
  private def record(q: ConcurrentLinkedDeque[(Long, Long)], n: Long): Unit =
    q.synchronized {
      val now = System.currentTimeMillis()
      q.addLast((now, n))
      var head = q.peekFirst()
      while (head != null && head._1 < now - windowMillis) {
        q.pollFirst()
        head = q.peekFirst()
      }
    }

  private def sum(q: ConcurrentLinkedDeque[(Long, Long)]): Long = {
    val cutoff = System.currentTimeMillis() - windowMillis
    var s = 0L
    val it = q.iterator()
    while (it.hasNext) { val (t, n) = it.next(); if (t >= cutoff) s += n }
    s
  }

  /** C5 — error-rate circuit breaker: trip when the 5-minute error rate
    * exceeds 40% over at least 100 records (the reference calls exit(1);
    * here the injected `onTrip` decides — stop the query, alert, etc.).
    */
  private def checkBreaker(): Unit = {
    val errs = sum(errorEvents)
    // numInputRows already INCLUDES the rows that later fail, so adding
    // errs would double-count the denominator (a true 50% failure rate
    // would read as 33% and the breaker would only trip above ~67%);
    // max() keeps the errors-only batch path (no progress events) working
    val recs = math.max(sum(recordEvents), errs)
    if (recs > minRecords && errs.toDouble / recs > errorRateThreshold)
      onTrip(f"error rate ${errs.toDouble / recs}%.2f over last ${windowMillis / 60000} min " +
        s"($errs/$recs records) exceeds $errorRateThreshold")
  }

  def register(spark: SparkSession): this.type = {
    spark.streams.addListener(this); this
  }
}

/** Latency distribution of one micro-batch phase (count/total/max ms). */
final case class PhaseStat(count: Long, totalMillis: Long, maxMillis: Long) {
  def meanMillis: Double = if (count == 0) 0.0 else totalMillis.toDouble / count
}
