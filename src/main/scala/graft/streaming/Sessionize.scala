package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Gap-based sessionization that runs UNCHANGED in batch and in
  * Structured Streaming.
  *
  * The batch analytics surface already sessionizes with
  * `session_window` (`SparkEntry.queries("w3_sessions")`); this is the
  * same declaration packaged so a STREAM of events produces the same
  * sessions incrementally: with a watermark, Spark keeps per-(user,
  * open-session) state, merges windows as events arrive, and emits a
  * session exactly once — in append mode, when the watermark passes its
  * close (the gap after the last event). State is bounded by the
  * watermark delay; no custom `mapGroupsWithState` needed — the built-in
  * session-window state store implementation handles merge + eviction
  * (Spark-first: compose, don't hand-roll state).
  *
  * At scale this is one shuffle on the grouping key per micro-batch with
  * RocksDB-backed state on a real cluster — the same shape the ingest
  * pipeline's watermark dedup uses.
  */
object Sessionize {

  /** One row per closed session: key, start, end, n_events.
    * `watermark` must be set for streaming append mode (how much event-time
    * lateness to absorb before a session can close); pass None in batch.
    *
    * PRE-1970 caveat (streaming only): Spark initializes the event-time
    * watermark at epoch 0 and stateful operators drop rows older than the
    * watermark, so first-batch events with NEGATIVE epoch times silently
    * vanish from the streaming path while the identical batch declaration
    * keeps them. Replaying historical pre-1970 data through the streaming
    * path requires rebasing times by a constant (exact for gap semantics —
    * see `SparkEntry.queries("w3_sessions_stream")`).
    */
  def sessions(events: DataFrame, keyCol: String, tsCol: String,
               gap: String, watermark: Option[String] = None): DataFrame = {
    val base = watermark match {
      case Some(w) => events.withWatermark(tsCol, w)
      case None    => events
    }
    base.groupBy(col(keyCol), session_window(col(tsCol), gap).as("_w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col(keyCol), col("_w.start").as("session_start"),
        col("_w.end").as("session_end"), col("n_events"))
  }

  /** Per-key rollup of [[sessions]] — the `w3_sessions` shape. */
  def sessionStats(sessions: DataFrame, keyCol: String): DataFrame =
    sessions.groupBy(col(keyCol)).agg(
      count(lit(1)).as("n_sessions"),
      sum(col("n_events")).as("n_events"),
      max(col("n_events")).as("max_session_events"))
}
