package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Crawl-to-crawl snapshot diff — the delta report every recurring-crawl
  * pipeline computes before anything else runs: which documents are NEW
  * since the last snapshot (they enter ingest/dedup/indexing), which
  * VANISHED (they leave the serving set / get tombstoned), and which
  * CHANGED content under the same id (they re-enter cleaning and
  * invalidate downstream artifacts). The content-level complement of
  * [[graft.functions.DedupFunctions.incrementalDedup]] (which asks "is
  * this text anywhere in the corpus"); the diff asks the ID-KEYED
  * question "what happened to each document slot".
  *
  * Scale shape: one map-side-combinable min-aggregate per side (the
  * per-id content fingerprint) and ONE full-outer equi-join on the id —
  * a single shuffle on uniform keys, no windows, nothing ∝ n². Both
  * snapshots stream; neither is collected or broadcast, so the two
  * crawls can each be 100 TB.
  *
  * Contract details (all mirrored in the `corpus_diff` oracle SQL):
  *  - the per-id fingerprint is the MIN md5 over that id's rows —
  *    ill-formed snapshots with duplicate ids diff deterministically
  *    under any partitioning (the dedupExact min-tuple convention);
  *  - null text fingerprints like empty text (md5 of '' — a crawl row
  *    that lost its body compares equal to one that wrote none);
  *  - null ids never equal anything (ANSI), so a null-id group appears
  *    as `removed` from the old side and `added` on the new side rather
  *    than silently pairing.
  */
object CorpusDiff {

  /** Per-id status frame: `(id, status, old_fp, new_fp)` with status ∈
    * added | removed | changed | unchanged. `old_fp`/`new_fp` are the
    * side fingerprints (null where the side lacks the id).
    */
  def diff(oldSnap: DataFrame, newSnap: DataFrame,
           idCol: String, textCol: String): DataFrame = {
    def fps(df: DataFrame, side: String) =
      df.groupBy(col(idCol))
        .agg(min(md5(coalesce(col(textCol), lit("")))).as(s"${side}_fp"))
        .withColumn(s"${side}_present", lit(1))
    val o = fps(oldSnap, "old")
    val n = fps(newSnap, "new")
    o.join(n, Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("old_present").isNull, lit("added"))
          .when(col("new_present").isNull, lit("removed"))
          .when(col("old_fp") === col("new_fp"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"),
        col("old_fp"), col("new_fp"))
  }

  /** The one-row-per-status summary (added/removed/changed/unchanged
    * counts) — the number a crawl monitor alerts on.
    */
  def summary(oldSnap: DataFrame, newSnap: DataFrame,
              idCol: String, textCol: String): DataFrame =
    diff(oldSnap, newSnap, idCol, textCol)
      .groupBy(col("status")).agg(count(lit(1)).as("n"))
}
