package graft.operators

import graft.functions.{DedupFunctions, TextFunctions}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Composed document-cleaning pipeline — the standard pre-training funnel
  * (language filter → quality floor → duplicate removal) as ONE operator,
  * so a corpus pass is a single declarative plan instead of three scans
  * stitched by the caller.
  *
  * All stages reuse the individually-oracle-checked primitives
  * ([[TextFunctions.langId]], [[TextFunctions.qualityScore]],
  * [[TextFunctions.fingerprint]], [[DedupFunctions]]), and the whole
  * funnel stays inside Catalyst: one projection computes the per-doc
  * annotations (per-row, codegen'd, no shuffle), the filters fuse into the
  * scan, and exact dedup is the only shuffle (hash partition on the
  * fingerprint). At 100 TB that is a single map-side-heavy pass plus one
  * exchange — the minimum any dedup-bearing funnel needs.
  */
object DocPipeline {

  /** Funnel thresholds. `minQualityBp` is in basis points (0..10000). */
  final case class Config(lang: String = "en", minQualityBp: Int = 2500,
                          dedup: Boolean = true)

  /** One-pass per-doc annotations: predicted language, quality score
    * (basis points), normalized-content fingerprint. Literally one pass:
    * the fused [[graft.functions.expressions.TextStats]] expression
    * computes all three in a single string scan (contract identical to
    * the composed TextFunctions originals — TextStatsSpec pins it).
    */
  def annotate(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), col(textCol),
        graft.functions.expressions.TextStats.textStats(col(textCol)).as("_st"))
      .select(col(idCol), col(textCol),
        col("_st.lang_pred").as("lang_pred"),
        col("_st.quality_bp").as("quality_bp"),
        col("_st.fingerprint").as("fingerprint"))

  private def passes(cfg: Config): Column =
    col("lang_pred") === cfg.lang && col("quality_bp") >= cfg.minQualityBp

  /** The cleaned corpus: docs in the target language, above the quality
    * floor, one representative (smallest id) per exact-duplicate group.
    */
  def clean(docs: DataFrame, idCol: String, textCol: String,
            cfg: Config = Config()): DataFrame = {
    val filtered = annotate(docs, idCol, textCol).where(passes(cfg))
    if (!cfg.dedup) filtered
    else filtered
      .withColumn("_rk", row_number().over(
        Window.partitionBy(col("fingerprint")).orderBy(col(idCol))))
      .where(col("_rk") === 1)
      .drop("_rk")
  }

  /** Funnel accounting in one aggregation (no extra scans): how many docs
    * survive each successive stage.
    */
  def funnel(docs: DataFrame, idCol: String, textCol: String,
             cfg: Config = Config()): DataFrame =
    annotate(docs, idCol, textCol).agg(
      count(lit(1)).as("n_in"),
      count(when(col("lang_pred") === cfg.lang, 1)).as("n_lang"),
      count(when(passes(cfg), 1)).as("n_quality"),
      count_distinct(when(passes(cfg), col("fingerprint"))).as("n_kept"))

  /** Streaming flavor of [[clean]]: the annotations and filters are pure
    * per-row projections (stream-safe as-is), but the batch dedup's
    * row_number window is not allowed in a streaming query — streaming
    * dedup is `dropDuplicates` keyed on the fingerprint (first SEEN
    * representative instead of smallest id — the only semantic the
    * incremental model can offer). With `watermarkCol`/`ttl` set, state
    * is bounded by `dropDuplicatesWithinWatermark` (RocksDB-backed on a
    * cluster, same shape as the event-ingest F2 dedup); without them the
    * fingerprint state grows with the distinct corpus — fine for bounded
    * backfills, wrong for unbounded streams, so prefer the TTL form.
    */
  def cleanStream(docs: DataFrame, idCol: String, textCol: String,
                  cfg: Config = Config(),
                  watermarkCol: Option[String] = None,
                  ttl: String = "30 days"): DataFrame =
    statefulDedup(annotatedAll(docs, textCol).where(passes(cfg)),
      cfg, watermarkCol, ttl)

  // withColumn (not annotate's select) so every input column — including
  // the watermark timestamp — survives into the streaming plan
  private def annotatedAll(docs: DataFrame, textCol: String): DataFrame =
    docs
      .withColumn("_st",
        graft.functions.expressions.TextStats.textStats(col(textCol)))
      .withColumn("lang_pred", col("_st.lang_pred"))
      .withColumn("quality_bp", col("_st.quality_bp"))
      .withColumn("fingerprint", col("_st.fingerprint"))
      .drop("_st")

  private def statefulDedup(filtered: DataFrame, cfg: Config,
                            watermarkCol: Option[String],
                            ttl: String): DataFrame =
    if (!cfg.dedup) filtered
    else watermarkCol match {
      case Some(wm) => filtered.withWatermark(wm, ttl)
        .dropDuplicatesWithinWatermark("fingerprint")
      case None => filtered.dropDuplicates("fingerprint")
    }

  /** Corpus quality SCORECARD: every quality-signal family the engine
    * ships, evaluated per document in one composed plan — the readiness
    * report a data team reads before committing a corpus to training:
    *
    *   - `c4_ok`      — C4 structural rules ([[HeuristicFilters]])
    *   - `gopher_ok`  — Gopher repetition gate ([[Repetition.gate]])
    *   - `langq_ok`   — language + heuristic quality floor ([[annotate]])
    *   - `lm_ok`      — bigram-LM perplexity at most `lmMaxNlpBp`
    *                    ([[LmScore]], corpus as its own reference;
    *                    bigram-less docs score 0 and pass)
    *   - `all_ok`     — the conjunction
    *
    * Each family is the already-tested operator joined back on the doc id
    * (md5-uniform keys); nothing here re-derives a signal. Cost is the sum
    * of the family passes — the point is ONE plan and one output table,
    * not a cheaper computation.
    */
  def scorecard(docs: DataFrame, idCol: String, textCol: String,
                cfg: Config = Config(),
                rep: Repetition.Config = Repetition.Config(),
                lmMaxNlpBp: Long = 35600L): DataFrame = {
    val c4 = HeuristicFilters.annotate(docs, idCol, textCol)
      .select(col(idCol), col("kept").as("c4_ok"))
    val gopher = Repetition.gate(docs, idCol, textCol, rep)
      .select(col(idCol)).withColumn("_g", lit(true))
    val lq = annotate(docs, idCol, textCol)
      .select(col(idCol), passes(cfg).as("langq_ok"))
    val lm = LmScore.perplexityScore(docs, docs, idCol, textCol)
      .select(col(idCol),
        (TextFunctions.basisPoints(col("avg_neg_logp")) <= lmMaxNlpBp)
          .as("lm_ok"))
    docs.join(c4, Seq(idCol))
      .join(gopher, Seq(idCol), "left")
      .withColumn("gopher_ok", coalesce(col("_g"), lit(false))).drop("_g")
      .join(lq, Seq(idCol))
      .join(lm, Seq(idCol))
      .withColumn("all_ok",
        col("c4_ok") && col("gopher_ok") && col("langq_ok") && col("lm_ok"))
  }

  /** The corpus fingerprint table [[cleanStreamIncremental]] anti-joins
    * against — in production a maintained parquet table updated as batches
    * commit; any frame with a `fingerprint` column works.
    */
  def corpusFingerprints(corpus: DataFrame, textCol: String): DataFrame =
    corpus.select(TextFunctions.fingerprint(col(textCol)).as("fingerprint"))
      .distinct()

  /** Streaming INCREMENTAL clean — continuous crawl ingestion against an
    * EXISTING corpus: [[cleanStream]]'s per-row filters, then a
    * stream-static join against the corpus fingerprint table (content the
    * corpus already holds is dropped before it ever reaches dedup state),
    * then the stateful within-stream dedup. This is the streaming face of
    * [[graft.functions.DedupFunctions.incrementalDedup]].
    *
    * The anti-join is expressed as stream-static LEFT OUTER + null filter:
    * left-anti is not in Structured Streaming's stream-static support
    * matrix, left outer with a static right side is, and the two are
    * equivalent over a marker column. The static side re-resolves per
    * micro-batch, so a corpus table updated between triggers is picked up
    * without restarting the query.
    */
  def cleanStreamIncremental(docs: DataFrame, corpusFps: DataFrame,
                             idCol: String, textCol: String,
                             cfg: Config = Config(),
                             watermarkCol: Option[String] = None,
                             ttl: String = "30 days"): DataFrame = {
    val filtered = annotatedAll(docs, textCol).where(passes(cfg))
    val fresh = filtered
      .join(corpusFps.select(col("fingerprint")).distinct()
        .withColumn("_in_corpus", lit(1)), Seq("fingerprint"), "left")
      .where(col("_in_corpus").isNull).drop("_in_corpus")
    statefulDedup(fresh, cfg, watermarkCol, ttl)
  }
}
