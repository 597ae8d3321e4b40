package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Statistical language-model quality scoring — the CCNet-style "perplexity
  * filter" stage of a training-data pipeline (Wenzek et al. 2020 score
  * documents with a KenLM 5-gram model; the same signal at corpus scale is
  * a bigram model with add-one smoothing, trained on a reference corpus in
  * two hash aggregations). A document's score is the average negative log
  * probability of its token bigrams under the reference model: fluent text
  * scores low, gibberish / boilerplate / wrong-language text scores high,
  * and the score feeds the same kind of threshold gate as
  * [[graft.functions.TextFunctions]]'s heuristic quality signals.
  *
  * Scale shape: training is two map-side-combinable `groupBy().count()`
  * passes over exploded reference bigrams (table size = distinct bigrams,
  * shuffle-friendly); scoring is two hash equi-joins of document bigrams
  * against those tables plus one per-document aggregation. No windows, no
  * products; the vocab size is a 1-row broadcast. Zipf-skewed hot bigrams
  * land on the LM side as ONE row each, so the scoring join skew stays
  * bounded (AQE splits any residual straggler).
  *
  * Reference semantics (rakam-api-collector has no LM stage — this extends
  * the engine for LLM-corpus curation): context counts c(a) are derived
  * from the bigram table (occurrences of `a` as a bigram LEFT context), so
  * P(b|a) = (c(a,b)+1) / (c(a)+V) sums to 1 over the vocabulary; V counts
  * distinct reference tokens. Documents with fewer than two tokens have no
  * bigrams and score (n_bigrams = 0, score 0).
  */
object LmScore {

  /** Token bigrams as "a b" strings; fewer than two tokens → empty.
    *
    * Built on the native single-pass [[TextFunctions.shingles]] expression
    * (codegen'd) rather than a transform/element_at lambda chain — the
    * composed form runs under interpreted lambda eval and re-reads the
    * token array per element, and this explode dominates both training
    * and scoring. WordShingles' short-input fallback (a whole-text single
    * gram for <2 tokens) is exactly the gram with NO space in it, so one
    * cheap per-element `instr` filter restores the empty-below-two-tokens
    * bigram contract.
    */
  def bigrams(text: Column): Column =
    filter(TextFunctions.shingles(text, 2), g => instr(g, " ") > 0)

  /** A trained bigram model: `(bg, cab)` bigram counts, `(a, ca)` context
    * counts, and a 1-row `(v)` vocab size. The count frames read the
    * materialized bigram explode (see [[train]]); a long-lived pipeline
    * trains once, [[BigramModel.save]]s, and scores many corpora against
    * the files — the same operational shape as the IVF/PQ index lifecycle.
    */
  final case class BigramModel(bigramCounts: DataFrame,
                               contextCounts: DataFrame, vocab: DataFrame) {
    /** Persist all three tables (any Hadoop scheme). */
    def save(path: String): Unit = {
      bigramCounts.write.mode("overwrite").parquet(s"$path/bigrams")
      contextCounts.write.mode("overwrite").parquet(s"$path/contexts")
      vocab.write.mode("overwrite").parquet(s"$path/vocab")
    }
  }

  /** Load a model persisted by [[BigramModel.save]]. */
  def load(spark: org.apache.spark.sql.SparkSession, path: String): BigramModel =
    BigramModel(spark.read.parquet(s"$path/bigrams"),
      spark.read.parquet(s"$path/contexts"), spark.read.parquet(s"$path/vocab"))

  /** Train the add-one bigram model: two map-side-combinable counts over
    * exploded reference bigrams plus a distinct-token count.
    *
    * The exploded bigram table feeds BOTH count aggregations, so it is
    * materialized once instead of re-running the tokenize+shingle pass per
    * consumer — an eager local checkpoint by default (executor memory/disk,
    * freed when the model goes out of scope); at 100 TB pass `stagingPath`
    * and the exploded table goes to parquet with both aggregations reading
    * the FILE (the [[graft.functions.DedupFunctions.minhashCandidates]]
    * escape hatch — nothing pinned in the block manager).
    */
  def train(reference: DataFrame, textCol: String,
            stagingPath: Option[String] = None): BigramModel = {
    val refBgPlan = reference
      .select(explode(bigrams(col(textCol))).as("_bg"))
    val refBg = stagingPath match {
      case Some(path) =>
        refBgPlan.write.mode("overwrite").parquet(path)
        reference.sparkSession.read.parquet(path)
      case None =>
        refBgPlan.localCheckpoint(true)
    }
    BigramModel(
      refBg.groupBy(col("_bg")).agg(count(lit(1)).as("_cab")),
      refBg.groupBy(split(col("_bg"), " ").getItem(0).as("_a"))
        .agg(count(lit(1)).as("_ca")),
      reference
        .select(explode(TextFunctions.tokens(col(textCol))).as("_tok"))
        .agg(count_distinct(col("_tok")).as("_v"))) // 1 row → broadcasts
  }

  /** Score `docs` against a trained (possibly storage-loaded) model. */
  def scoreWith(docs: DataFrame, idCol: String, textCol: String,
                model: BigramModel): DataFrame = {
    val docBg = docs.select(col(idCol).as("_id"),
        explode(bigrams(col(textCol))).as("_bg"))
      .withColumn("_a", split(col("_bg"), " ").getItem(0))
    val scored = docBg
      .join(model.bigramCounts, Seq("_bg"), "left")
      .join(model.contextCounts, Seq("_a"), "left")
      .crossJoin(broadcast(model.vocab))
      .select(col("_id"),
        (-log((coalesce(col("_cab"), lit(0L)) + 1).cast("double") /
          (coalesce(col("_ca"), lit(0L)) + col("_v")).cast("double")))
          .as("_nlp"))
      .groupBy(col("_id")).agg(
        count(lit(1)).as("n_bigrams"), avg(col("_nlp")).as("avg_neg_logp"))
    docs.join(scored, docs(idCol) === scored("_id"), "left")
      .drop("_id")
      .withColumn("n_bigrams", coalesce(col("n_bigrams"), lit(0L)))
      .withColumn("avg_neg_logp", coalesce(col("avg_neg_logp"), lit(0.0d)))
  }

  /** One-shot convenience: train on `reference`, score `docs`. Long-lived
    * corpora should [[train]] once, [[BigramModel.save]], and [[scoreWith]]
    * against the loaded files instead of re-counting the reference per run.
    */
  def perplexityScore(docs: DataFrame, reference: DataFrame, idCol: String,
                      textCol: String): DataFrame =
    scoreWith(docs, idCol, textCol, train(reference, textCol))
}
