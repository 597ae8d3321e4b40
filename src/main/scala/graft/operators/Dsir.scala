package graft.operators

import graft.functions.{DedupFunctions, TextFunctions}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data Selection with Importance Resampling (DSIR — Xie et al. 2023,
  * "Data Selection for Language Models via Importance Resampling"):
  * score every raw document by how target-domain-like it is, using hashed
  * unigram features and a log-likelihood ratio between a target-domain
  * unigram model and the raw-corpus unigram model. The classic use: hold
  * a small high-quality target set (wiki/books), score the whole crawl,
  * keep the best-scoring documents for the training mix.
  *
  * Mechanics, kept cross-engine exact so the DuckDB oracle can replay it:
  *
  *   - tokens hash into `buckets` feature buckets via the shared 60-bit
  *     md5 hash ([[DedupFunctions.hash60]]);
  *   - each side's bucket distribution is add-one smoothed; each bucket's
  *     log-likelihood ratio `ln(p_target(b) / p_raw(b))` is computed as
  *     ONE `ln` of an exact integer ratio and quantized to integer
  *     MICRO-NATS (`floor(x*1e6 + 0.5)`);
  *   - a document's score is the INTEGER sum of its tokens' micro-nat
  *     weights — no floating-point accumulation anywhere, so the score is
  *     independent of partitioning and summation order (the float-sum
  *     trap that [[graft.functions.SimilarityFunctions]]' centroid
  *     quantization dodges the same way).
  *
  * Scale shape: both bucket-count aggregations are map-side-combinable
  * and bounded by `buckets` rows (a fixed model size, NOT corpus
  * cardinality — DSIR's own design point); the weight table broadcasts;
  * scoring is explode → broadcast-join → integer sum, partial-aggregated
  * map-side. Nothing driver-side exceeds `buckets` rows.
  */
object Dsir {

  /** Hashed-unigram bucket counts of one corpus side: ≤ `buckets` rows. */
  def bucketCounts(df: DataFrame, textCol: String, buckets: Int): DataFrame =
    df.select(explode(TextFunctions.tokens(col(textCol))).as("_tok"))
      .select(DedupFunctions.hash60(col("_tok")).%(buckets).as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n"))

  /** A persisted corpus snapshot for drift monitoring: the hashed-unigram
    * bucket counts of one crawl, written once when the crawl lands. The
    * production monitor shape is snapshot-per-crawl + drift of each new
    * crawl AGAINST the stored snapshot — the old corpus is never
    * re-tokenized (at 100 TB the snapshot is ≤ `buckets` rows vs a full
    * re-read of last month's data). Counts are integers, so the parquet
    * round-trip is exact and drift through a loaded snapshot is
    * bit-identical to in-query training.
    */
  final case class CorpusSnapshot(counts: DataFrame, buckets: Int) {
    def save(path: String): Unit = {
      counts.write.mode("overwrite").parquet(s"$path/counts")
      val spark = counts.sparkSession
      import spark.implicits._
      Seq(buckets).toDF("buckets")
        .write.mode("overwrite").parquet(s"$path/meta")
    }
  }

  /** Snapshot a corpus side for later [[driftFromSnapshot]] / scoring. */
  def snapshot(df: DataFrame, textCol: String, buckets: Int = 1024): CorpusSnapshot =
    CorpusSnapshot(bucketCounts(df, textCol, buckets), buckets)

  /** Load a snapshot persisted by [[CorpusSnapshot.save]]. */
  def loadSnapshot(spark: org.apache.spark.sql.SparkSession,
                   path: String): CorpusSnapshot =
    CorpusSnapshot(spark.read.parquet(s"$path/counts"),
      spark.read.parquet(s"$path/meta").head.getInt(0))

  /** The trained DSIR model — the broadcastable importance-weight table.
    * Deployment shape: train ONCE against the target sample, [[DsirModel.save]],
    * then [[scoreWith]] every raw batch against the loaded model without
    * re-aggregating either corpus (the same train-once/score-many
    * lifecycle as [[LmScore.BigramModel]] / [[Bpe]] merges / the
    * persisted ANN indexes).
    */
  final case class DsirModel(weights: DataFrame, buckets: Int) {
    def save(path: String): Unit = {
      weights.write.mode("overwrite").parquet(s"$path/weights")
      val spark = weights.sparkSession
      import spark.implicits._
      Seq(buckets).toDF("buckets")
        .write.mode("overwrite").parquet(s"$path/meta")
    }
  }

  /** Train the importance-weight model (see [[weightTable]]). */
  def trainModel(raw: DataFrame, target: DataFrame, textCol: String,
                 buckets: Int = 1024): DsirModel =
    DsirModel(weightTable(raw, target, textCol, buckets), buckets)

  /** Load a model persisted by [[DsirModel.save]]. */
  def loadModel(spark: org.apache.spark.sql.SparkSession,
                path: String): DsirModel =
    DsirModel(spark.read.parquet(s"$path/weights"),
      spark.read.parquet(s"$path/meta").head.getInt(0))

  /** The importance-weight table: `(bucket, w_unats)` where `w_unats` is
    * the micro-nat quantized log-likelihood ratio
    * `ln(((t_b+1) * (R+B)) / ((r_b+1) * (T+B)))` — add-one smoothing on
    * both sides, one `ln` per bucket. Buckets unseen on BOTH sides get the
    * same formula with zero counts via the full outer join + coalesce, so
    * the table always has every bucket that occurs in either side; a
    * bucket in neither side cannot occur in a scored document drawn from
    * `raw`, so left-join + the caller never sees a null weight for raw
    * docs (scoring still coalesces defensively).
    */
  def weightTable(raw: DataFrame, target: DataFrame, textCol: String,
                  buckets: Int): DataFrame =
    weightTableFromCounts(bucketCounts(raw, textCol, buckets),
      bucketCounts(target, textCol, buckets), buckets)

  /** [[weightTable]] over pre-aggregated `(bucket, n)` count tables —
    * the path a loaded [[CorpusSnapshot]] takes, skipping the tokenize +
    * aggregate pass over the snapshotted corpus entirely.
    */
  def weightTableFromCounts(rawCounts: DataFrame, targetCounts: DataFrame,
                            buckets: Int): DataFrame = {
    val tc = targetCounts.withColumnRenamed("n", "_tn")
    val rc = rawCounts.withColumnRenamed("n", "_rn")
    // two scalar totals — bounded driver reads (one row each)
    val tTot = tc.agg(coalesce(sum(col("_tn")), lit(0L))).head.getLong(0)
    val rTot = rc.agg(coalesce(sum(col("_rn")), lit(0L))).head.getLong(0)
    val t = coalesce(col("_tn"), lit(0L))
    val r = coalesce(col("_rn"), lit(0L))
    tc.join(rc, Seq("bucket"), "full_outer")
      .select(col("bucket"),
        floor(log((t + 1) * lit(rTot + buckets)
          / ((r + 1) * lit(tTot + buckets))) * 1e6 + 0.5)
          .cast("long").as("w_unats"))
  }

  /** Corpus DRIFT between two snapshots: KL(target ‖ raw) over the hashed
    * unigram buckets, in integer (count × micro-nat) units — the
    * distribution-shift monitor a pipeline runs between crawl snapshots
    * (did this month's data move away from last month's?). Reuses the
    * DSIR machinery exactly: KL = Σ_b p_b·ln(p_b/q_b) with add-one
    * smoothing is `Σ_b tc_b · w_b / T` — target counts (integers) times
    * the micro-nat weight table ([[weightTable]]) — so the bucket sum is
    * a pure INTEGER dot product, order-independent and replayable in SQL.
    * Returns one row: `(n_buckets, t_tokens, kl_unats_sum)` where
    * `kl_unats_sum/t_tokens` is the per-token KL estimate in micro-nats.
    */
  def driftUnats(raw: DataFrame, target: DataFrame, textCol: String,
                 buckets: Int = 1024): DataFrame =
    driftFromSnapshot(snapshot(raw, textCol, buckets), target, textCol)

  /** [[driftUnats]] of `target` against a stored [[CorpusSnapshot]] of the
    * raw/old corpus — the monitor's deployed shape: only the NEW data is
    * tokenized; the old side contributes its ≤ `buckets` persisted count
    * rows. Integer counts × integer weights, so the result is identical
    * whether the snapshot came from parquet or was built in-query.
    */
  def driftFromSnapshot(rawSnap: CorpusSnapshot, target: DataFrame,
                        textCol: String): DataFrame = {
    // tc feeds BOTH the weight table and the drift join — materialize the
    // ≤ `buckets`-row aggregate once instead of tokenizing target twice
    val tc = bucketCounts(target, textCol, rawSnap.buckets)
      .localCheckpoint(true)
    val weights = weightTableFromCounts(rawSnap.counts, tc, rawSnap.buckets)
    tc.join(weights, Seq("bucket"))
      .agg(count(lit(1)).as("n_buckets"),
        sum(col("n")).as("t_tokens"),
        sum(col("n") * col("w_unats")).as("kl_unats_sum"))
  }

  /** Score `raw` documents against a `target` sample: per doc, the token
    * count and the integer micro-nat importance score (sum of bucket
    * weights). Docs with no tokens score 0. Higher = more target-like;
    * downstream selection is a deterministic top-k or a
    * [[Sampling.tokenBudgetSample]]-style prefix over the score order.
    */
  def importanceScores(raw: DataFrame, target: DataFrame, idCol: String,
                       textCol: String, buckets: Int = 1024): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    scoreWith(trainModel(raw, target, textCol, buckets), raw, idCol, textCol)
  }

  /** Score a raw batch against a (possibly loaded) [[DsirModel]] — the
    * steady-state crawl path: no re-training, just explode →
    * broadcast-join on the ≤ `buckets`-row weight table → integer sum.
    */
  def scoreWith(model: DsirModel, raw: DataFrame, idCol: String,
                textCol: String): DataFrame = {
    val toks = raw.select(col(idCol),
        explode(TextFunctions.tokens(col(textCol))).as("_tok"))
      .select(col(idCol),
        DedupFunctions.hash60(col("_tok")).%(model.buckets).as("bucket"))
    val scored = toks.join(broadcast(model.weights), Seq("bucket"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_toks"),
        sum(coalesce(col("w_unats"), lit(0L))).as("score_unats"))
    // empty docs drop out of the explode — restore them with score 0
    raw.select(col(idCol)).join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_toks"), lit(0L)).as("n_toks"),
        coalesce(col("score_unats"), lit(0L)).as("score_unats"))
  }
}
