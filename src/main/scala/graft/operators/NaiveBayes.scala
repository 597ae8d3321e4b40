package graft.operators

import graft.functions.{DedupFunctions, TextFunctions}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multinomial Naive Bayes text classifier over hashed unigram features —
  * the fastText-shaped linear quality/language/domain filter every
  * large-scale curation pipeline trains on weak labels and sweeps over
  * the crawl (GPT-3's quality classifier, CCNet's language filter).
  *
  * Determinism discipline (the [[Dsir]] recipe): all counts are exact
  * integers; each (label, bucket) pays ONE `ln` of an exact integer
  * ratio — add-one smoothed `ln((c_lb+1)/(tot_l+B))` — quantized to
  * integer MICRO-NATS; a document's per-label score is the INTEGER sum
  * `prior_unats + Σ w_unats` (unseen buckets coalesce to the label's
  * default `ln(1/(tot_l+B))` weight). No float ever accumulates, so
  * predictions are partition-independent and the DuckDB oracle replays
  * the whole train+score round-trip bit-exactly. Argmax ties break on
  * the label string.
  *
  * Scale shape: training is two map-side-combinable aggregations bounded
  * by `labels × buckets` rows (a fixed model size — the hashing trick's
  * design point, NOT corpus cardinality); the model broadcasts; scoring
  * is explode → broadcast join → integer partial-agg → a per-document
  * window. Nothing driver-side, no corpus-sized shuffle beyond the
  * (doc, label) aggregation that scoring inherently is.
  */
object NaiveBayes {

  /** Per-class table: `(label, n_docs, tot_toks, prior_unats,
    * dflt_unats)` — document priors and the unseen-bucket default
    * weight, both micro-nat quantized. Bounded by the label count.
    */
  def classTable(train: DataFrame, labelCol: String, textCol: String,
                 buckets: Int): DataFrame = {
    val nDocs = train.count()
    // an EMPTY training set yields an empty class table (and so an empty
    // weight table and zero predictions downstream) — the label-less
    // corpus is a state a fresh pipeline legitimately passes through, not
    // an error; the 0-denominator prior expression below never evaluates
    // because there are no rows to evaluate it on
    train.groupBy(col(labelCol).as("label"))
      .agg(count(lit(1)).as("n_docs"),
        coalesce(sum(size(TextFunctions.tokens(col(textCol))).cast("long")),
          lit(0L)).as("tot_toks"))
      .select(col("label"), col("n_docs"), col("tot_toks"),
        floor(log(col("n_docs").cast("double") / lit(nDocs.toDouble))
          * 1e6 + 0.5).cast("long").as("prior_unats"),
        floor(log(lit(1.0) / (col("tot_toks") + lit(buckets)).cast("double"))
          * 1e6 + 0.5).cast("long").as("dflt_unats"))
  }

  /** The model proper: `(label, bucket, w_unats)` — add-one-smoothed
    * log-likelihood of each hashed unigram bucket under each class, in
    * integer micro-nats. ≤ `labels × buckets` rows.
    */
  def weightTable(train: DataFrame, labelCol: String, textCol: String,
                  buckets: Int): DataFrame =
    weightTableFrom(classTable(train, labelCol, textCol, buckets),
      train, labelCol, textCol, buckets)

  /** [[weightTable]] with a precomputed [[classTable]], so callers that
    * need both (e.g. [[classify]]) don't re-aggregate the training set.
    */
  private def weightTableFrom(cls: DataFrame, train: DataFrame,
                              labelCol: String, textCol: String,
                              buckets: Int): DataFrame = {
    train.select(col(labelCol).as("label"),
        explode(TextFunctions.tokens(col(textCol))).as("_tok"))
      .select(col("label"),
        DedupFunctions.hash60(col("_tok")).%(buckets).as("bucket"))
      .groupBy(col("label"), col("bucket")).agg(count(lit(1)).as("n"))
      .join(cls.select(col("label"), col("tot_toks")), Seq("label"))
      .select(col("label"), col("bucket"),
        floor(log((col("n") + 1).cast("double")
            / (col("tot_toks") + lit(buckets)).cast("double"))
          * 1e6 + 0.5).cast("long").as("w_unats"))
  }

  /** The trained classifier: class priors/defaults + bucket weights,
    * both bounded by `labels × buckets` rows. Deployment shape: train
    * ONCE on the labeled set, [[NbModel.save]], then [[classifyWith]]
    * every crawl batch against the loaded model — the labeled set is
    * never re-aggregated (the same train-once/score-many lifecycle as
    * [[Dsir.DsirModel]] / [[LmScore.BigramModel]] / the ANN indexes).
    * Integer micro-nat weights round-trip parquet exactly, so loaded-
    * model predictions are bit-identical to in-query training.
    */
  final case class NbModel(classes: DataFrame, weights: DataFrame,
                           buckets: Int) {
    def save(path: String): Unit = {
      classes.write.mode("overwrite").parquet(s"$path/classes")
      weights.write.mode("overwrite").parquet(s"$path/weights")
      val spark = classes.sparkSession
      import spark.implicits._
      Seq(buckets).toDF("buckets")
        .write.mode("overwrite").parquet(s"$path/meta")
    }
  }

  /** Train the classifier (class table + weight table, two aggregations
    * over the labeled set — the class table is label-count-sized and
    * materialized once to feed both).
    */
  def trainModel(train: DataFrame, labelCol: String, textCol: String,
                 buckets: Int = 1024): NbModel = {
    require(buckets > 0, "buckets must be positive")
    // A NULL label is an UNLABELED row, not a class: training it as one
    // would both pollute the priors and make "no label" a predictable
    // outcome — and the argmax tiebreak on a NULL "class" is
    // engine-divergent (Spark sorts ASC nulls-first, ANSI engines
    // nulls-last; fuzz seed 48 hit exactly that tie). Drop unlabeled
    // rows before every training aggregate; the oracle mirrors the
    // filter.
    val labeled = train.where(col(labelCol).isNotNull)
    // the class table is label-count-sized — materialize it once (driver
    // collect would also be fine; localCheckpoint keeps it off-driver)
    // and feed both the model build and the scorer, so the training set
    // is aggregated twice (class stats + bucket counts), not four times.
    val cls = classTable(labeled, labelCol, textCol, buckets)
      .localCheckpoint(true)
    NbModel(cls, weightTableFrom(cls, labeled, labelCol, textCol, buckets),
      buckets)
  }

  /** Load a model persisted by [[NbModel.save]]. */
  def loadModel(spark: org.apache.spark.sql.SparkSession,
                path: String): NbModel =
    NbModel(spark.read.parquet(s"$path/classes"),
      spark.read.parquet(s"$path/weights"),
      spark.read.parquet(s"$path/meta").head.getInt(0))

  /** Train on `train` (labels in `labelCol`) and predict every `docs`
    * row: `(idCol, pred, score_unats)` — the argmax label and its
    * integer log-posterior score. Token-less documents fall back to the
    * prior-only argmax. Rank-stable: score ties break on label.
    */
  def classify(docs: DataFrame, train: DataFrame, idCol: String,
               labelCol: String, textCol: String,
               buckets: Int = 1024): DataFrame =
    classifyWith(trainModel(train, labelCol, textCol, buckets),
      docs, idCol, textCol)

  /** Predict with a (possibly loaded) [[NbModel]] — the steady-state
    * crawl path: explode → broadcast model joins → integer sums → one
    * per-document window.
    */
  def classifyWith(model: NbModel, docs: DataFrame, idCol: String,
                   textCol: String): DataFrame = {
    val cls = model.classes
    val toks = docs.select(col(idCol),
        explode(TextFunctions.tokens(col(textCol))).as("_tok"))
      .select(col(idCol),
        DedupFunctions.hash60(col("_tok")).%(model.buckets).as("bucket"))
    val scored = toks
      .crossJoin(broadcast(cls.select(col("label"), col("prior_unats"),
        col("dflt_unats"))))
      .join(broadcast(model.weights), Seq("label", "bucket"), "left")
      .groupBy(col(idCol), col("label"), col("prior_unats"))
      .agg(sum(coalesce(col("w_unats"), col("dflt_unats"))).as("_tok_unats"))
      .select(col(idCol), col("label"),
        (col("prior_unats") + col("_tok_unats")).as("score_unats"))
    // empty docs drop out of the explode — restore them prior-only
    val empties = docs.select(col(idCol))
      .join(toks.select(col(idCol)).distinct(), Seq(idCol), "left_anti")
      .crossJoin(broadcast(cls.select(col("label"),
        col("prior_unats").as("score_unats"))))
      .select(col(idCol), col("label"), col("score_unats"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("score_unats").desc, col("label").asc)
    scored.unionByName(empties)
      .withColumn("_rn", row_number().over(w)).where(col("_rn") === 1)
      .select(col(idCol), col("label").as("pred"), col("score_unats"))
  }
}
