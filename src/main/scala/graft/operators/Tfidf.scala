package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TF-IDF keyword extraction over a document corpus — the classic
  * "what is this document about" signal a curation pipeline uses for
  * topic filtering, per-domain balancing, and search-index building.
  *
  * Determinism discipline (the [[Dsir]] recipe): term and document
  * frequencies are exact integers; each distinct df value pays ONE `ln`
  * of an exact integer ratio, quantized to integer MICRO-NATS
  * (`floor(ln((N+1)/(df+1)) * 1e6 + 0.5)`); a term's score is the
  * INTEGER product `tf * idf_unats`. No float accumulates anywhere, so
  * results are independent of partitioning and the DuckDB oracle replays
  * them bit-exactly.
  *
  * Scale shape: the (doc, term) frequency table is an exploded
  * map-side-combinable aggregation; the idf table is vocabulary-sized
  * and joined on `term` with a plain shuffle equi-join (NOT broadcast —
  * a web-scale vocabulary is hundreds of millions of terms; AQE may
  * still pick broadcast when it is genuinely small); top-k selection is
  * a window partitioned BY DOCUMENT, so no global sort and no single hot
  * partition. Two corpus passes (tf + df) — both columnar scans of the
  * one text column.
  */
object Tfidf {

  /** Vocabulary document-frequency table: `(term, df)` — one row per
    * distinct lower-cased whitespace token, df = number of documents
    * containing it. Map-side-combinable; output is vocabulary-sized.
    */
  def docFreq(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol),
        explode(array_distinct(TextFunctions.tokens(col(textCol))))
          .as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("df"))

  /** `(term, df, idf_unats)` with smoothed inverse document frequency in
    * integer micro-nats: `floor(ln((n_docs+1)/(df+1)) * 1e6 + 0.5)`.
    * `n_docs` is taken once from a count-star (parquet-metadata cheap).
    */
  def idfTable(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val n = df.count()
    docFreq(df, idCol, textCol).select(col("term"), col("df"),
      floor(log(lit((n + 1).toDouble) / (col("df") + lit(1))) * 1e6 + 0.5)
        .cast("long").as("idf_unats"))
  }

  /** Persist an [[idfTable]] — the reference-corpus statistics a
    * deployment trains once and scores every new batch against
    * ([[topKeywordsWith]]); integer df/micro-nat idf round-trip parquet
    * exactly, so loaded-table scores are bit-identical.
    */
  def saveIdf(idf: DataFrame, path: String): Unit =
    idf.write.mode("overwrite").parquet(path)

  /** Load a table persisted by [[saveIdf]]. */
  def loadIdf(spark: org.apache.spark.sql.SparkSession,
              path: String): DataFrame = spark.read.parquet(path)

  /** Per-document top-`k` keywords by integer TF-IDF score, rank-stable:
    * ties break on the term string, so the output is total-ordered and
    * bit-reproducible. Documents with no tokens emit no rows.
    */
  def topKeywords(df: DataFrame, idCol: String, textCol: String,
                  k: Int): DataFrame =
    topKeywordsWith(idfTable(df, idCol, textCol), df, idCol, textCol, k)

  /** [[topKeywords]] against a precomputed (possibly [[loadIdf]]-ed) idf
    * table — the steady-state path: the reference corpus is never
    * re-aggregated; terms outside the reference vocabulary drop (inner
    * join), which is the standard out-of-vocabulary rule.
    */
  def topKeywordsWith(idf: DataFrame, df: DataFrame, idCol: String,
                      textCol: String, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val tf = df.select(col(idCol),
        explode(TextFunctions.tokens(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("score_unats").desc, col("term").asc)
    tf.join(idf, Seq("term"))
      .select(col(idCol), col("term"), col("tf"),
        (col("tf") * col("idf_unats")).as("score_unats"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
  }
}
