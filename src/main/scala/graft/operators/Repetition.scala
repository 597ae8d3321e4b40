package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Repetition-based quality signals for pre-training corpora — the
  * Gopher-rule family (Rae et al. 2021 §A1.1): documents dominated by
  * repeated lines or n-grams are boilerplate/spam and should be gated out
  * before training.
  *
  * Signals (all in basis points, 0..10000, via
  * [[TextFunctions.basisPoints]] so the oracle comparison is
  * integer-stable):
  *  - `dup_line_bp`   — fraction of non-empty lines that are repeats of an
  *    earlier-seen line (1 - distinct/total).
  *  - `dup_token_bp`  — same over whitespace tokens.
  *  - `top_bigram_bp` / `top_trigram_bp` — share of n-gram characters
  *    contained in occurrences of the single most frequent word n-gram
  *    (count ties broken by lexicographically smallest gram).
  *
  * Scale shape: the line/token signals are per-row array arithmetic
  * (`array_distinct` is linear in the doc — no shuffle); the top-n-gram
  * signals explode to (doc, gram), hash-aggregate the counts, and pick
  * the winner with a second `min_by` hash aggregate — two map-side-
  * combinable shuffles total, no sorts, no driver state, no all-pairs
  * anything. At 100 TB the explode width is bounded by document length,
  * and every aggregation is keyed by doc id (uniform, skew-free).
  */
object Repetition {

  /** Gate thresholds (basis points; token bounds inclusive). Defaults are
    * tuned to be discriminating on the synthetic corpus while following the
    * Gopher shape: volume floor, repetition ceilings.
    */
  final case class Config(minTokens: Int = 25, maxTokens: Int = 100000,
                          maxDupTokenBp: Int = 6000, maxTopBigramBp: Int = 800)

  private def bpShare(part: Column, whole: Column): Column =
    when(whole === 0, lit(0L))
      .otherwise(TextFunctions.basisPoints(part.cast("double") / whole))

  /** Character share of the most frequent word `n`-gram per document:
    * explode grams, count per (doc, gram), then ONE more hash aggregate
    * per doc — `min_by` over `struct(-cnt, gram)` picks the top gram with
    * the (count desc, gram asc) tie-break, and the ordering struct is
    * unique within a doc, so the result is deterministic. Two map-side-
    * combinable aggregations, no sort: the doc-partitioned rank window
    * this replaces paid a per-partition SORT of every (doc, gram) row.
    */
  private def topGramShare(docs: DataFrame, idCol: String, textCol: String,
                           n: Int, outName: String): DataFrame =
    docs
      .select(col(idCol),
        // explode_OUTER: a zero-token document has ZERO shingles now and
        // must still emit its one profile row (all-zero signals), not
        // vanish from the inner joins in profile()
        explode_outer(TextFunctions.shingles(coalesce(col(textCol), lit("")), n))
          .as("gram"))
      .groupBy(col(idCol), col("gram")).agg(count(lit(1)).as("cnt"))
      .groupBy(col(idCol))
      .agg(
        min_by(coalesce(col("cnt") * length(col("gram")), lit(0L)),
          struct((-col("cnt")).as("nc"), col("gram"))).as("gram_chars"),
        sum(coalesce(col("cnt") * length(col("gram")), lit(0L))).as("total_chars"))
      .select(col(idCol), bpShare(col("gram_chars"), col("total_chars")).as(outName))

  /** Per-document repetition profile:
    * `(id, n_lines, dup_line_bp, dup_token_bp, top_bigram_bp, top_trigram_bp)`.
    */
  def profile(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // NULL text behaves as empty text (all signals zero): exploding a null
    // shingle array emits no rows and would silently DROP the doc from the
    // inner joins below, breaking the one-row-per-document contract
    val t = coalesce(col(textCol), lit(""))
    val ls = TextFunctions.lines(t)
    val toks = TextFunctions.tokens(t)
    val perRow = docs.select(col(idCol),
      size(ls).as("n_lines"),
      bpShare(size(ls) - size(array_distinct(ls)), size(ls)).as("dup_line_bp"),
      bpShare(size(toks) - size(array_distinct(toks)), size(toks)).as("dup_token_bp"))
    perRow
      .join(topGramShare(docs, idCol, textCol, 2, "top_bigram_bp"), idCol)
      .join(topGramShare(docs, idCol, textCol, 3, "top_trigram_bp"), idCol)
  }

  /** Gopher-style repetition gate: the input rows (all columns kept) that
    * pass the volume floor and repetition ceilings, with the gating
    * signals attached.
    */
  def gate(docs: DataFrame, idCol: String, textCol: String,
           cfg: Config = Config()): DataFrame =
    docs
      .withColumn("n_tokens",
        TextFunctions.tokenCount(coalesce(col(textCol), lit(""))))
      .join(profile(docs, idCol, textCol)
        .select(col(idCol), col("dup_token_bp"), col("top_bigram_bp")), idCol)
      .where(col("n_tokens").between(cfg.minTokens, cfg.maxTokens) &&
        col("dup_token_bp") <= cfg.maxDupTokenBp &&
        col("top_bigram_bp") <= cfg.maxTopBigramBp)
}
