package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** C4-style heuristic cleaning rules (Raffel et al. 2020, "Exploring the
  * Limits of Transfer Learning…", §2.2) — the line-level scrub that
  * precedes statistical quality filters in a web-scale pre-training
  * pipeline. Complements [[Repetition]] (Gopher's *statistical* gates)
  * with C4's *structural* ones:
  *
  *   - a LINE survives iff it ends in terminal punctuation, has at least
  *     `minLineWords` words, and does not mention "javascript" (the
  *     boilerplate "enable javascript" banner killer);
  *   - a PAGE survives iff at least `minKeptLines` lines survived, it does
  *     not contain "lorem ipsum" (template placeholder), and does not
  *     contain "{" (source code / templating leak).
  *
  * Everything is a per-row composition of codegen'd built-ins (split /
  * filter / rlike / contains) — no UDFs, no shuffle; the whole battery
  * fuses into the scan. Each rule is mirrored 1:1 by the DuckDB oracle
  * (`text_c4_filters`), so the exact regexes here are load-bearing — keep
  * them in sync with [[graft.SparkEntry.oracleSql]].
  *
  * The reference engine has no document-cleaning surface at all (its
  * pipeline stops at JSON field coercion — `JsonEventDeserializer`); this
  * module is part of the training-data capability layer this engine adds.
  */
object HeuristicFilters {

  /** Terminal-punctuation rule: the line must end in `.`, `!`, `?` or a
    * closing double quote (C4 keeps quoted dialogue lines).
    */
  private val TerminalPunct = "[.!?\"]$"

  /** Line keep predicate, applied to one trimmed non-empty line. Kept as
    * the composed PARITY REFERENCE for the native battery
    * ([[graft.functions.expressions.C4KeptLines]] — same compiled
    * terminal-punctuation regex, same word-run count, same lower-cased
    * contains), which [[annotate]] uses on the hot path: the composed
    * form re-split every line inside an interpreted per-line lambda.
    */
  def lineKept(l: Column, minLineWords: Int): Column =
    l.rlike(TerminalPunct) &&
      size(filter(split(l, "\\s+"), w => length(w) > 0)) >= minLineWords &&
      !contains(lower(l), lit("javascript"))

  /** Annotate each document with its C4 verdicts without dropping
    * anything: surviving-line count, page-level flags, the scrubbed text
    * (surviving lines rejoined with newlines), and the final `kept` bit.
    * Keeping annotation separate from filtering lets a pipeline audit
    * what each rule removed (the funnel shape [[DocPipeline.funnel]]
    * popularized) before committing to the drop.
    */
  def annotate(df: DataFrame, idCol: String, textCol: String,
               minLineWords: Int = 5, minKeptLines: Int = 3): DataFrame = {
    // NULL text behaves as empty (0 lines, flags false, doc dropped) —
    // without the coalesce every annotation is null and the doc silently
    // vanishes from downstream `where(kept)` AND `where(!kept)` audits
    val t = coalesce(col(textCol), lit(""))
    val ls = TextFunctions.lines(t)
    val keptLines =
      graft.functions.expressions.LineExpressions.c4_kept_lines(t, minLineWords)
    df.withColumn("n_lines", size(ls).cast("long"))
      .withColumn("_kept_lines", keptLines)
      .withColumn("n_kept_lines", size(col("_kept_lines")).cast("long"))
      .withColumn("has_lorem", contains(lower(t), lit("lorem ipsum")))
      .withColumn("has_brace", contains(t, lit("{")))
      .withColumn("clean_text", array_join(col("_kept_lines"), "\n"))
      .withColumn("kept",
        col("n_kept_lines") >= minKeptLines && !col("has_lorem") && !col("has_brace"))
      .drop("_kept_lines")
  }

  /** The filtering form: surviving documents only, with `textCol` replaced
    * by the scrubbed text — drop-in ahead of [[DocPipeline.clean]].
    */
  def clean(df: DataFrame, idCol: String, textCol: String,
            minLineWords: Int = 5, minKeptLines: Int = 3): DataFrame = {
    val cols = df.columns.map {
      case c if c == textCol => col("clean_text").as(textCol)
      case c                 => col(c)
    }
    annotate(df, idCol, textCol, minLineWords, minKeptLines)
      .where(col("kept"))
      .select(cols.toSeq: _*)
  }
}
