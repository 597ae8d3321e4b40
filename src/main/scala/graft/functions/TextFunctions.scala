package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines.
  *
  * All of these are pure `org.apache.spark.sql.functions` compositions —
  * codegen'd end-to-end, no UDFs, so they stay inside WholeStageCodegen and
  * scale linearly with no shuffle. Every definition is mirrored 1:1 by an
  * ANSI-SQL oracle in [[graft.SparkEntry.oracleSql]] (DuckDB-checked).
  */
object TextFunctions {

  /** Lower-cased whitespace tokens (empty tokens dropped).
    * `array_remove(_, "")` rather than `filter(_, length > 0)`: identical
    * on split output (split never yields null elements, and its only
    * zero-length products are literal `""`s from leading separators or
    * empty input), but array_remove is a plain codegen'd expression while
    * filter is an interpreted higher-order lambda — and tokens() sits
    * under most full-corpus text paths.
    */
  def tokens(text: Column): Column =
    array_remove(split(lower(trim(text)), "\\s+"), "")

  /** Whitespace token count — the cheap token-budget estimator. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** Non-empty trimmed lines (CRLF-tolerant). Per-row array — the unit of
    * the line-level repetition signals in [[graft.operators.Repetition]].
    * Native single pass ([[expressions.SplitLines]]) — the composed
    * `filter(transform(split(...), trim), length > 0)` paid two
    * interpreted lambdas per document; contract identical.
    */
  def lines(text: Column): Column =
    expressions.LineExpressions.split_lines(text)

  // ------------------------------------------------------- PII scrubbing

  /** Conservative PII/artifact patterns, valid in both Java regex and
    * RE2-style engines (so the oracle can mirror them verbatim): URLs
    * first (an address inside a URL is part of the URL), then emails,
    * then IPv4 literals.
    */
  /** The email repetitions are RFC-5321-BOUNDED ({1,64} local, {1,255}
    * domain, {2,24} TLD) rather than open-ended — semantically a no-op
    * for every real address, and it caps Java-regex backtracking at a
    * constant per start position: an unbounded `[…]+@` is O(len²) on a
    * giant address-less token (a 200 KB minified blob measured in the
    * hours — drill wave 9), the bounded form is linear. The oracle SQL
    * uses the identical bounded pattern.
    */
  val PiiPatterns: Seq[(String, String)] = Seq(
    "https?://[^\\s]+"                                    -> "<URL>",
    "[A-Za-z0-9._%+-]{1,64}@[A-Za-z0-9.-]{1,255}\\.[A-Za-z]{2,24}" -> "<EMAIL>",
    "\\b\\d{1,3}(\\.\\d{1,3}){3}\\b"                      -> "<IP>")

  /** Redact PII-ish spans (URL/email/IPv4) with typed placeholders — the
    * pre-training scrub pass. Per-row regexp chain, codegen'd, no shuffle.
    */
  def redact(text: Column): Column =
    PiiPatterns.foldLeft(text) { case (c, (p, r)) => regexp_replace(c, p, r) }

  /** Count matches of one PII pattern (0 = whole match). */
  def piiCount(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0)))

  /** Token-bounded overlapping chunks — the context-window splitter every
    * training/RAG pipeline needs: windows of `chunkTokens` tokens starting
    * every `chunkTokens - overlapTokens`, rejoined with single spaces.
    * Pure built-in composition (sequence/transform/slice — codegen'd,
    * per-row, shuffle-free); explode downstream for one-row-per-chunk.
    */
  def chunks(text: Column, chunkTokens: Int, overlapTokens: Int = 0): Column = {
    require(chunkTokens > 0 && overlapTokens >= 0 && overlapTokens < chunkTokens,
      s"need 0 <= overlap < chunk, got chunk=$chunkTokens overlap=$overlapTokens")
    val stride = chunkTokens - overlapTokens
    val toks = tokens(text)
    when(size(toks) === 0, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(0), size(toks) - 1, lit(stride)),
        s => array_join(slice(toks, s + 1, lit(chunkTokens)), " ")))
  }

  /** BPE-ish token-budget estimate: whitespace words + punctuation marks
    * counted as separate tokens, plus an extra token per 8 characters of
    * long words (approximating subword splits). Pure arithmetic — portable
    * to any SQL engine (mirrored in the oracle).
    */
  def subwordCountEstimate(text: Column): Column = {
    val toks = tokens(text)
    val n = size(toks)
    val punct = length(text) - length(PunctChars.foldLeft(text)((c, p) =>
      replace(c, lit(p), lit(""))))
    // native codegen'd fold (Σ floor(len/8) over tokens) — the composed
    // aggregate(...) HOF was an interpreted per-row lambda on the
    // full-corpus token-budget path; contract identical (see SumLenDiv)
    val longWordExtra = expressions.SumLenDiv.sum_len_div(toks, 8)
    n + punct + longWordExtra
  }

  /** Word n-gram shingles, joined with single spaces (input order kept).
    * Native single-pass expression — the composed transform/element_at
    * form re-split the text per element under interpreted lambda eval.
    */
  def shingles(text: Column, n: Int): Column =
    expressions.WordShingles.word_shingles(text, n)

  /** Winnowing fingerprint selection (Schleimer et al., SIGMOD'03
    * "Winnowing: Local Algorithms for Document Fingerprinting"): hash
    * the word `n`-gram shingles, slide a window of `w` consecutive
    * hashes, keep each window's minimum — any shared passage of
    * ≥ `w + n − 1` tokens is guaranteed to share a fingerprint, at
    * ~2/(w+1) selection density. The standard robust alternative to
    * fixed-stride fingerprinting for plagiarism/near-dup detection.
    * Native single-pass expression ([[expressions.WinnowSelect]],
    * monotonic-deque windowed min — the composed
    * `transform(sequence, i → array_min(slice))` form was interpreted
    * O(n·w) and ~50× slower). Docs with fewer than `w` shingles keep
    * their single global minimum.
    */
  def winnowedFingerprints(text: Column, n: Int, w: Int): Column =
    expressions.WinnowSelect.winnow_select(shingles(text, n), w)

  /** Language marker stopwords (tiny per-language sets; distinct-match
    * scoring). Mirrored literally in the SQL oracle — keep in sync.
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "it"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein"),
    "es" -> Seq("el", "la", "los", "las", "es", "y", "en", "un"),
    "fr" -> Seq("le", "les", "et", "est", "une", "dans", "que", "pour"),
    "zh" -> Seq("的", "是", "不", "我", "了", "在", "人", "有"))

  /** n-gram/stopword language-ID heuristic: distinct marker hits per
    * language; highest score wins, ties resolve in [[LangMarkers]] order;
    * zero hits everywhere → "und" (undetermined).
    */
  def langId(text: Column): Column = {
    val toks = tokens(text)
    val scores = LangMarkers.map { case (lang, markers) =>
      lang -> size(array_intersect(toks, array(markers.map(lit): _*)))
    }
    val best = greatest(scores.map(_._2): _*)
    scores.foldRight(lit("und"): Column) { case ((lang, s), rest) =>
      when(s === best && s > 0, lit(lang)).otherwise(rest)
    }
  }

  private val PunctChars = Seq(".", ",", "!", "?", ";", ":")

  /** Punctuation-character fraction of the text (0 for empty). */
  def punctRatio(text: Column): Column = {
    val stripped = PunctChars.foldLeft(text)((c, p) => replace(c, lit(p), lit("")))
    when(length(text) === 0, lit(0.0))
      .otherwise((length(text) - length(stripped)).cast("double") / length(text))
  }

  /** Heuristic document-quality score in [0,1]: token volume, low
    * punctuation density, stopword presence, plausible mean word length.
    * Weights are part of the operator contract (mirrored in SQL).
    */
  def qualityScore(text: Column): Column = {
    val toks = tokens(text)
    val n = size(toks).cast("double")
    val stopFrac = size(array_intersect(toks,
      array(LangMarkers.flatMap(_._2).distinct.map(lit): _*))).cast("double") /
      greatest(n, lit(1.0))
    val avgWl = length(regexp_replace(text, "\\s+", "")).cast("double") / greatest(n, lit(1.0))
    lit(0.3) * least(lit(1.0), n / 50.0) +
      lit(0.3) * (lit(1.0) - least(lit(1.0), punctRatio(text) * 10.0)) +
      lit(0.2) * least(lit(1.0), stopFrac * 4.0) +
      lit(0.2) * least(lit(1.0), greatest(avgWl - 2.0, lit(0.0)) / 8.0)
  }

  /** Cross-engine-stable presentation of a [0,1] score: integer basis
    * points via `floor(x*10000 + 0.5)`. `round(x, 4)` is NOT stable across
    * engines — at an exact half-boundary (e.g. 0.53375) Spark's
    * BigDecimal HALF_UP and DuckDB's rounding disagree on the same double.
    */
  def basisPoints(x: Column): Column = floor(x * 10000 + 0.5).cast("long")

  /** Common HTML entities decoded after tag removal. Order matters:
    * `&amp;` decodes LAST so `&amp;lt;` becomes the literal `&lt;` and not
    * a re-decoded `<` (the standard double-escape rule). Mirrored
    * literally in the SQL oracle — keep in sync.
    */
  val HtmlEntities: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&#39;" -> "'",
    "&nbsp;" -> " ", "&amp;" -> "&")

  /** Strip HTML/XML markup: drop tags (replaced by a space so adjacent
    * words don't fuse), decode the common entities, collapse whitespace.
    * Per-row regexp/replace chain — codegen'd, shuffle-free; the web-scrape
    * cleaning pass that precedes every other text operator.
    */
  def stripMarkup(text: Column): Column = {
    val untagged = regexp_replace(text, "<[^>]*>", " ")
    val decoded = HtmlEntities.foldLeft(untagged) { case (c, (e, r)) =>
      replace(c, lit(e), lit(r))
    }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** Cleaning normalization: lower-case, collapse whitespace, drop
    * stopwords — the standard pre-tokenization scrub of a training-data
    * pipeline. Stays codegen-composable (filter + array_join).
    */
  def normalize(text: Column, stopwords: Seq[String]): Column =
    array_join(filter(tokens(text),
      t => !t.isin(stopwords.map(lit(_).cast("string")): _*)), " ")

  /** Content fingerprint: md5 of the whitespace-normalized, lower-cased
    * text — the exact-dedup key that survives formatting noise.
    */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** 64-bit polynomial rolling hash over the normalized text (base-257 mod
    * 2^61-1), as a native codegen'd expression —
    * [[graft.functions.expressions.RollingHash]].
    */
  def rollingHash(text: Column): Column =
    expressions.RollingHash.rolling_hash(
      regexp_replace(lower(trim(text)), "\\s+", " "))
}
