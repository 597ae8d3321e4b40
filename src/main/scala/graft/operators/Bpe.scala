package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-Pair-Encoding subword tokenizer training and segmentation
  * (Sennrich et al. 2016, "Neural Machine Translation of Rare Words with
  * Subword Units") — the tokenizer-construction step of a training-data
  * pipeline, run over the corpus the tokenizer will serve.
  *
  * Everything operates on the distinct-word FREQUENCY table, not the
  * corpus: BPE statistics are word-shape statistics, so the working set is
  * the vocabulary (bounded, Zipf-concentrated), and the corpus is touched
  * exactly once to build it. Each training round is one distributed
  * aggregation over that table with a 1-row argmax to the driver; k merge
  * rounds = k small jobs. Segmentation likewise segments the VOCAB (chained
  * codegen'd regexp merges — no lambdas, no UDFs) and equi-joins words back
  * to documents; AQE broadcasts the vocab side when it is small.
  *
  * A word is represented as its space-joined symbol sequence padded with
  * sentinel spaces (`" l o w "`); one merge `(a, b)` is the regex
  * `(?<= )a b(?= )` → `ab` — the zero-width lookarounds keep the shared
  * boundary space visible to the NEXT match, so `a a a a` merges to
  * `aa aa` in one pass exactly like the reference implementation (a plain
  * literal `" a b "` replace would consume the middle space and stop at
  * `aa a a`).
  *
  * At real tokenizer scale (32k merges over a 10^8-word web vocabulary)
  * the round loop is the textbook algorithm but not the fastest one —
  * production trainers cache pair→word inverted indexes; the operator
  * contract here is correctness + boundedness (nothing driver-side beyond
  * the per-round 1-row argmax), with `minPairCount` stopping early when
  * the corpus runs out of repeated pairs.
  */
object Bpe {

  /** One learned merge: the pair and its weighted count when chosen. */
  final case class Merge(a: String, b: String, count: Long) {
    def pair: String = s"$a $b"
    def joined: String = a + b
  }

  /** Persist learned merges (train once, segment many — the IVF/PQ/PCA
    * lifecycle): newline-separated `a<TAB>b<TAB>count` lines in learn
    * order, the interchange format BPE merge files conventionally use.
    */
  def saveMerges(merges: Seq[Merge], path: String,
                 conf: org.apache.hadoop.conf.Configuration): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val out = fs.create(p, true)
    val body = merges.map(m => s"${m.a}\t${m.b}\t${m.count}").mkString("\n")
    try out.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Load merges persisted by [[saveMerges]] (order preserved). */
  def loadMerges(path: String,
                 conf: org.apache.hadoop.conf.Configuration): Seq[Merge] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val in = fs.open(p)
    val body =
      try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
      finally in.close()
    body.linesIterator.filter(_.nonEmpty).map { line =>
      line.split("\t", 3) match {
        case Array(a, b, c) => Merge(a, b, c.toLong)
        case _ => sys.error(s"loadMerges: malformed line '$line' in $path")
      }
    }.toSeq
  }

  /** The corpus reduced to its (word, freq) vocabulary table. */
  def wordFreqs(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(TextFunctions.tokens(col(textCol))).as("_w"))
      .groupBy(col("_w")).agg(count(lit(1)).as("_f"))

  /** `" l o w "`: padded space-joined symbol sequence of a word. */
  private def paddedChars(w: Column): Column =
    concat(lit(" "), regexp_replace(w, "(.)", "$1 "))

  /** Chain the learned merges over a padded symbol sequence, in learn
    * order — each is one codegen'd regexp_replace.
    */
  private def applyMerges(padded: Column, merges: Seq[Merge]): Column =
    merges.foldLeft(padded) { (c, m) =>
      regexp_replace(c,
        "(?<= )" + java.util.regex.Pattern.quote(m.a) + " " +
          java.util.regex.Pattern.quote(m.b) + "(?= )",
        java.util.regex.Matcher.quoteReplacement(m.joined))
    }

  /** Adjacent symbol pairs (`"a b"` strings) of a padded segmentation,
    * weighted downstream by word frequency. Single-symbol words emit none.
    */
  private def symbolPairs(padded: Column): Column =
    filter(TextFunctions.shingles(trim(padded), 2), g => instr(g, " ") > 0)

  /** Weighted pair counts of the corpus under `merges` (round-0 = plain
    * character pairs) — the table each training round argmaxes over.
    */
  def pairCounts(df: DataFrame, textCol: String,
                 merges: Seq[Merge] = Nil): DataFrame =
    wordFreqs(df, textCol)
      .select(col("_f"),
        explode(symbolPairs(applyMerges(paddedChars(col("_w")), merges))).as("pair"))
      .groupBy(col("pair")).agg(sum(col("_f")).as("cnt"))

  /** Train `numMerges` merges; stops early when the best remaining pair
    * occurs fewer than `minPairCount` times. The vocabulary table is
    * materialized once (it feeds every round).
    */
  def train(df: DataFrame, textCol: String, numMerges: Int,
            minPairCount: Long = 2L): Seq[Merge] = {
    require(numMerges > 0, "numMerges must be positive")
    val wf = wordFreqs(df, textCol).localCheckpoint(true)
    var merges = Vector.empty[Merge]
    var done = false
    while (merges.size < numMerges && !done) {
      val top = wf.select(col("_f"),
          explode(symbolPairs(applyMerges(paddedChars(col("_w")),
            merges))).as("_p"))
        .groupBy(col("_p")).agg(sum(col("_f")).as("_c"))
        .orderBy(col("_c").desc, col("_p").asc)
        .limit(1).collect()
      if (top.isEmpty || top.head.getLong(1) < minPairCount) done = true
      else {
        val Array(a, b) = top.head.getString(0).split(" ", 2)
        merges = merges :+ Merge(a, b, top.head.getLong(1))
      }
    }
    merges
  }

  /** Segment the corpus vocabulary under the learned merges:
    * `(_w, subwords)` — one row per DISTINCT word.
    */
  def segmentVocab(df: DataFrame, textCol: String,
                   merges: Seq[Merge]): DataFrame =
    df.select(explode(TextFunctions.tokens(col(textCol))).as("_w")).distinct()
      .withColumn("subwords",
        split(trim(applyMerges(paddedChars(col("_w")), merges)), " "))

  /** Per-document subword statistics under the learned merges: word,
    * character, and subword counts (the real-token-budget numbers a
    * whitespace estimate approximates). Empty docs report zeros.
    */
  def subwordCounts(df: DataFrame, idCol: String, textCol: String,
                    merges: Seq[Merge]): DataFrame = {
    val vocab = segmentVocab(df, textCol, merges)
    val agg = df.select(col(idCol),
        explode(TextFunctions.tokens(col(textCol))).as("_w"))
      .join(vocab, Seq("_w"))
      .groupBy(col(idCol)).agg(
        count(lit(1)).as("n_words"),
        sum(length(col("_w"))).as("n_chars"),
        sum(size(col("subwords"))).as("n_subwords"))
    df.select(col(idCol)).join(agg, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("n_chars"), lit(0L)).as("n_chars"),
        coalesce(col("n_subwords"), lit(0L)).as("n_subwords"))
  }
}
