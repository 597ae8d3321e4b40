package graft.operators

import graft.functions.DedupFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for corpus curation — keep/drop is a pure
  * function of (salt, id) through the shared 60-bit hash: reproducible
  * across runs, engines, partitionings, and cluster sizes (no RNG state,
  * unlike `df.sample`), mirrorable in oracle SQL, and stable under corpus
  * growth (a kept id stays kept when new data arrives). Per-row filter —
  * no shuffle, fuses into the scan.
  */
object Sampling {

  /** Keep predicate: hash60(salt|id) mod 10000 < rateBp (basis points). */
  def keep(id: Column, rateBp: Int, salt: String): Column =
    DedupFunctions.hash60(concat_ws("|", lit(salt), id.cast("string")))
      .%(10000) < rateBp

  /** Uniform deterministic sample at `rateBp`/10000. */
  def deterministicSample(df: DataFrame, idCol: String, rateBp: Int,
                          salt: String = "sample"): DataFrame =
    df.where(keep(col(idCol), rateBp, salt))

  /** Stratified deterministic sample: per-stratum rates (downsample
    * dominant sources/languages, keep the tail), `defaultBp` elsewhere.
    */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
                       ratesBp: Map[String, Int], defaultBp: Int,
                       salt: String = "sample"): DataFrame = {
    val rate = ratesBp.foldLeft(lit(defaultBp)) { case (acc, (k, v)) =>
      when(col(strataCol) === k, lit(v)).otherwise(acc)
    }
    df.where(DedupFunctions.hash60(
      concat_ws("|", lit(salt), col(idCol).cast("string"))).%(10000) < rate)
  }

  /** Deterministic per-group cap: keep at most `k` rows per group,
    * ranked `(rankCol DESC, idCol ASC)` — the per-domain/per-source
    * ceiling a crawl pipeline applies so no single host dominates the
    * training mix (rank by a quality score to keep each domain's best
    * `k`). Appends a 1-based `rank` column. Total-ordered tiebreak on
    * the id, so output is bit-reproducible.
    *
    * Scale shape: one window partitioned BY GROUP — no global sort; a
    * group's sort is distributed across its partition and output is
    * bounded at `k` rows per group. A pathologically hot single group
    * (one domain = half the crawl) sorts on one reducer — pre-thin such
    * groups with [[stratifiedSample]] before capping if that shape is
    * expected.
    */
  def capPerGroup(df: DataFrame, idCol: String, groupCol: String,
                  rankCol: String, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(col(rankCol).desc, col(idCol).asc)
    df.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
  }

  /** Mixture sampling: resample the corpus toward TARGET source weights
    * under a total document budget — the data-mixing step of a training
    * run (the weights are the mixture config a method like DoReMi or a
    * hand-tuned Pile recipe produces; this operator applies them). Each
    * source's keep rate is `min(1, budget·w_s / (W·n_s))` in basis points
    * with exact BigInt floor arithmetic — no floating point anywhere, so
    * the kept set is bit-reproducible across engines and replayable in
    * oracle SQL. Sources absent from `weights` are dropped; weighted
    * sources absent from the corpus are renormalized away (their quota is
    * redistributed), matching how mixture configs are applied in practice.
    *
    * Scale shape: one map-side-combinable count over a source-only scan
    * (driver state = one row per WEIGHTED source — a mixture config is
    * dozens of buckets, not per-domain cardinality; for per-domain
    * weighting use [[stratifiedSample]] with a rates table), then a
    * broadcast join of the tiny rate table and a per-row hash filter that
    * fuses into the scan. An undershoot from rate flooring is at most one
    * doc per 10000 per source.
    */
  def mixtureSample(df: DataFrame, idCol: String, sourceCol: String,
                    weights: Map[String, Long], budgetDocs: Long,
                    salt: String = "mix"): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "weights must be positive")
    val spark = df.sparkSession
    val counts: Map[String, Long] = df
      .where(col(sourceCol).isin(weights.keys.toSeq: _*))
      .groupBy(col(sourceCol)).agg(count(lit(1)).as("_n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val wSum = BigInt(counts.keysIterator.map(weights).sum) // present sources only
    val rates = counts.toSeq.map { case (src, n) =>
      val bp = BigInt(10000) * budgetDocs * weights(src) / (wSum * n)
      (src, bp.min(10000).toLong)
    }
    import spark.implicits._
    val rateDf = rates.toDF(sourceCol, "_rate_bp")
    df.join(broadcast(rateDf), Seq(sourceCol))
      .where(DedupFunctions.hash60(
        concat_ws("|", lit(salt), col(idCol).cast("string"))).%(10000)
        < col("_rate_bp"))
      .select(df.columns.map(col).toSeq: _*) // original column order
  }

  /** Square-root TEMPERATURE mixture (α = 0.5 sampling, the multilingual
    * balancing recipe mT5/XLM-R popularized): per-source keep rates are
    * proportional to `isqrt(n_s)` — small sources are boosted relative to
    * their size, dominant ones damped — normalized to a total document
    * budget. All arithmetic is exact integers (BigInt integer square
    * root), so the kept set is bit-reproducible and the oracle replays it
    * with `floor(sqrt(n))` (IEEE sqrt is correctly rounded, and no
    * non-square integer sits within half an ulp of an integer root, so
    * the floor agrees exactly for any realistic count).
    *
    * Scale shape: identical to [[mixtureSample]] — one map-side count per
    * source, a broadcast rate table, a per-row hash filter fused into the
    * scan.
    */
  def sqrtMixtureSample(df: DataFrame, idCol: String, sourceCol: String,
                        budgetDocs: Long, salt: String = "mix"): DataFrame = {
    val spark = df.sparkSession
    // null sources are unmixable (and would NPE the collect): excluded
    // from the quota AND from the output (the rate join can't match null)
    val counts: Seq[(String, Long)] = df
      .where(col(sourceCol).isNotNull)
      .groupBy(col(sourceCol)).agg(count(lit(1)).as("_n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    // nothing to mix (empty corpus or all-null sources): the mixture of
    // zero sources is the empty corpus, not an error
    if (counts.isEmpty)
      return df.where(lit(false)).select(df.columns.map(col).toSeq: _*)
    def isqrt(n: BigInt): BigInt =
      if (n < 2) n
      else {
        var x = BigInt(math.sqrt(n.toDouble).toLong + 1)
        while (x * x > n) x = (x + n / x) / 2
        x
      }
    val wSum = counts.map(c => isqrt(BigInt(c._2))).sum
    val rates = counts.map { case (src, n) =>
      val bp = BigInt(10000) * budgetDocs * isqrt(BigInt(n)) / (wSum * n)
      (src, bp.min(10000).toLong)
    }
    import spark.implicits._
    val rateDf = rates.toDF(sourceCol, "_rate_bp")
    df.join(broadcast(rateDf), Seq(sourceCol))
      .where(DedupFunctions.hash60(
        concat_ws("|", lit(salt), col(idCol).cast("string"))).%(10000)
        < col("_rate_bp"))
      .select(df.columns.map(col).toSeq: _*)
  }

  /** Mixture resampling with UPSAMPLING: like [[mixtureSample]] but a
    * source whose quota exceeds its size is repeated for multiple epochs
    * (the way real training recipes weight small high-value sources —
    * wiki/books run several epochs while the web crawl runs a fraction of
    * one). Every doc gets `rate div 1` full copies plus one more iff its
    * hash falls under the fractional remainder — so the output is exactly
    * the deterministic-sample generalization to rates above 100%, bit-
    * reproducible and replayable in oracle SQL. Output rows carry an
    * `epoch` column (0-based copy index) so downstream shuffling can
    * spread copies across the training order.
    *
    * Scale shape: identical to [[mixtureSample]] (tiny broadcast rate
    * table, per-row hash) plus a row-local `explode` whose width is the
    * per-source epoch count — no shuffle, no skew (copies distribute
    * wherever their parent rows already are).
    */
  def mixtureResample(df: DataFrame, idCol: String, sourceCol: String,
                      weights: Map[String, Long], budgetDocs: Long,
                      salt: String = "mix"): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "weights must be positive")
    val spark = df.sparkSession
    val counts: Map[String, Long] = df
      .where(col(sourceCol).isin(weights.keys.toSeq: _*))
      .groupBy(col(sourceCol)).agg(count(lit(1)).as("_n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val wSum = BigInt(counts.keysIterator.map(weights).sum)
    val rates = counts.toSeq.map { case (src, n) =>
      (src, (BigInt(10000) * budgetDocs * weights(src) / (wSum * n)).toLong)
    }
    import spark.implicits._
    val rateDf = rates.toDF(sourceCol, "_rate_bp")
    val h = DedupFunctions.hash60(
      concat_ws("|", lit(salt), col(idCol).cast("string"))).%(10000)
    val copies = floor(col("_rate_bp") / 10000).cast("long") +
      when(h < col("_rate_bp") % 10000, 1L).otherwise(0L)
    df.join(broadcast(rateDf), Seq(sourceCol))
      .withColumn("epoch",
        explode(when(copies >= 1, sequence(lit(0L), copies - 1))
          .otherwise(array())))
      .select((df.columns.map(col) :+ col("epoch")).toSeq: _*)
  }

  /** Deterministic training-order shuffle: assign every doc a shard
    * (`hash mod numShards`) and a within-shard order key (the full 60-bit
    * hash) — reading shards in order yields a reproducible pseudo-random
    * global order with NO global sort, the export shape a training run
    * reads. Pure per-row arithmetic; balance is hash-uniform regardless
    * of input skew.
    */
  def assignShards(df: DataFrame, idCol: String, numShards: Int,
                   salt: String = "shard"): DataFrame = {
    require(numShards > 0, "numShards must be positive")
    val h = DedupFunctions.hash60(
      concat_ws("|", lit(salt), col(idCol).cast("string")))
    df.withColumn("shard", (h % numShards).cast("int"))
      .withColumn("shard_order", h)
  }

  /** Write the corpus as `numShards` shuffled shards: ONE shuffle to
    * co-locate each shard, a local (within-partition) sort on the order
    * key, one parquet dir per shard. A downstream trainer streaming
    * shard=0,1,2,… reads the whole corpus in deterministic shuffled
    * order without anyone ever paying a global sort.
    *
    * After the data lands, a MANIFEST (`_manifest.json` beside the shard
    * dirs) records per-shard row counts, id sums, and a modular checksum
    * of the order keys — the integrity record a trainer verifies before
    * a run, computed by re-reading the WRITTEN files so it attests what
    * is actually on storage, not what the plan intended. ≤ numShards
    * rows through the driver.
    */
  def exportShuffled(df: DataFrame, idCol: String, path: String,
                     numShards: Int, salt: String = "shard"): Unit = {
    assignShards(df, idCol, numShards, salt)
      .repartition(numShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("shard_order"), col(idCol))
      .write.partitionBy("shard")
      .mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(path)
    val spark = df.sparkSession
    val rows = spark.read.parquet(path)
      .groupBy(col("shard")).agg(
        count(lit(1)).as("n_docs"),
        sum(col(idCol)).as("id_sum"),
        sum(col("shard_order") % 1000000007L).as("order_sum"))
      .orderBy(col("shard"))
      .collect() // bounded: one row per shard
    val body = rows.map { r =>
      s"""{"shard":${r.get(0)},"n_docs":${r.getLong(1)},""" +
        s""""id_sum":${r.getLong(2)},"order_sum":${r.getLong(3)}}"""
    }.mkString("[\n", ",\n", "\n]")
    val p = new org.apache.hadoop.fs.Path(path, "_manifest.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Deterministic train/validation/test split assignment: each doc's
    * split is a pure function of (salt, id) — the hash lands in one of
    * the cumulative basis-point ranges. Stable under corpus growth (a doc
    * never migrates between splits when new data arrives — the property
    * RNG splits lack), leak-free by construction when the corpus is
    * deduped first, reproducible in any engine. Per-row expression, fuses
    * into the scan.
    */
  def assignSplits(df: DataFrame, idCol: String,
                   splits: Seq[(String, Int)] = Seq(
                     "train" -> 9800, "val" -> 100, "test" -> 100),
                   salt: String = "split"): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0) &&
      splits.map(_._2).sum == 10000,
      "split weights must be positive basis points summing to 10000")
    val h = DedupFunctions.hash60(
      concat_ws("|", lit(salt), col(idCol).cast("string"))).%(10000)
    val uppers = splits.scanLeft(0)(_ + _._2).tail // cumulative upper bounds
    val expr = splits.tail.zip(uppers.tail).foldLeft(
      when(h < uppers.head, lit(splits.head._1))) {
      case (acc, ((name, _), upper)) => acc.when(h < upper, lit(name))
    }
    df.withColumn("split", expr)
  }

  /** Sequence packing plan: assign every document to fixed-size training
    * blocks of `blockTokens` tokens, the way a trainer consumes a corpus —
    * documents are concatenated in deterministic shuffled order and the
    * token stream is cut every `blockTokens` tokens, so a document can
    * span a block boundary. Produces per-doc `shard`, `block_start`,
    * `block_end` (first/last block the doc's tokens land in) and
    * `spans_boundary`.
    *
    * Scale shape: packing is a running sum, which naively is THE global
    * sort+cumsum anti-pattern. Instead the corpus is hash-sharded first
    * ([[assignShards]]) and each shard packs independently: the window is
    * `partitionBy(shard)`, so the sort is per-shard and all shards pack in
    * parallel. That is exactly how training exports work operationally —
    * each shard file is an independent block stream — and `numShards`
    * scales with the corpus, so per-shard state stays bounded at 100 TB.
    *
    * Block arithmetic note: the div is done in doubles (Spark `/` on
    * longs); exact up to 2^53 tokens per shard — far beyond any real
    * shard (a 100 TB corpus is ~2.5e13 tokens TOTAL).
    */
  def packBlocks(df: DataFrame, idCol: String, tokenCountCol: String,
                 blockTokens: Long, numShards: Int,
                 salt: String = "pack"): DataFrame = {
    require(blockTokens > 0, "blockTokens must be positive")
    import org.apache.spark.sql.expressions.Window
    val toks = coalesce(col(tokenCountCol).cast("long"), lit(0L))
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("shard_order"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    assignShards(df, idCol, numShards, salt)
      .withColumn("_cum", sum(toks).over(w))
      .withColumn("block_start",
        floor((col("_cum") - toks) / blockTokens).cast("long"))
      .withColumn("block_end",
        greatest(col("block_start"),
          floor((col("_cum") - 1) / blockTokens).cast("long")))
      .withColumn("spans_boundary", col("block_end") > col("block_start"))
      .drop("_cum")
  }

  /** Deterministic TOKEN-BUDGET sample — "give me ~N tokens of this
    * corpus", the knob a training-data mix actually turns (doc-rate
    * sampling over-represents long documents). Docs are ranked by the
    * seeded 60-bit priority hash and taken greedily in priority order
    * while the running token total stays ≤ `budgetTokens`; the kept set
    * is a pure function of (salt, ids) — stable across runs, engines, and
    * cluster sizes, and mirrorable in oracle SQL.
    *
    * Scale shape: the naive form is ONE GLOBAL cumulative-sum window —
    * a single-reducer sort that dies at 100 TB. Instead the priority
    * space is range-bucketed (top 12 bits → 4096 buckets): one map-side
    * aggregate sums tokens per bucket, the tiny (≤4096-row) histogram
    * finds the boundary bucket on the driver, and every bucket strictly
    * below it is kept with NO sort at all. The split then RECURSES into
    * the boundary bucket on the next 12 priority bits while it still
    * holds more than `windowMaxRows` rows (each level divides it by
    * 4096, for one extra ≤4096-row histogram pass over an exponentially
    * shrinking subset), so the exact cumulative window only ever sorts a
    * bounded residue — never ~1/4096 of a 100 TB corpus through a single
    * reducer. Same greedy result, no global sort.
    *
    * Null token counts read as 0 (a doc with an unknown count is free to
    * keep) — the alternative is an opaque NPE out of the histogram
    * collect at the driver.
    */
  def tokenBudgetSample(df: DataFrame, idCol: String, tokenCountCol: String,
                        budgetTokens: Long, salt: String = "budget",
                        windowMaxRows: Long = 1000000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val prio = DedupFunctions.hash60(
      concat_ws("|", lit(salt), col(idCol).cast("string")))
    val toks = coalesce(col(tokenCountCol).cast("long"), lit(0L))
    var edge = df.withColumn("_prio", prio) // rows whose fate is undecided
    var kept: Option[DataFrame] = None      // whole buckets already kept
    var below = 0L                          // token total of everything kept whole
    var shift = 48                          // 60-bit prio → 12-bit levels 48,36,24,12,0
    var result: DataFrame = null
    while (result == null) {
      val bucketed = edge.withColumn("_bkt",
        shiftright(col("_prio"), shift).bitwiseAND(lit(4095L)).cast("int"))
      // tiny bounded histogram: ≤4096 rows to the driver per level
      val hist = bucketed.groupBy(col("_bkt"))
        .agg(sum(toks).as("_toks"), count(lit(1)).as("_rows"))
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1)
      var acc = 0L
      var boundary = -1    // first bucket whose full inclusion overflows
      var boundaryRows = 0L
      hist.foreach { case (b, t, n) =>
        if (boundary < 0) {
          if (below + acc + t > budgetTokens) { boundary = b; boundaryRows = n }
          else acc += t
        }
      }
      below += acc
      if (boundary < 0) {
        // every remaining bucket fits: the whole edge subset is kept
        result = kept.map(_.unionByName(bucketed)).getOrElse(bucketed)
      } else {
        val whole = bucketed.where(col("_bkt") < boundary)
        kept = Some(kept.map(_.unionByName(whole)).getOrElse(whole))
        val sub = bucketed.where(col("_bkt") === boundary)
        if (boundaryRows > windowMaxRows && shift > 0) {
          shift -= 12
          edge = sub.drop("_bkt")
        } else {
          // exact greedy inside the bounded residue: window keyed by
          // priority (hash ties broken by id)
          val cumW = Window.orderBy(col("_prio"), col(idCol))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
          val fin = sub
            .withColumn("_cum", sum(toks).over(cumW))
            .where(col("_cum") + lit(below) <= budgetTokens)
            .drop("_cum")
          result = kept.map(_.unionByName(fin)).getOrElse(fin)
        }
      }
    }
    result.drop("_prio", "_bkt")
  }
}
