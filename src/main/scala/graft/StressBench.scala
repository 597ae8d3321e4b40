package graft

import graft.functions.{DedupFunctions, TextFunctions}
import graft.schema.EventSchema
import graft.sinks.ColumnarSink
import graft.streaming.{IngestConfig, IngestStream}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** 10×-scale stress run for the dedup family + the collection-cardinality
  * write loop. The 100 TB design claims rest on plan shapes (banded joins,
  * hot-key caps, size gates); this bench validates them EMPIRICALLY one
  * order of magnitude past the driver's sf0.1 surface, with the corpus
  * constructed so every cap/gate actually crosses:
  *
  *  - `factor`× near-dup families (each source doc + factor-1 tail-mutated
  *    copies) — the LSH recall shape;
  *  - a 2,500-doc IDENTICAL family — every MinHash/SimHash band goes
  *    hotter than `maxBandFreq`=1000 (cap crossover), and uncapped it
  *    yields ~3.1M candidate pairs — past `localMaxEdges`=1M, forcing
  *    connected components onto the distributed star path;
  *  - a boilerplate passage shared by ~20% of docs — winnow's `maxDocFreq`
  *    stop-fingerprint cap crossover;
  *  - `factor`× jittered embedding copies — SemDeDup at 10×;
  *  - 1,000 live collections in one micro-batch — the per-collection
  *    write-loop crossover the consolidated cohort path removes;
  *  - 6M points × 10k intervals through the bucketed range join (naive
  *    BNLJ sampled for the ratio) and 10k × 10k interval overlap.
  *
  * Run manually (not part of the driver bench):
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt 'runMain graft.StressBench'
  * Results are recorded in SCALE.md's crossover table.
  */
object StressBench {

  private val HotFamilySize = 2500
  private val BandCap = 1000
  private val DocFreqCap = 1000
  private val LocalMaxEdges = 1000000L

  /** factor× documents: copy 0 verbatim; copies k>0 tail-mutated (same
    * doc, distinct text → near-dup, not exact-dup). ~20% of ALL copies
    * carry a shared boilerplate tail; plus the identical hot family.
    */
  def tenXDocs(spark: SparkSession, sfDir: String, factor: Int): DataFrame = {
    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val boiler = (0 until 30).map(i => s"standard footer clause $i").mkString(" ")
    val copies = (0 until factor).map { k =>
      val t = if (k == 0) col("text")
              else concat(col("text"), lit(s" edition$k revised"))
      val withBoiler = when(col("doc_id") % 5 === 0, concat(t, lit(" " + boiler)))
        .otherwise(t)
      base.select((col("doc_id") + lit(k * 10000000L)).as("doc_id"),
        withBoiler.as("text"))
    }.reduce(_.unionByName(_))
    // short on purpose: the family's gate-crossing property is its SIZE
    // (band frequency, pair count), not its text length — short text keeps
    // the per-pair jaccard in the admit-the-family run from dominating
    // the measurement (2500² half-pairs × |shingles|-sized intersects)
    val hotText = (0 until 12).map(i => s"hot clause token$i").mkString(" ")
    val hot = spark.range(HotFamilySize)
      .select((col("id") + lit(900000000L)).as("doc_id"), lit(hotText).as("text"))
    copies.unionByName(hot)
  }

  /** factor× embeddings with per-copy jitter (cosine vs original ≈ 1). */
  def tenXEmbeddings(spark: SparkSession, sfDir: String, factor: Int): DataFrame = {
    val base = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    (0 until factor).map { k =>
      if (k == 0) base
      else base.select((col("vec_id") + lit(k * 10000000L)).as("vec_id"),
        transform(col("embedding"), x => (x + lit(1e-4f * k)).cast("float"))
          .as("embedding"))
    }.reduce(_.unionByName(_))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factor = sys.env.getOrElse("SPARK_GRAFT_STRESS_FACTOR", "10").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .withExtensions(new GraftExtensions) // hint-based range-join activation
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // re-measure selectively: SPARK_GRAFT_STRESS_SECTIONS=spans,collections
    val sections = sys.env.getOrElse("SPARK_GRAFT_STRESS_SECTIONS", "all")
    def want(s: String): Boolean =
      sections == "all" || sections.split(",").contains(s)

    val tmp = java.nio.file.Files.createTempDirectory("graft_stress")
    val out = scala.collection.mutable.LinkedHashMap.empty[String, String]
    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      val sec = (System.nanoTime() - t0) / 1e9
      out(name) = f"$sec%.2f"
      System.err.println(f"[stress] $name: $sec%.2f s")
      r
    }

    // ---- stage the 10× corpus to parquet (downstream reads real files)
    val needCorpus = Seq("minhash", "winnow", "simhash", "spans", "bloom").exists(want)
    val corpusPath = s"$tmp/docs10x"
    val nDocs: Long = if (!needCorpus) 0L else timed("gen_corpus_sec") {
      tenXDocs(spark, sfDir, factor)
        .repartition(spark.sparkContext.defaultParallelism)
        .write.parquet(corpusPath)
      spark.read.parquet(corpusPath).count()
    }
    if (needCorpus) out("n_docs") = nDocs.toString
    def corpus = spark.read.parquet(corpusPath)

    if (want("minhash")) {
      // ---- MinHash band cap crossover: capped vs hot-admitted pairs
      val capped = timed("minhash_capped_sec") {
        DedupFunctions.minhashCandidates(corpus, "doc_id", "text",
          stagingPath = Some(s"$tmp/sigs_capped"), maxBandFreq = BandCap).count()
      }
      out("minhash_capped_pairs") = capped.toString
      // raising the cap ABOVE the hot-family size admits its ~3.1M pairs
      // (the CC forcing input) while still suppressing the boilerplate band
      // (~10k docs share it → its uncapped join would be O(10k² × bands)
      // jaccard evaluations — measured runaway; the cap is not optional at
      // scale, and that asymmetry is itself the crossover evidence)
      val hotAdmitCap = HotFamilySize + 500
      val pairsPath = s"$tmp/pairs_hot"
      val hotAdmitted = timed("minhash_cap3000_sec") {
        DedupFunctions.minhashCandidates(corpus, "doc_id", "text",
            stagingPath = Some(s"$tmp/sigs_hot"), maxBandFreq = hotAdmitCap)
          .write.parquet(pairsPath)
        spark.read.parquet(pairsPath).count()
      }
      out("minhash_cap3000_pairs") = hotAdmitted.toString
      out("band_cap_fired") =
        (hotAdmitted - capped >= HotFamilySize.toLong * (HotFamilySize - 1) / 2).toString

      // ---- CC on the hot-admitted pairs: edges > localMaxEdges forces the
      // distributed alternating-star path (the local union-find gate closes)
      val edges = spark.read.parquet(pairsPath)
      out("cc_edges") = hotAdmitted.toString
      out("cc_distributed_forced") = (hotAdmitted > LocalMaxEdges).toString
      val clusters = timed("cc_auto_sec") {
        DedupFunctions.connectedComponentsAuto(edges, "id_a", "id_b")
          .select(col("label")).distinct().count()
      }
      out("cc_clusters") = clusters.toString
    }

    if (want("winnow")) {
      // ---- winnow stop-fingerprint cap: the boilerplate passage's doc-freq
      // crosses maxDocFreq, so capped candidates stay bounded (uncapped would
      // be ~(n_docs/5)^2 boilerplate pairs — the exact blowup the cap stops)
      val maxFpFreq = corpus.select(col("doc_id"),
          explode(TextFunctions.winnowedFingerprints(col("text"), 3, 8)).as("_fp"))
        .groupBy(col("_fp")).agg(countDistinct(col("doc_id")).as("n"))
        .agg(max(col("n"))).head().getLong(0)
      out("winnow_max_fp_docfreq") = maxFpFreq.toString
      out("winnow_cap_fired") = (maxFpFreq > DocFreqCap).toString
      val winnow = timed("winnow_capped_sec") {
        DedupFunctions.winnowNearDups(corpus, "doc_id", "text",
          stagingPath = Some(s"$tmp/winnow_fps"), maxDocFreq = DocFreqCap).count()
      }
      out("winnow_capped_pairs") = winnow.toString
    }

    if (want("simhash")) {
      // ---- SimHash with the band cap (identical hot family goes over it)
      val simhash = timed("simhash_capped_sec") {
        DedupFunctions.simhashNearDups(corpus, "doc_id", "text",
          stagingPath = Some(s"$tmp/simhash_sigs"), maxBandFreq = BandCap).count()
      }
      out("simhash_capped_pairs") = simhash.toString
    }

    if (want("spans")) {
      // ---- repeated-span removal at 10× (aggregate over the CLEANED text —
      // a bare count() would let column pruning skip the actual span work)
      val spanChars = timed("span_removal_sec") {
        DedupFunctions.removeRepeatedSpans(corpus, "doc_id", "text")
          .agg(sum(length(col("cleaned")))).head().getLong(0)
      }
      out("span_removal_out_chars") = spanChars.toString
    }

    if (want("semantic")) {
      // ---- SemDeDup at 10× embeddings
      val emb = tenXEmbeddings(spark, sfDir, factor)
        .repartition(spark.sparkContext.defaultParallelism)
        .localCheckpoint(true)
      val nEmb = emb.count()
      out("n_embeddings") = nEmb.toString
      val semKept = timed("semantic_dedup_sec") {
        DedupFunctions.semanticDedup(emb, "vec_id", "embedding",
          threshold = 0.999).count()
      }
      out("semantic_kept") = semKept.toString
    }

    if (want("annpq")) {
      // ---- IVF-PQ at factor× embeddings: both quantizers train on
      // bounded samples, the full corpus is assigned + PQ-encoded in one
      // pass each, and 20 queries serve through cell probing + ADC with a
      // tie-aware recall grade vs in-section brute force (the jittered
      // copies make every top-k boundary a tie flood on purpose)
      import graft.functions.SimilarityFunctions
      val emb = tenXEmbeddings(spark, sfDir, factor)
        .repartition(spark.sparkContext.defaultParallelism)
        .localCheckpoint(true)
      out("annpq_vectors") = emb.count().toString
      val probes = emb.filter(col("vec_id") < 20).localCheckpoint(true)
      val k = 10
      val approx = timed("annpq_topk_sec") {
        SimilarityFunctions.ivfPqTopK(emb, probes, "vec_id", "embedding", k,
          cells = 64, nProbe = 8).localCheckpoint(true)
      }
      val exact = timed("annpq_brute_sec") {
        SimilarityFunctions.bruteForceTopK(emb, probes, "vec_id", "embedding", k)
          .localCheckpoint(true)
      }
      val nExact = exact.count()
      val thresh = exact.groupBy(col("query_id"))
        .agg(min(col("cosine_bp")).as("_min_bp"))
      val hits = approx.join(thresh, Seq("query_id"))
        .where(col("cosine_bp") >= col("_min_bp")).count()
      out("annpq_recall_bp") = (hits * 10000 / math.max(1L, nExact)).toString
      require(hits * 10000 >= nExact * 3000,
        s"IVF-PQ recall collapsed at factor=$factor: $hits/$nExact")
    }

    if (want("ivffit")) {
      // ---- the r11 driver-local IVF fit at its design ceiling: a FULL
      // 100k-point sample (the maxTrainRows bound — what a 100 TB corpus
      // actually trains on) at production-shaped cell counts. The fit is
      // kmeans++ init + 15 chunked-parallel Lloyd's iterations on the
      // driver — this section pins its wall time so the "driver-sized by
      // construction" claim stays measured, not argued, and scales the
      // cell count an order of magnitude past the bench queries' 8-16.
      import graft.functions.SimilarityFunctions
      val dim = 64
      val trainN = 100000L
      val vecs = spark.range(trainN).select(col("id").as("vec_id"),
        transform(sequence(lit(0), lit(dim - 1)),
          i => (pmod(hash(col("id") * lit(dim) + i), lit(2000)) - 1000)
            .cast("double") / 1000.0).as("embedding"))
        .localCheckpoint(true)
      for (cells <- Seq(256, 1024)) {
        val idx = timed(s"ivffit_${cells}c_sec") {
          SimilarityFunctions.ivfTrain(vecs, "embedding", cells = cells,
            maxTrainRows = trainN)
        }
        // assignment throughput through the native kernel at the same
        // cell count — the per-corpus-row cost of building the inverted
        // file (rows/s recorded; the kernel is O(cells·dim) per row)
        val assigned = timed(s"ivfassign_${cells}c_sec") {
          idx.assign(vecs, "vec_id", "embedding").count()
        }
        require(assigned == trainN, s"assign lost rows: $assigned")
      }
      out("ivffit_rows") = trainN.toString
    }

    if (want("ivfcrawl")) {
      // ---- the incremental-ANN lifecycle an octave up: 10 nightly crawls
      // × 100k vectors append to ONE batch-keyed inverted file against a
      // quantizer trained once on crawl 0; later crawls drift (a growing
      // per-coordinate shift) so the retrain trigger has something to
      // flag. Pins: per-crawl append cost FLAT (each crawl pays only its
      // own map pass + write — crawl 9 must not cost more than crawl 0),
      // search over the 1M-row grown index, and the drift signal rising
      // monotonically while searches stay correct.
      import graft.functions.SimilarityFunctions
      val dim = 64
      val perCrawl = 100000L
      val crawls = 10
      def crawl(b: Int) = spark.range(b * perCrawl, (b + 1) * perCrawl)
        .select(col("id").as("vec_id"),
          transform(sequence(lit(0), lit(dim - 1)),
            i => (pmod(hash(col("id") * lit(dim) + i), lit(2000)) - 1000)
              .cast("double") / 1000.0 + lit(b * 0.05)).as("embedding"))
      val idx = timed("ivfcrawl_train_sec") {
        SimilarityFunctions.ivfTrain(crawl(0), "embedding", cells = 256,
          maxTrainRows = perCrawl)
      }
      val inv = s"$tmp/ivfcrawl_inv"
      var firstSec = 0.0; var lastSec = 0.0
      val totalT0 = System.nanoTime()
      (0 until crawls).foreach { b =>
        val t0 = System.nanoTime()
        SimilarityFunctions.ivfAppendBatch(idx, inv, crawl(b),
          "vec_id", "embedding", b.toLong)
        val sec = (System.nanoTime() - t0) / 1e9
        if (b == 0) firstSec = sec
        if (b == crawls - 1) lastSec = sec
      }
      out("ivfcrawl_appends_total_sec") =
        f"${(System.nanoTime() - totalT0) / 1e9}%.2f"
      out("ivfcrawl_append_first_sec") = f"$firstSec%.2f"
      out("ivfcrawl_append_last_sec") = f"$lastSec%.2f"
      val invDf = spark.read.parquet(inv)
      out("ivfcrawl_rows") = invDf.count().toString
      val queries = crawl(0).where(col("vec_id") < 20).localCheckpoint(true)
      val found = timed("ivfcrawl_search_sec") {
        SimilarityFunctions.ivfSearch(invDf, queries, idx,
          "vec_id", "embedding", 10, nProbe = 8).count()
      }
      require(found == 200, s"grown-index search returned $found of 200")
      // the retrain trigger: quantization error of each crawl against the
      // crawl-0 quantizer — must RISE with the planted drift
      val drift0 = SimilarityFunctions.quantizationErrorBp(idx, crawl(0), "embedding")
      val drift9 = SimilarityFunctions.quantizationErrorBp(idx, crawl(crawls - 1), "embedding")
      out("ivfcrawl_drift_bp_crawl0") = drift0.toString
      out("ivfcrawl_drift_bp_crawl9") = drift9.toString
      require(drift9 > drift0,
        s"drift signal failed to rise: $drift0 -> $drift9")
    }

    if (want("crawlrefresh")) {
      // ---- the COMPOSED nightly refresh an octave (or two) up — the r12
      // verdict's task 4: the stages are individually crossed at 100×,
      // but crawl_refresh_e2e as a composition had only run at oracle
      // scale (500 docs / 500 vecs). Five consecutive crawls over a
      // `2000×factor`-doc corpus, each running the WHOLE pipeline —
      // snapshot diff → incremental dedup → index append → tombstone
      // compact — with a drift-triggered retrain firing inside the loop
      // on the final (drifted) crawl. Claims to kill: a cross-stage
      // blowup as crawls accumulate (the compact anti-join or the diff
      // must not grow superlinearly per crawl: crawl 4 ≲ crawl 1), and
      // recall surviving the whole append/compact/retrain history.
      import graft.functions.SimilarityFunctions
      val n = 2000L * factor // factor 10 → 20k docs+vecs, 100 → 200k
      def text(idCol: org.apache.spark.sql.Column) = concat(lit("document body "),
        idCol.cast("string"), lit(" token "), pmod(idCol, lit(977)).cast("string"),
        lit(" filler"), pmod(idCol * 31, lit(1009)).cast("string"))
      // the AnnIncrementalSpec-validated pair: a trig mix that clusters
      // under spherical k-means (base), and jittered axis spikes the base
      // quantizer never saw (drift that reliably crosses a 3×-base
      // threshold — a uniform-hash corpus would NOT: its base error is
      // already near the unit-sphere ceiling)
      def embOf(df: DataFrame, drifted: Boolean): DataFrame =
        if (!drifted) df.select(col("doc_id").as("vec_id"),
          transform(sequence(lit(0), lit(7)),
            d => sin(col("doc_id") * (d + lit(1)) * 0.37) +
              cos(col("doc_id") * 0.11) * (d + lit(1))).as("embedding"))
        else df.select(col("doc_id").as("vec_id"),
          transform(sequence(lit(0), lit(7)),
            d => when(d === pmod(col("doc_id"), lit(8)).cast("int"), lit(10.0))
              .otherwise(sin(col("doc_id") * (d + lit(3)) * 1.7) * 6.0))
            .as("embedding"))
      def snap(ids: DataFrame) = ids.select(col("doc_id"), text(col("doc_id")).as("text"))
      var oldSnap = snap(spark.range(n).select(col("id").as("doc_id")))
        .localCheckpoint(true)
      val inv = s"$tmp/crawlrefresh_inv"
      var idx = timed("crawlrefresh_train_sec") {
        SimilarityFunctions.ivfTrain(embOf(oldSnap, drifted = false),
          "embedding", cells = 16, maxTrainRows = 50000L)
      }
      SimilarityFunctions.ivfAppendBatch(idx, inv, embOf(oldSnap, drifted = false),
        "vec_id", "embedding", 0L)
      val baseErr = SimilarityFunctions.quantizationErrorBp(idx,
        embOf(oldSnap, drifted = false), "embedding")
      var firstCrawlSec = 0.0; var steadyCrawlSec = 0.0
      var retrained = false
      (1 to 5).foreach { c =>
        val driftedCrawl = c == 5
        val t0 = System.nanoTime()
        // the crawl: 5% of ids vanish, 10% fresh ids arrive (20% of the
        // fresh are exact dups of surviving docs — dedup must drop them)
        val removedIds = oldSnap.where(pmod(col("doc_id") + c, lit(20)) === 0)
          .select(col("doc_id"))
        val freshIds = spark.range(n / 10)
          .select((col("id") + lit(c * 10000000L)).as("doc_id"))
        val fresh = snap(freshIds).withColumn("text",
          when(pmod(col("doc_id"), lit(5)) === 0,
            text(pmod(col("doc_id"), lit(n)))).otherwise(col("text")))
        val kept = oldSnap.join(removedIds, Seq("doc_id"), "left_anti")
        val newSnap = kept.unionByName(fresh).localCheckpoint(true)
        val delta = graft.operators.CorpusDiff.diff(oldSnap, newSnap,
          "doc_id", "text").localCheckpoint(true)
        val addedIds = delta.where(col("status") === "added").select(col("doc_id"))
        val survivors = DedupFunctions.incrementalDedup(
          newSnap.join(addedIds, Seq("doc_id")), oldSnap, "doc_id", "text")
          .localCheckpoint(true)
        val incEmb = embOf(survivors, driftedCrawl)
        SimilarityFunctions.ivfAppendBatch(idx, inv, incEmb,
          "vec_id", "embedding", c.toLong)
        idx = SimilarityFunctions.ivfCompact(spark, inv, idx,
          delta.where(col("status") === "removed").select(col("doc_id")), "doc_id")
        // monitor → act: the drifted final crawl must trip the retrain
        SimilarityFunctions.ivfRetrainIfDrifted(spark, inv, idx, incEmb,
          "embedding", driftThresholdBp = baseErr * 3, cells = 16,
          maxTrainRows = 50000L) match {
          case Some(next) => idx = next; retrained = true
            require(driftedCrawl, s"retrain fired on undrifted crawl $c")
          case None =>
            require(!driftedCrawl, "drifted crawl failed to trip the retrain")
        }
        oldSnap = newSnap
        val sec = (System.nanoTime() - t0) / 1e9
        out(s"crawlrefresh_crawl${c}_sec") = f"$sec%.2f"
        if (c == 1) firstCrawlSec = sec
        if (c == 4) steadyCrawlSec = sec
      }
      require(retrained, "the drift-triggered retrain never fired")
      out("crawlrefresh_rows") = spark.read.parquet(inv).count().toString
      // per-crawl cost must not grow with crawl history (compact
      // anti-join, diff, and dedup all see ~the same corpus size each
      // round) — crawl 4 within 2.5× of crawl 1 kills the blowup claim
      require(steadyCrawlSec < firstCrawlSec * 2.5 + 5.0,
        s"per-crawl cost grew with history: $firstCrawlSec -> $steadyCrawlSec")
      // recall re-certification over the FINAL corpus through the
      // swapped (retrained) index — served from the persisted artifacts
      val servedIdx = SimilarityFunctions.ivfLoad(
        SimilarityFunctions.ivfQuantizerPath(inv))
      val finalEmb = spark.read.parquet(inv)
        .select(col("neighbor_id").as("vec_id"),
          col("_cv").as("embedding")).localCheckpoint(true)
      val probes = finalEmb.where(pmod(col("vec_id"), lit(n / 10)) === 7)
        .limit(20).localCheckpoint(true)
      val truth = SimilarityFunctions.bruteForceTopK(finalEmb, probes,
        "vec_id", "embedding", 5)
      val approx = timed("crawlrefresh_search_sec") {
        SimilarityFunctions.ivfSearch(spark.read.parquet(inv), probes,
          servedIdx, "vec_id", "embedding", 5, nProbe = 8).localCheckpoint(true)
      }
      val tSel = truth.select(col("query_id").as("_q"), col("neighbor_id").as("_t"))
      val hits = approx.join(tSel, approx("query_id") === col("_q") &&
        approx("neighbor_id") === col("_t")).count()
      val recallBp = hits * 10000 / math.max(truth.count(), 1L)
      out("crawlrefresh_recall_bp") = recallBp.toString
      require(recallBp >= 5000, s"post-refresh recall collapsed: $recallBp bp")
    }

    if (want("swaprace")) {
      // ---- REAL concurrent appender vs retrain loop (r13 verdict task
      // 6): the spec suite injects its swap races through test seams;
      // this section runs an actual streaming-shaped ivfAppendBatch
      // consumer and an ivfRetrain loop on SEPARATE THREADS against one
      // shared index for the whole appender run. The protocol's promise
      // under fire: every batch either lands or the appender is told
      // loudly to replay (batch-keyed overwrite = idempotent), retrains
      // never lose rows, and nothing leaks. The end state must be EXACT:
      // per-batch counts, total rows, swap-identity with a fresh rebuild
      // under the final quantizer, zero residue dirs.
      import graft.functions.SimilarityFunctions
      val dim = 16
      val perBatch = 2000L
      val nBatches = sys.env.getOrElse("SPARK_GRAFT_SWAPRACE_BATCHES", "24").toInt
      def batchDf(b: Int) = spark.range(b * perBatch, (b + 1) * perBatch)
        .select(col("id").as("vec_id"),
          transform(sequence(lit(0), lit(dim - 1)),
            i => sin(col("id") * (i + lit(1)) * 0.37 + lit(b * 0.21)) +
              cos(col("id") * 0.11) * (i + lit(1))).as("embedding"))
      val inv = s"$tmp/swaprace_inv"
      val idx0 = SimilarityFunctions.ivfTrain(batchDf(0), "embedding",
        cells = 32, maxTrainRows = perBatch)
      SimilarityFunctions.ivfAppendBatch(idx0, inv, batchDf(0),
        "vec_id", "embedding", 0L)
      val replays = new java.util.concurrent.atomic.AtomicInteger
      val retrains = new java.util.concurrent.atomic.AtomicInteger
      val retrainErrs = new java.util.concurrent.atomic.AtomicInteger
      @volatile var appenderDone = false
      @volatile var appenderErr: Option[Throwable] = None
      val appender = new Thread(() => {
        try {
          var current = idx0
          (1 until nBatches).foreach { b =>
            var landed = false
            var attempts = 0
            while (!landed) {
              attempts += 1
              require(attempts <= 500, s"batch $b livelocked after 500 attempts")
              try {
                SimilarityFunctions.ivfAppendBatch(current, inv, batchDf(b),
                  "vec_id", "embedding", b.toLong)
                landed = true
              } catch {
                // refused (swap in flight / stale quantizer), told to
                // replay (epoch bump), or the write itself died mid-swap
                // (committer path renamed out from under it) — all
                // converge the same way: reload the published artifacts
                // and replay the SAME batch id
                case scala.util.control.NonFatal(_) =>
                  replays.incrementAndGet()
                  Thread.sleep(50)
                  val qp = new org.apache.hadoop.fs.Path(
                    SimilarityFunctions.ivfQuantizerPath(inv))
                  val fsI = qp.getFileSystem(
                    spark.sparkContext.hadoopConfiguration)
                  if (fsI.exists(qp))
                    current = SimilarityFunctions.ivfLoad(
                      SimilarityFunctions.ivfQuantizerPath(inv))
              }
            }
          }
        } catch { case t: Throwable => appenderErr = Some(t) }
        finally appenderDone = true
      }, "swaprace-appender")
      val retrainer = new Thread(() => {
        while (!appenderDone) {
          try {
            SimilarityFunctions.ivfRetrain(spark, inv, cells = 32,
              maxTrainRows = perBatch * 2)
            retrains.incrementAndGet()
          } catch {
            case scala.util.control.NonFatal(t) =>
              retrainErrs.incrementAndGet()
              System.err.println(s"[stress] swaprace retrain error: ${t.getMessage}")
          }
          Thread.sleep(200)
        }
      }, "swaprace-retrainer")
      timed("swaprace_total_sec") {
        appender.start(); retrainer.start()
        appender.join(); retrainer.join()
      }
      appenderErr.foreach(t =>
        throw new IllegalStateException("swaprace appender died", t))
      out("swaprace_batches") = nBatches.toString
      out("swaprace_replays") = replays.get().toString
      out("swaprace_retrains") = retrains.get().toString
      out("swaprace_retrain_errors") = retrainErrs.get().toString
      require(retrains.get() >= 1, "no retrain overlapped the appends — the race never ran")
      require(retrainErrs.get() == 0,
        s"${retrainErrs.get()} retrains failed (rollbacks keep data but the loop must converge)")
      // EXACT end state: every batch present with exactly its own rows
      val fin = spark.read.parquet(inv).localCheckpoint(true)
      out("swaprace_rows") = fin.count().toString
      require(fin.count() == perBatch * nBatches,
        s"expected ${perBatch * nBatches} rows, found ${fin.count()}")
      val byBatch = fin.groupBy(col("batch")).count().collect()
      require(byBatch.length == nBatches &&
        byBatch.forall(_.getLong(1) == perBatch),
        s"per-batch counts off: ${byBatch.mkString(",")}")
      // swap identity: the raced index is row-identical to a fresh
      // rebuild of the union corpus under the FINAL published quantizer
      val finalIdx = SimilarityFunctions.ivfLoad(
        SimilarityFunctions.ivfQuantizerPath(inv))
      val unionCorpus = (0 until nBatches).map(batchDf)
        .reduce(_.unionByName(_))
      val idCols = Seq(col("neighbor_id"), col("_cell"), col("_cv"))
      val a = fin.select(idCols: _*)
      val b = finalIdx.assign(unionCorpus, "vec_id", "embedding").select(idCols: _*)
      require(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
        "raced index diverged from a fresh rebuild under the final quantizer")
      // zero residue: no lock, no .retired-/.retrain-/.strays- siblings
      val fsR = new org.apache.hadoop.fs.Path(inv)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val residue = fsR.listStatus(new org.apache.hadoop.fs.Path(tmp.toString))
        .map(_.getPath.getName)
        .filter(n => n.startsWith("swaprace_inv") && n != "swaprace_inv")
      require(residue.isEmpty, s"swap residue leaked: ${residue.mkString(",")}")
      // and the raced index SERVES: probes find their own vectors
      val probes = batchDf(1).where(col("vec_id") < perBatch + 20)
      val served = SimilarityFunctions.ivfSearch(fin, probes, finalIdx,
        "vec_id", "embedding", 5, nProbe = 4).count()
      require(served > 0, "post-race search returned nothing")
    }

    if (want("bloom")) {
      // ---- Bloom incremental: 10× batch vs original corpus (exact matches
      // = the verbatim copy-0 docs; boilerplate originals differ)
      val orig = spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id"), col("text"))
      val bloomNew = timed("bloom_incremental_sec") {
        DedupFunctions.incrementalDedupBloom(corpus, orig, "doc_id", "text",
          expectedDistinct = nDocs).count()
      }
      out("bloom_new_rows") = bloomNew.toString
    }

    if (want("rangejoin")) {
      // ---- bucketed range/overlap joins an order of magnitude up: the
      // naive BNLJ is quadratic, so it gets a bounded SAMPLE for the ratio
      // and the bucketed plan gets the full 10× input
      import graft.operators.RangeJoin
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
        .select(col("l_extendedprice").as("p"))
      val points = Seq.fill(factor)(li).reduce(_.unionByName(_))
        .localCheckpoint(true)
      out("rangejoin_points") = points.count().toString
      val iv = spark.range(10000).select(col("id").as("band"),
          (rand(7) * 100000.0).as("lo"))
        .withColumn("hi", col("lo") + 2000.0)
        .localCheckpoint(true)
      val sample = li.limit(20000).localCheckpoint(true)
      val naivePairs = timed("rangejoin_naive20k_sec") {
        sample.join(iv, col("p") >= col("lo") && col("p") < col("hi")).count()
      }
      val bucketedSample = timed("rangejoin_bucketed20k_sec") {
        RangeJoin.rangeJoin(sample, "p", iv, "lo", "hi", 2000.0).count()
      }
      require(bucketedSample == naivePairs,
        s"bucketed $bucketedSample != naive $naivePairs on the sample")
      val full = timed("rangejoin_bucketed10x_sec") {
        RangeJoin.rangeJoin(points, "p", iv, "lo", "hi", 2000.0).count()
      }
      out("rangejoin_10x_pairs") = full.toString

      // interval × interval at 10k × 10k (naive would be 100M interval
      // comparisons; bucketed shuffles ~2 exploded rows per interval)
      val iv2 = spark.range(10000).select(col("id").as("band2"),
          (rand(11) * 100000.0).as("lo2"))
        .withColumn("hi2", col("lo2") + 1500.0)
      val overlapPairs = timed("overlap_10k_sec") {
        RangeJoin.overlapJoin(iv, "lo", "hi", iv2, "lo2", "hi2", 2000.0).count()
      }
      out("overlap_10k_pairs") = overlapPairs.toString
    }

    if (want("collections")) {
      // ---- 1k-collection micro-batch: per-collection loop vs consolidated
      val rawJson = {
        import spark.implicits._
        val now = System.currentTimeMillis()
        spark.range(100000).select(
          concat(lit("""{"data":{"_project":"demo","_collection":"c"""),
            (col("id") % 1000), lit("\","),
            lit(""""_time":"""), lit(now), lit(","),
            lit(""""_user":"u"""), (col("id") % 97), lit("\","),
            lit(""""n":"""), col("id"), lit("}}")).as("value")).as[String]
          .localCheckpoint(true)
      }
      timed("collections1k_percoll_sec") {
        val c = IngestStream.processBatch(spark, rawJson,
          new EventSchema.Registry(), new ColumnarSink(s"$tmp/sink_per"),
          None, IngestConfig(consolidateThreshold = 0), batchId = 1)
        require(c.size == 1000 && c.values.sum == 100000L, s"percoll counts: ${c.size}")
      }
      timed("collections1k_consolidated_sec") {
        val c = IngestStream.processBatch(spark, rawJson,
          new EventSchema.Registry(), new ColumnarSink(s"$tmp/sink_co"),
          None, IngestConfig(consolidateThreshold = 64), batchId = 1)
        require(c.size == 1000 && c.values.sum == 100000L, s"consolidated counts: ${c.size}")
      }
    }

    if (want("collprofile")) {
      // phase-by-phase timing of the consolidated 1k-collection batch
      import spark.implicits._
      import graft.ingest.{JsonDialect, JsonIngest}
      import graft.operators.EventOps
      val now = System.currentTimeMillis()
      val rawJson = spark.range(100000).select(
        concat(lit("""{"data":{"_project":"demo","_collection":"c"""),
          (col("id") % 1000), lit("\","),
          lit(""""_time":"""), lit(now), lit(","),
          lit(""""_user":"u"""), (col("id") % 97), lit("\","),
          lit(""""n":"""), col("id"), lit("}}")).as("value")).as[String]
        .localCheckpoint(true)
      val names = graft.schema.FieldNames()
      val dec = timed("p_decouple_sec") {
        val d = EventOps.decouple(rawJson, JsonDialect.Fabric, names)
          .filter(col("_project").isNotNull)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        d.count(); d
      }
      val split = timed("p_daysplit_sec") {
        val s = EventOps.daySplit(dec, col("_time"))
        s.realTime.count(); s
      }
      val routed = timed("p_routecache_sec") {
        val r = split.realTime.select("value", "_project", "_collection")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        r.count(); r
      }
      timed("p_sizes_sec") {
        routed.groupBy(col("_project"), col("_collection")).count().collect()
      }
      val reg = new EventSchema.Registry()
      val schemas = timed("p_infer_sec") {
        val obs = JsonIngest.inferSchemas(
          routed.select(col("value")).as(org.apache.spark.sql.Encoders.STRING),
          JsonDialect.Fabric, names)
        obs.map { case (id, o) => reg.getOrCreate(id); id -> reg.addColumns(id, o) }
      }
      val members = schemas.keys.map(id => (id.project, id.collection)).toSet
      val cohortDf = timed("p_parse_count_sec") {
        val cdf = EventOps.withShardTime(JsonIngest.parseCohort(
            routed, members, schemas.values.head, JsonDialect.Fabric, names), names)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        cdf.groupBy(col("_project"), col("_collection")).count().collect()
        cdf
      }
      timed("p_write_sec") {
        new ColumnarSink(s"$tmp/sink_prof").insertConsolidated(cohortDf, 1L)
      }
    }

    if (want("layout")) {
      // ---- Z-order + stats manifest at 10×: rewrite cost is ONE range
      // shuffle; the payoff is measured directly as scan-vs-scan latency
      // and files kept for a 2-D box on the non-sorted dimension.
      import graft.layout.{StatsIndex, ZOrder}
      val n = 200000L * factor
      val files = 512
      val data = spark.range(n).select(
        col("id").as("y"),
        pmod(hash(col("id")), lit(500000)).cast("long").as("x"),
        (col("id") * 7 % 997).as("payload"))
      val natDir = s"$tmp/layout_nat"
      val zDir = s"$tmp/layout_z"
      timed("layout_natural_write_sec") {
        data.repartitionByRange(files, col("y")).sortWithinPartitions("y")
          .write.mode("overwrite").parquet(natDir)
      }
      timed("layout_zorder_write_sec") {
        ZOrder.zorder(data, Seq("x", "y"), bits = 14, numPartitions = files)
          .write.mode("overwrite").parquet(zDir)
      }
      val nIdx = timed("layout_index_build_sec") {
        StatsIndex.build(spark, zDir, Seq("x", "y"))
      }
      out("layout_index_files") = nIdx.toString
      val pred = col("x").between(10000L, 19999L) &&
        col("y").between(n / 4, n / 4 + n / 20)
      val full = timed("layout_fullscan_filter_sec") {
        spark.read.parquet(natDir).filter(pred).count()
      }
      val zScan = timed("layout_zscan_filter_sec") {
        spark.read.parquet(zDir).filter(pred).count()
      }
      val prunedDf = StatsIndex.prunedRead(spark, zDir,
        Seq(("x", 10000L, 19999L), ("y", n / 4, n / 4 + n / 20)))
      val pruned = timed("layout_manifest_pruned_sec") {
        prunedDf.filter(pred).count()
      }
      out("layout_files_kept") = prunedDf
        .select(input_file_name()).distinct().count().toString
      require(full == zScan && zScan == pruned,
        s"layout results diverged: $full/$zScan/$pruned")
      out("layout_rows_matched") = full.toString
    }

    if (want("asofskew")) {
      // ---- as-of join under a planted hot key at 10×: one user owns 20%
      // of all events (the window-partition hazard AQE cannot split).
      // Measures the single-window plan, the segmented-scan plan, the
      // auto-probed plan, and the probe itself.
      import graft.operators.AsOfJoin
      val n = 200000L * factor
      val hot = n / 5
      val events = spark.range(n).select(
          when(col("id") < hot, lit(1L))
            .otherwise(pmod(col("id"), lit(50000L)) + 2L).as("user_id"),
          pmod(col("id") * 6101L, lit(99991L)).as("t"),
          (col("id") % 3 === 0).as("is_purchase"),
          col("id").as("event_id"))
        .repartition(spark.sparkContext.defaultParallelism)
      val evPath = s"$tmp/asof_events"
      timed("asofskew_gen_sec") {
        events.write.mode("overwrite").parquet(evPath)
      }
      def purchases = spark.read.parquet(evPath).where(col("is_purchase"))
        .select(col("user_id"), col("t"), col("event_id"))
      def clicks = spark.read.parquet(evPath).where(!col("is_purchase"))
        .select(col("user_id"), col("t").as("click_t"),
          col("event_id").as("click_id"))
      val single = timed("asofskew_single_window_sec") {
        AsOfJoin.asOfJoin(purchases, clicks, Seq("user_id"), "t", "click_t",
          skewBuckets = 1).count()
      }
      val segmented = timed("asofskew_segmented16_sec") {
        AsOfJoin.asOfJoin(purchases, clicks, Seq("user_id"), "t", "click_t",
          skewBuckets = 16).count()
      }
      require(single == segmented,
        s"as-of plans diverged: $single vs $segmented")
      val share = timed("asofskew_probe_sec") {
        AsOfJoin.probeTopKeyShare(purchases, clicks, Seq("user_id"), n)
      }
      out("asofskew_probe_share") = f"$share%.3f"
      out("asofskew_auto_buckets") = AsOfJoin.chooseSkewBuckets(share,
        spark.sparkContext.defaultParallelism).toString
      // defaults: the hot-row floor should route THIS corpus (400k hot
      // rows at factor 10 — a comfortable single-task sort) to the plain
      // window; segmented-vs-single above shows what the floor avoids
      val auto = timed("asofskew_auto_default_sec") {
        AsOfJoin.asOfJoinAuto(purchases, clicks, Seq("user_id"), "t",
          "click_t", minProbeRows = 1).count()
      }
      require(auto == single, s"auto plan diverged: $auto vs $single")
      val autoForced = timed("asofskew_auto_forced_sec") {
        AsOfJoin.asOfJoinAuto(purchases, clicks, Seq("user_id"), "t",
          "click_t", minProbeRows = 1, minHotRows = 1).count()
      }
      require(autoForced == single)
      out("asofskew_rows") = single.toString
    }

    if (want("statsincr")) {
      // ---- write-time stats manifest at file-count scale: many batch
      // inserts maintain the manifest incrementally (self-compaction
      // engaged); measure the per-insert overhead of stats-on vs
      // stats-off, the manifest's slice count, and the pruned-read
      // payoff against a filtered full scan over the same layout.
      import graft.schema.CollectionId
      import graft.sinks.ColumnarSink
      val inserts = 20 * factor
      val filesPer = 16
      val rowsPer = 20000L
      val id = CollectionId("p", "ev")
      def slice(b: Int) = spark.range(b * rowsPer, (b + 1) * rowsPer)
        .select(col("id").as("x"), (col("id") * 7 % 997).as("v"))
        .repartitionByRange(filesPer, col("x"))
      val plain = new ColumnarSink(s"$tmp/statsincr_off")
      timed("statsincr_off_insert_sec") {
        (0 until inserts).foreach(b => plain.insertBatch(id, slice(b), b.toLong))
      }
      val sink = new ColumnarSink(s"$tmp/statsincr_on",
        statsColumns = Seq("x"))
      timed("statsincr_on_insert_sec") {
        (0 until inserts).foreach(b => sink.insertBatch(id, slice(b), b.toLong))
      }
      val shardPath = new org.apache.hadoop.fs.Path(sink.statsShardPath(id))
      val fs = shardPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      out("statsincr_index_slices") = fs.listStatus(shardPath)
        .count(st => st.isFile && !st.getPath.getName.startsWith("_") &&
          !st.getPath.getName.startsWith(".")).toString
      out("statsincr_index_rows") =
        spark.read.parquet(sink.statsIndexPath).count().toString
      val lo = rowsPer * inserts / 2
      val hi = lo + rowsPer / 2 - 1
      val fullRows = timed("statsincr_fullscan_sec") {
        sink.read(spark, id).filter(col("x").between(lo, hi)).count()
      }
      val prunedDf = sink.prunedRead(spark, id, Seq(("x", lo, hi)))
      val prunedRows = timed("statsincr_pruned_sec") {
        prunedDf.filter(col("x").between(lo, hi)).count()
      }
      require(fullRows == prunedRows,
        s"pruned read diverged: $fullRows vs $prunedRows")
      out("statsincr_rows_matched") = fullRows.toString
      out("statsincr_files_total") = (inserts * filesPer).toString
      out("statsincr_files_kept") = prunedDf
        .select(input_file_name()).distinct().count().toString
    }

    if (want("statsshard")) {
      // ---- manifest sharding at 100-TB-shaped file counts: a 30k-file
      // sibling collection must NOT slow the planning of a small
      // collection's pruned read. v1 (unsharded) collected the WHOLE
      // manifest per read — planning grew with total file count; v2
      // shards per collection, so planning is bounded by the target
      // collection's own files. Measured three ways on one layout:
      // the small shard next to 30k sibling files, the big shard itself,
      // and a v1-style unsharded manifest over the same files.
      import graft.schema.CollectionId
      val base = s"$tmp/statsshard"
      val sink = new ColumnarSink(base, statsColumns = Seq("x"),
        maxRecordsPerFile = 1) // 1 row per file → 30k files from 32 tasks
      val big = CollectionId("p", "big")
      val small = CollectionId("p", "small")
      // 30k default; SPARK_GRAFT_STRESS_FILES=100000 for the next octave
      val bigFiles = sys.env.getOrElse("SPARK_GRAFT_STRESS_FILES", "30000").toLong
      timed("statsshard_write_sec") {
        sink.insertBatch(big,
          spark.range(bigFiles).select(col("id").as("x"), (col("id") * 3).as("v"))
            .repartition(32), 0L)
        sink.insertBatch(small,
          spark.range(100).select(col("id").as("x"), (col("id") * 3).as("v"))
            .repartition(4), 0L)
      }
      out("statsshard_files_total") = (bigFiles + 100).toString
      def planMs(f: => DataFrame): (DataFrame, Double) = {
        val t0 = System.nanoTime(); val df = f
        (df, (System.nanoTime() - t0) / 1e6)
      }
      // warm the FS/session once so the first measurement isn't cold-path
      sink.prunedRead(spark, small, Seq(("x", 10L, 20L))).count()
      val (smallDf, smallMs) = planMs(
        sink.prunedRead(spark, small, Seq(("x", 10L, 20L))))
      out("statsshard_small_plan_ms") = f"$smallMs%.0f"
      val (bigDf, bigMs) = planMs(
        sink.prunedRead(spark, big, Seq(("x", 1000L, 1099L))))
      out("statsshard_big_plan_ms") = f"$bigMs%.0f"
      // the r12 trust path vs the full staleness sweep, on the SAME big
      // collection: sink.prunedRead trusts the commit-marked batch dir
      // (planning O(#commits + manifest rows)); the generic entry point
      // certifies nothing and walks all files. The delta is the linear
      // tax the completeness marker deletes.
      val (sweepDf, sweepMs) = planMs(
        graft.layout.StatsIndex.prunedReadWith(spark, sink.path(big),
          sink.statsShardPath(big), Seq(("x", 1000L, 1099L)),
          Map("mergeSchema" -> "true")))
      out("statsshard_big_sweep_plan_ms") = f"$sweepMs%.0f"
      require(sweepDf.filter(col("x").between(1000, 1099)).count() == 100)
      // v1 simulation: ONE unsharded manifest over all 30.1k files; a
      // small-collection read must collect every sibling's rows
      val v1idx = s"$tmp/statsshard_v1idx"
      val allFiles = {
        val root = new org.apache.hadoop.fs.Path(base)
        graft.util.FsWalk.dataFiles(
          root.getFileSystem(spark.sparkContext.hadoopConfiguration), root)
      }
      timed("statsshard_v1_build_sec") {
        graft.layout.StatsIndex.appendFor(spark, v1idx, base, allFiles, Seq("x"))
      }
      val (v1Df, v1Ms) = planMs(
        graft.layout.StatsIndex.prunedReadWith(spark, sink.path(small), v1idx,
          Seq(("x", 10L, 20L)), Map("mergeSchema" -> "true")))
      out("statsshard_v1_small_plan_ms") = f"$v1Ms%.0f"
      // parity: all three prune exactly
      require(smallDf.filter(col("x").between(10, 20)).count() == 11)
      require(v1Df.filter(col("x").between(10, 20)).count() == 11)
      require(bigDf.filter(col("x").between(1000, 1099)).count() == 100)
      out("statsshard_big_files_kept") = bigDf
        .select(input_file_name()).distinct().count().toString
    }

    if (want("statsmeta")) {
      // ---- trusted planning at the 10⁶-file asymptote, metadata-only:
      // with the walk gone, planning cost is bounded by MANIFEST rows
      // (one parquet read + one driver pass), so the honest octave-up
      // measurement needs a million manifest rows, not a million staged
      // data files (331 s of write time bought 100k at the statsshard
      // octave). Synthesize a trusted batch dir with 16 real in-range
      // files + N-16 synthetic out-of-range rows: the selective read
      // must plan against all N rows, keep 16, probe 16, walk nothing.
      import graft.layout.StatsIndex
      val base = s"$tmp/statsmeta"
      val dataDir = s"$base/data"
      val batchDir = s"$dataDir/batch=0"
      spark.range(1600).select(col("id").as("x"))
        .repartition(16).write.parquet(batchDir)
      val real = {
        val p = new org.apache.hadoop.fs.Path(batchDir)
        graft.util.FsWalk.dataFiles(
          p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
      }
      val idxDir = s"$base/idx"
      for (n <- Seq(100000L, 1000000L)) {
        val pI = new org.apache.hadoop.fs.Path(idxDir)
        val fsI = pI.getFileSystem(spark.sparkContext.hadoopConfiguration)
        fsI.delete(pI, true)
        // real files carry true stats; synthetic rows sit far out of range
        val realDf = spark.read.option("basePath", dataDir).parquet(real: _*)
          .select(input_file_name().as("_file"), col("x"))
          .groupBy(col("_file"))
          .agg(min(col("x")).as("min_x"), max(col("x")).as("max_x"),
            count(lit(1)).as("n_rows"))
        val synth = spark.range(n - real.size).select(
          concat(lit(s"$batchDir/synthetic-"), col("id"), lit(".parquet")).as("_file"),
          (col("id") * 10 + 1000000L).as("min_x"),
          (col("id") * 10 + 1000005L).as("max_x"),
          lit(100L).as("n_rows"))
        realDf.unionByName(synth)
          .withColumn("_stat_cols", array(lit("x")))
          .coalesce(4).write.mode("overwrite").parquet(idxDir)
        val trusted = Set(StatsIndex.normalize(batchDir))
        def planMs(): (DataFrame, Double) = {
          val t0 = System.nanoTime()
          val df = StatsIndex.prunedReadWith(spark, dataDir, idxDir,
            Seq(("x", 100L, 299L)), Map.empty, trustedSubdirs = trusted)
          (df, (System.nanoTime() - t0) / 1e6)
        }
        planMs() // warm
        val (df, ms) = planMs()
        require(df.filter(col("x").between(100, 299)).count() == 200)
        out(s"statsmeta_plan_ms_${n / 1000}k_rows") = f"$ms%.0f"
      }
    }

    if (want("statsprune1m")) {
      // ---- the r12 verdict's composition ask: statsshard proved 902 ms
      // planning at 100k REAL files and statsmeta proved manifest-size
      // independence at 10⁶ SYNTHETIC rows — this section composes them:
      // ONE real collection at ~10⁶ data files written through the
      // sink's own insert path (real parquet files, real stats slices,
      // real commit markers), then a selective pruned read whose
      // PLANNING must stay sub-second because every batch dir is
      // commit-marked (the steady-state streaming shape). Write cost is
      // the price of honesty (~3.3 s per 1k one-row files at the
      // statsshard octave); SPARK_GRAFT_STRESS_FILES1M overrides the
      // file count for cheaper re-runs.
      import graft.schema.CollectionId
      val base = s"$tmp/statsprune1m"
      val sink = new ColumnarSink(base, statsColumns = Seq("x"),
        maxRecordsPerFile = 1) // 1 row per file
      val id = CollectionId("p", "big")
      val totalFiles =
        sys.env.getOrElse("SPARK_GRAFT_STRESS_FILES1M", "1000000").toLong
      val nBatches = 10
      val per = totalFiles / nBatches
      timed("statsprune1m_write_sec") {
        (0 until nBatches).foreach { b =>
          sink.insertBatch(id,
            spark.range(b * per, (b + 1) * per)
              .select(col("id").as("x"), (col("id") * 3).as("v"))
              .repartition(32), b.toLong)
        }
      }
      out("statsprune1m_files") = totalFiles.toString
      val lo = per * 3 + 17 // mid-collection, inside batch 3
      val hi = lo + 99
      def plan(): (DataFrame, Double) = {
        val t0 = System.nanoTime()
        val df = sink.prunedRead(spark, id, Seq(("x", lo, hi)))
        (df, (System.nanoTime() - t0) / 1e6)
      }
      plan() // warm: JIT + parquet footer caches, same as statsmeta
      val (df, ms) = plan()
      out("statsprune1m_plan_ms") = f"$ms%.0f"
      val rows = df.filter(col("x").between(lo, hi)).count()
      require(rows == 100, s"pruned read lost rows at 1M files: $rows")
      out("statsprune1m_files_kept") =
        df.select(input_file_name()).distinct().count().toString
      // the claim: planning is commit-bounded, NOT file-bounded — at 10⁶
      // real files it must hold statsmeta's sub-second flat line
      require(ms < 3000,
        f"trusted planning regressed to file-linear at 1M files: $ms%.0f ms")
    }

    if (want("crashstats")) {
      // ---- crash drill with the stats manifest ON at cardinality: the
      // crashsoak scenario (kill between the two cohort writes of a
      // mid-run batch, restart, replay) at C=100 with statsColumns set —
      // the replay path that APPENDS a second stats slice for the
      // replayed batch while dynamic overwrite supersedes its data
      // files. Proves at rest: pruned reads stay EXACT across the
      // replay (per-file `_file` dedup + the un-marked-then-re-marked
      // completeness protocol), per-shard slice counts stay bounded by
      // the self-compaction threshold, and trusted planning serves the
      // whole soak.
      import graft.schema.EventSchema
      import graft.sinks.EventSink
      import graft.schema.CollectionId
      import org.apache.spark.sql.types.StructType
      import spark.implicits._
      val nRec = 1000000L
      val chunksST = 40
      val filesPerBatch = 4
      val now = System.currentTimeMillis()
      val input = s"$tmp/crashstats_in"
      timed("crashstats_stage_sec") {
        spark.range(nRec).select(concat(
            lit("""{"data":{"_project":"demo","_collection":"c"""),
            col("id") % 100, lit("\","),
            lit(""""_time":"""), lit(now), lit(","),
            lit(""""n":"""), col("id"), lit("}}")).as("value")).as[String]
          .repartition(chunksST * filesPerBatch).write.text(input)
      }
      val cfgST = IngestConfig(availableNow = true, commitRetries = 0,
        consolidateThreshold = 64, writeParallelism = 1)
      def statsSink(dir: String) = new ColumnarSink(dir,
        statsColumns = Seq("n"), statsCompactSlices = 16)
      final class KillAt(inner: graft.sinks.ColumnarSink, failAt: Int)
          extends EventSink {
        val n = new java.util.concurrent.atomic.AtomicInteger(0)
        override def getColumns(id: CollectionId): Option[StructType] =
          inner.getColumns(id)
        override def insert(id: CollectionId, df: DataFrame): Unit =
          inner.insert(id, df)
        override def insert(id: CollectionId, df: DataFrame, b: Long): Unit =
          inner.insert(id, df, b)
        override def supportsConsolidated: Boolean = true
        override def insertConsolidated(rows: DataFrame, b: Long): Unit = {
          // fail AFTER the cohort landed (data + stats + markers) but
          // before the batch's offsets commit — the pure-replay case
          // where the manifest double-appends on the re-run
          inner.insertConsolidated(rows, b)
          if (n.incrementAndGet() == failAt)
            throw new RuntimeException("injected crash after cohort write")
        }
      }
      val sinkDir = s"$tmp/crashstats_sink"
      val ckpt = s"$tmp/crashstats_ckpt"
      def src = IngestStream.fileSource(spark, input,
        maxFilesPerTrigger = Some(filesPerBatch))
      timed("crashstats_run1_sec") {
        val q1 = IngestStream.start(spark, src, new EventSchema.Registry(),
          new KillAt(statsSink(sinkDir), failAt = 25), None, ckpt, cfgST)
        try { q1.processAllAvailable(); q1.awaitTermination() }
        catch { case _: Throwable => () } finally q1.stop()
      }
      timed("crashstats_resume_sec") {
        val q2 = IngestStream.start(spark, src, new EventSchema.Registry(),
          statsSink(sinkDir), None, ckpt, cfgST)
        try q2.processAllAvailable() finally q2.stop()
      }
      val sink = statsSink(sinkDir)
      // exactness across the replayed batch: pruned == full-scan filter
      // on every probed collection (each collection holds every residue
      // class mod 100, so the window genuinely prunes)
      var prunedFilesSum = 0L
      for (c <- Seq(0, 7, 49, 99)) {
        val id = CollectionId("demo", s"c$c")
        val lo = 100000L + c; val hi = 400000L + c
        val want = sink.read(spark, id)
          .filter(col("n").between(lo, hi)).count()
        val prunedDf = sink.prunedRead(spark, id, Seq(("n", lo, hi)))
        val got = prunedDf.filter(col("n").between(lo, hi)).count()
        require(got == want && want > 0,
          s"crashstats pruned read diverged on c$c: $got vs $want")
        prunedFilesSum += prunedDf.select(input_file_name()).distinct().count()
      }
      out("crashstats_pruned_files_4probes") = prunedFilesSum.toString
      out("crashstats_rows") = sink.readAll(spark).count().toString
      require(sink.readAll(spark).count() == nRec)
      // slice counts bounded by self-compaction despite the replay's
      // double-append
      val idxRoot = new org.apache.hadoop.fs.Path(sink.statsIndexPath)
      val fsST = idxRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val sliceCounts = for {
        proj <- fsST.listStatus(idxRoot).toSeq if proj.isDirectory
        coll <- fsST.listStatus(proj.getPath).toSeq if coll.isDirectory
      } yield fsST.listStatus(coll.getPath).count(st => st.isFile &&
        !st.getPath.getName.startsWith("_") &&
        !st.getPath.getName.startsWith("."))
      out("crashstats_shards") = sliceCounts.size.toString
      out("crashstats_max_slices") = sliceCounts.max.toString
      require(sliceCounts.max <= 17,
        s"manifest slices unbounded after replay: ${sliceCounts.max}")
    }

    if (want("samplepack")) {
      // ---- the never-stressed families, one octave up: exact-rate
      // sampling/mixtures (driver-side BigInt rate tables — the claim to
      // kill is a hidden quadratic in rate-table construction as SOURCE
      // cardinality grows), block packing (per-shard windows — the claim
      // is the window stays shard-partitioned, never global), and BPE
      // pair counting (the claim is the pair explosion stays linear in
      // corpus tokens). 10× docs corpus × 10× source cardinality.
      import graft.operators.{Sampling, Bpe}
      val docs10 = tenXDocs(spark, sfDir, factor)
        // re-source to 10k distinct sources: rate tables now hold 10k rows
        .withColumn("source", concat(lit("s"), pmod(hash(col("doc_id")), lit(10000))))
        .withColumn("n_tokens", size(split(coalesce(col("text"), lit("")), " ")).cast("long"))
      docs10.write.mode("overwrite").parquet(s"$tmp/samplepack_docs")
      val dd = spark.read.parquet(s"$tmp/samplepack_docs")
      val nDocsSP = dd.count()
      out("samplepack_docs") = nDocsSP.toString
      out("samplepack_sources") = dd.select("source").distinct().count().toString
      val mixed = timed("samplepack_sqrtmix_sec") {
        Sampling.sqrtMixtureSample(dd, "doc_id", "source",
          budgetDocs = nDocsSP / 10, salt = "sp").count()
      }
      out("samplepack_sqrtmix_kept") = mixed.toString
      val strat = timed("samplepack_stratified_sec") {
        Sampling.stratifiedSample(dd, "doc_id", "source",
          Map.empty[String, Int], defaultBp = 1000, salt = "sp2").count()
      }
      out("samplepack_stratified_kept") = strat.toString
      val budget = timed("samplepack_tokenbudget_sec") {
        Sampling.tokenBudgetSample(dd, "doc_id", "n_tokens",
          budgetTokens = 2000000L, salt = "sp3").count()
      }
      out("samplepack_tokenbudget_kept") = budget.toString
      val packed = timed("samplepack_pack_sec") {
        val p = Sampling.packBlocks(dd, "doc_id", "n_tokens",
          blockTokens = 2048L, numShards = 64, salt = "sp4")
        p.agg(count(lit(1)), max(col("block_end"))).head()
      }
      out("samplepack_blocks_max") = packed.getLong(1).toString
      val pairs = timed("samplepack_bpe_pairs_sec") {
        Bpe.pairCounts(dd, "text").count()
      }
      out("samplepack_bpe_distinct_pairs") = pairs.toString
    }

    if (want("crashsoak")) {
      // ---- crash drill × 1k-collection soak: kill the consolidated
      // streaming soak mid-run (batch ~49, BETWEEN the two cohort writes
      // of the batch — the partial-commit case at cardinality), restart
      // from the same checkpoint, and hash-match the 10M-record at-rest
      // content + registry against an uninterrupted soak. This is the
      // CrashRecoverySpec drill at the cardinality where the consolidated
      // path (not the per-table marker path) does the work continuously.
      import graft.schema.EventSchema
      import graft.sinks.EventSink
      import graft.schema.CollectionId
      import org.apache.spark.sql.types.StructType
      import spark.implicits._
      val nRec = 10000000L
      val chunksCS = 100
      val filesPerBatch = 8
      val now = System.currentTimeMillis()
      val input = s"$tmp/crashsoak_in"
      timed("crashsoak_stage_sec") {
        // 1000 live collections, TWO schema shapes (even suffixes carry
        // "x") → two same-schema cohorts per micro-batch
        spark.range(nRec).select(concat(
            lit("""{"data":{"_project":"demo","_collection":"c"""),
            col("id") % 1000, lit("\","),
            when((col("id") % 1000) % 2 === 0,
              concat(lit(""""x":"""), col("id") % 7, lit(",")))
              .otherwise(lit("")),
            lit(""""_time":"""), lit(now), lit(","),
            lit(""""_user":"u"""), col("id") % 97, lit("\","),
            lit(""""n":"""), col("id"), lit("}}")).as("value")).as[String]
          .repartition(chunksCS * filesPerBatch).write.text(input)
      }
      val cfgCS = IngestConfig(availableNow = true, commitRetries = 0,
        consolidateThreshold = 64, writeParallelism = 1)
      // kill between the two cohort writes of batch 49: calls 2b+1, 2b+2
      // belong to batch b, so call #100 is batch 49's SECOND cohort
      final class KillAt(inner: graft.sinks.ColumnarSink, failAt: Int)
          extends EventSink {
        val n = new java.util.concurrent.atomic.AtomicInteger(0)
        override def getColumns(id: CollectionId): Option[StructType] =
          inner.getColumns(id)
        override def insert(id: CollectionId, df: DataFrame): Unit =
          inner.insert(id, df)
        override def insert(id: CollectionId, df: DataFrame, b: Long): Unit =
          inner.insert(id, df, b)
        override def supportsConsolidated: Boolean = true
        override def insertConsolidated(rows: DataFrame, b: Long): Unit = {
          if (n.incrementAndGet() == failAt)
            throw new RuntimeException("injected crash inside batch")
          inner.insertConsolidated(rows, b)
        }
      }
      def latencies(q: org.apache.spark.sql.streaming.StreamingQuery): Seq[Long] =
        q.recentProgress.toSeq
          .filter(_.numInputRows > 0)
          .flatMap(p => Option(p.durationMs.get("triggerExecution")).map(_.toLong))
      def p50(xs: Seq[Long]): Long =
        if (xs.isEmpty) 0L else xs.sorted.apply(xs.size / 2)
      val sinkDir = s"$tmp/crashsoak_sink"
      val ckpt = s"$tmp/crashsoak_ckpt"
      def src = IngestStream.fileSource(spark, input,
        maxFilesPerTrigger = Some(filesPerBatch))
      val lat1 = timed("crashsoak_run1_sec") {
        val q1 = IngestStream.start(spark, src, new EventSchema.Registry(),
          new KillAt(new ColumnarSink(sinkDir), failAt = 100), None, ckpt, cfgCS)
        try { q1.processAllAvailable(); q1.awaitTermination() }
        catch { case _: Throwable => () } finally q1.stop()
        latencies(q1)
      }
      require(lat1.size >= 45, s"crash came too early: ${lat1.size} batches ran")
      val lat2 = timed("crashsoak_resume_sec") {
        val q2 = IngestStream.start(spark, src, new EventSchema.Registry(),
          new ColumnarSink(sinkDir), None, ckpt, cfgCS)
        try q2.processAllAvailable() finally q2.stop()
        latencies(q2)
      }
      out("crashsoak_batches_run1") = lat1.size.toString
      out("crashsoak_batches_resume") = lat2.size.toString
      out("crashsoak_p50_run1_ms") = p50(lat1).toString
      out("crashsoak_restart_batch_ms") = lat2.headOption.getOrElse(0L).toString
      out("crashsoak_p50_resume_ms") = p50(lat2.drop(1)).toString
      val oSinkDir = s"$tmp/crashsoak_oracle_sink"
      val oCkpt = s"$tmp/crashsoak_oracle_ckpt"
      val lat3 = timed("crashsoak_oracle_sec") {
        val q3 = IngestStream.start(spark, src, new EventSchema.Registry(),
          new ColumnarSink(oSinkDir), None, oCkpt, cfgCS)
        try q3.processAllAvailable() finally q3.stop()
        latencies(q3)
      }
      out("crashsoak_p50_oracle_ms") = p50(lat3).toString
      // at-rest content: order/layout-insensitive (collection-keyed row
      // JSON with wall-clock _shard_time and the batch dir column out),
      // count + order-insensitive hash sum
      def contentHash(base: String): (Long, java.math.BigDecimal) = {
        val df = new ColumnarSink(base).readAll(spark)
        val cols = df.columns
          .filterNot(c => c == "_shard_time" || c == "batch").sorted
        val r = df
          .select(xxhash64(to_json(struct(cols.map(col).toIndexedSeq: _*))).as("_h"))
          .agg(count(lit(1)), sum(col("_h").cast("decimal(38,0)"))).head()
        (r.getLong(0), r.getDecimal(1))
      }
      val (nA, hA) = contentHash(sinkDir)
      val (nB, hB) = contentHash(oSinkDir)
      require(nA == nRec && nB == nRec,
        s"crashsoak row counts: recovered=$nA oracle=$nB expected=$nRec")
      require(hA == hB, s"crashsoak content hash diverged: $hA vs $hB")
      // registry column-order authority survives the crash+replay
      val regA = new EventSchema.Registry()
      regA.loadSharded(IngestStream.registryPath(ckpt),
        spark.sparkContext.hadoopConfiguration)
      val regB = new EventSchema.Registry()
      regB.loadSharded(IngestStream.registryPath(oCkpt),
        spark.sparkContext.hadoopConfiguration)
      require(regA.all.map { case (id, st) => id -> st.json } ==
        regB.all.map { case (id, st) => id -> st.json },
        "crashsoak registry diverged from uninterrupted soak")
      require(regA.all.size == 1000)
      out("crashsoak_rows") = nA.toString
      out("crashsoak_hash_match") = "true"
      out("crashsoak_registry_match") = "true"
    }

    println(out.map { case (k, v) =>
      val quoted = if (v.matches("-?[0-9.]+|true|false")) v else "\"" + v + "\""
      "\"" + k + "\":" + quoted
    }.mkString("{", ",", "}"))
    try {
      java.nio.file.Files.walk(tmp).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => { java.nio.file.Files.deleteIfExists(f); () })
    } catch { case _: Throwable => () }
    spark.stop()
  }
}
