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
      val fs = new org.apache.hadoop.fs.Path(sink.statsIndexPath)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      out("statsincr_index_slices") = fs.listStatus(
        new org.apache.hadoop.fs.Path(sink.statsIndexPath))
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
