package graft

import graft.functions.SimilarityFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental inverted-file maintenance (`ivfAppend`): the quantizer (and
  * PQ codebooks) train once and persist; each crawl's new vectors are
  * assigned/encoded against the persisted artifacts and APPENDED — and the
  * grown index must be indistinguishable from a from-scratch rebuild.
  */
class AnnIncrementalSpec extends SparkSpec {

  /** Deterministic synthetic corpus: 8-dim direction-structured vectors. */
  private def vecs(lo: Long, hi: Long): DataFrame = {
    import spark.implicits._
    spark.range(lo, hi).select($"id".as("vec_id"),
      transform(sequence(lit(0), lit(7)),
        d => sin($"id" * (d + lit(1)) * 0.37) + cos($"id" * 0.11) * (d + lit(1)))
        .as("embedding"))
  }

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toSeq.toString).sorted.toSeq

  test("incrementally-grown inverted file is row-identical to a rebuild") {
    val tmp = java.nio.file.Files.createTempDirectory("ann_incr").toString
    val base = vecs(0, 600)
    val ivf = SimilarityFunctions.ivfTrain(base, "embedding", cells = 8)
    ivf.save(s"$tmp/q")
    val loaded = SimilarityFunctions.ivfLoad(s"$tmp/q")
    loaded.assign(base, "vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$tmp/inv")
    // three nightly crawls, each appended against the persisted centroids
    Seq((600L, 800L), (800L, 900L), (900L, 1000L)).foreach { case (lo, hi) =>
      SimilarityFunctions.ivfAppend(loaded, s"$tmp/inv", vecs(lo, hi),
        "vec_id", "embedding")
    }
    val grown = spark.read.parquet(s"$tmp/inv")
      .select(col("neighbor_id"), col("_cell"), col("_cv"))
    val rebuilt = loaded.assign(vecs(0, 1000), "vec_id", "embedding")
      .select(col("neighbor_id"), col("_cell"), col("_cv"))
    assert(grown.count() == 1000)
    assert(sortedRows(grown) == sortedRows(rebuilt),
      "incremental inverted file diverged from rebuild")
    // and searches over the two are identical rows
    val probes = vecs(0, 1000).filter(col("vec_id") % 97 === 0)
    val a = SimilarityFunctions.ivfSearch(spark.read.parquet(s"$tmp/inv"),
      probes, loaded, "vec_id", "embedding", 5, nProbe = 3)
    val b = SimilarityFunctions.ivfSearch(
      loaded.assign(vecs(0, 1000), "vec_id", "embedding"),
      probes, loaded, "vec_id", "embedding", 5, nProbe = 3)
    assert(sortedRows(a) == sortedRows(b))
    assert(a.count() > 0, "empty search proves nothing")
  }

  test("batch-keyed crawl: a replayed increment supersedes in place, never duplicates") {
    val tmp = java.nio.file.Files.createTempDirectory("ann_incr_b").toString
    val inv = s"$tmp/inv"
    val base = vecs(0, 400)
    val ivf = SimilarityFunctions.ivfTrain(base, "embedding", cells = 8)
    // the streaming (foreachBatch) shape: base is batch 0, crawls 1..2
    SimilarityFunctions.ivfAppendBatch(ivf, inv, base, "vec_id", "embedding", 0L)
    SimilarityFunctions.ivfAppendBatch(ivf, inv, vecs(400, 700),
      "vec_id", "embedding", 1L)
    // at-least-once replay of batch 1 (crash before the offsets commit):
    // the overwrite rewrites its own batch=1 dir — no duplicate rows
    SimilarityFunctions.ivfAppendBatch(ivf, inv, vecs(400, 700),
      "vec_id", "embedding", 1L)
    SimilarityFunctions.ivfAppendBatch(ivf, inv, vecs(700, 900),
      "vec_id", "embedding", 2L)
    val grown = spark.read.parquet(inv)
    assert(grown.count() == 900, "replayed batch duplicated inverted-file rows")
    val rebuilt = ivf.assign(vecs(0, 900), "vec_id", "embedding")
    assert(sortedRows(grown.select(col("neighbor_id"), col("_cell"), col("_cv")))
      == sortedRows(rebuilt.select(col("neighbor_id"), col("_cell"), col("_cv"))))
    // search through the batch-keyed index (inferred `batch` column rides
    // along harmlessly)
    val probes = vecs(0, 900).filter(col("vec_id") % 89 === 0)
    val a = SimilarityFunctions.ivfSearch(grown, probes, ivf,
      "vec_id", "embedding", 5, nProbe = 3)
    val b = SimilarityFunctions.ivfSearch(rebuilt, probes, ivf,
      "vec_id", "embedding", 5, nProbe = 3)
    assert(sortedRows(a) == sortedRows(b) && a.count() > 0)

    // layout-mixing refused BOTH ways (partition inference would silently
    // drop root-level rows next to batch= dirs)
    intercept[IllegalStateException] {
      SimilarityFunctions.ivfAppend(ivf, inv, vecs(900, 950),
        "vec_id", "embedding")
    }
    val rootInv = s"$tmp/inv_root"
    SimilarityFunctions.ivfAppend(ivf, rootInv, vecs(0, 100),
      "vec_id", "embedding")
    intercept[IllegalStateException] {
      SimilarityFunctions.ivfAppendBatch(ivf, rootInv, vecs(100, 200),
        "vec_id", "embedding", 1L)
    }
  }

  test("quantization error flags distribution drift (the retrain trigger)") {
    import spark.implicits._
    val base = vecs(0, 800)
    val ivf = SimilarityFunctions.ivfTrain(base, "embedding", cells = 8)
    val baseErr = SimilarityFunctions.quantizationErrorBp(ivf, base, "embedding")
    // in-distribution increment: same generator, new ids → error ~ base
    val inDist = SimilarityFunctions.quantizationErrorBp(ivf,
      vecs(800, 1600), "embedding")
    // drifted increment: a different vector family (axis-concentrated
    // instead of the trig mix) lands far from every trained centroid
    val drifted = spark.range(2000, 2400).select($"id".as("vec_id"),
      transform(sequence(lit(0), lit(7)),
        d => when(d === ($"id" % 8).cast("int"), lit(100.0)).otherwise(lit(0.001)))
        .as("embedding"))
    val driftErr = SimilarityFunctions.quantizationErrorBp(ivf, drifted, "embedding")
    info(s"base=$baseErr inDist=$inDist drifted=$driftErr (bp of unit sphere)")
    assert(inDist <= baseErr * 2 + 50, s"in-distribution error exploded: $inDist vs $baseErr")
    assert(driftErr > inDist * 2, s"drift not flagged: $driftErr vs $inDist")
    // degenerate: no usable vectors → 0, not a crash
    assert(SimilarityFunctions.quantizationErrorBp(ivf,
      base.limit(0), "embedding") == 0L)
  }

  /** A drifted vector family the base quantizer never saw: per-id jittered
    * axis spikes — members of one family share a dominant direction but
    * the jitter scatters them across whichever base cells happen to be
    * near-equidistant, which is exactly how drift degrades probe-limited
    * recall (true neighbors split across unprobed cells).
    */
  private def driftedVecs(lo: Long, hi: Long): DataFrame = {
    import spark.implicits._
    spark.range(lo, hi).select($"id".as("vec_id"),
      transform(sequence(lit(0), lit(7)),
        d => when(d === ($"id" % 8).cast("int"), lit(10.0))
          .otherwise(sin($"id" * (d + lit(3)) * 1.7) * 6.0))
        .as("embedding"))
  }

  test("drift crosses the threshold; retrain + atomic swap restores certified recall over the union") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("ann_retrain").toString
    val inv = s"$tmp/inv"
    val base = vecs(0, 800)
    val ivf = SimilarityFunctions.ivfTrain(base, "embedding", cells = 16)
    SimilarityFunctions.ivfAppendBatch(ivf, inv, base, "vec_id", "embedding", 0L)
    // nightly crawl lands a DRIFTED family; the error monitor flags it
    val drifted = driftedVecs(1000, 1800)
    val baseErr = SimilarityFunctions.quantizationErrorBp(ivf, base, "embedding")
    val incErr = SimilarityFunctions.quantizationErrorBp(ivf, drifted, "embedding")
    info(s"quantization error: base=$baseErr bp, drifted increment=$incErr bp")
    assert(incErr > baseErr * 2, "synthetic drift not flagged — test is vacuous")
    SimilarityFunctions.ivfAppendBatch(ivf, inv, drifted, "vec_id", "embedding", 1L)

    val union = vecs(0, 800).unionByName(drifted)
    val probes = union.filter($"vec_id" % 67 === 0)
    val truth = SimilarityFunctions.bruteForceTopK(union, probes,
      "vec_id", "embedding", 5)
    def recallBp(search: DataFrame): Long = {
      val t = truth.select($"query_id".as("_q"), $"neighbor_id".as("_t"))
      val hits = search.join(t,
        search("query_id") === col("_q") &&
          search("neighbor_id") === col("_t")).count()
      hits * 10000 / truth.count()
    }
    val before = recallBp(SimilarityFunctions.ivfSearch(
      spark.read.parquet(inv), probes, ivf, "vec_id", "embedding", 5,
      nProbe = 2))

    // the retrain: fresh spherical fit over the union (read from the
    // inverted file itself), one re-assignment pass, atomic dir swap
    val next = SimilarityFunctions.ivfRetrain(spark, inv, cells = 16)
    val after = recallBp(SimilarityFunctions.ivfSearch(
      spark.read.parquet(inv), probes, next, "vec_id", "embedding", 5,
      nProbe = 2))
    info(s"probe-2 recall: before retrain=$before bp, after=$after bp")
    assert(after >= before, "retrain degraded recall")
    assert(after >= 9000, s"retrained index misses the certified floor: $after bp")

    // the swap is complete and self-describing: every union row served,
    // quantizer co-located and loadable, layout still batch-keyed for
    // the next crawl's ivfAppendBatch
    val swapped = spark.read.parquet(inv)
    assert(swapped.count() == union.count())
    val reloaded = SimilarityFunctions.ivfLoad(
      SimilarityFunctions.ivfQuantizerPath(inv))
    assert(reloaded.clusterCenters.map(_.toSeq).toSeq ==
      next.clusterCenters.map(_.toSeq).toSeq,
      "co-located quantizer diverged from the returned index")
    assert(sortedRows(swapped.select($"neighbor_id", $"_cell", $"_cv")) ==
      sortedRows(next.assign(union, "vec_id", "embedding")
        .select($"neighbor_id", $"_cell", $"_cv")),
      "swapped inverted file diverged from a fresh rebuild")
    SimilarityFunctions.ivfAppendBatch(next, inv, vecs(5000, 5100),
      "vec_id", "embedding", 2L)
    assert(spark.read.parquet(inv).count() == union.count() + 100)
    // post-retrain the drift monitor is quiet again on the union
    val postErr = SimilarityFunctions.quantizationErrorBp(next, union, "embedding")
    info(s"post-retrain union error=$postErr bp")
    assert(postErr < incErr, "retrain did not reduce quantization error")
  }

  test("ivfRetrainIfDrifted acts only past the threshold") {
    val tmp = java.nio.file.Files.createTempDirectory("ann_ifdrift").toString
    val inv = s"$tmp/inv"
    val base = vecs(0, 600)
    val ivf = SimilarityFunctions.ivfTrain(base, "embedding", cells = 8)
    SimilarityFunctions.ivfAppendBatch(ivf, inv, base, "vec_id", "embedding", 0L)
    val baseErr = SimilarityFunctions.quantizationErrorBp(ivf, base, "embedding")
    // in-distribution increment: below 3× base → no action, index untouched
    val calm = SimilarityFunctions.ivfRetrainIfDrifted(spark, inv, ivf,
      vecs(600, 900), "embedding", driftThresholdBp = baseErr * 3, cells = 8)
    assert(calm.isEmpty, "in-distribution increment must not retrain")
    assert(!new java.io.File(
      s"$inv/${"_quantizer.json"}").exists, "no-op retrain touched the index")
    // drifted increment: crosses the threshold → retrain + swap happened
    SimilarityFunctions.ivfAppendBatch(ivf, inv, driftedVecs(2000, 2400),
      "vec_id", "embedding", 1L)
    val acted = SimilarityFunctions.ivfRetrainIfDrifted(spark, inv, ivf,
      driftedVecs(2000, 2400), "embedding",
      driftThresholdBp = baseErr * 3, cells = 8)
    assert(acted.nonEmpty, "drifted increment must trigger the retrain")
    val reloaded = SimilarityFunctions.ivfLoad(
      SimilarityFunctions.ivfQuantizerPath(inv))
    assert(reloaded.clusterCenters.map(_.toSeq).toSeq ==
      acted.get.clusterCenters.map(_.toSeq).toSeq)
    assert(spark.read.parquet(inv).count() == 1000)
  }

  test("crash between a crawl append and its offset commit: restart replays, append stays identical to rebuild") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("ann_crash").toString
    val inv = s"$tmp/inv"
    val ckpt = s"$tmp/ckpt"
    val src = s"$tmp/src"
    val ivf = SimilarityFunctions.ivfTrain(vecs(0, 300), "embedding", cells = 8)
    // three crawl files → three micro-batches (maxFilesPerTrigger=1)
    vecs(0, 300).write.parquet(s"$src/c0")
    vecs(300, 500).write.parquet(s"$src/c1")
    vecs(500, 650).write.parquet(s"$src/c2")
    val schema = vecs(0, 1).schema
    def stream(failOnBatch: Option[Long]) = spark.readStream
      .schema(schema).option("maxFilesPerTrigger", 1).parquet(s"$src/*")
      .writeStream
      .foreachBatch { (b: DataFrame, id: Long) =>
        SimilarityFunctions.ivfAppendBatch(ivf, inv, b,
          "vec_id", "embedding", id)
        // the kill window the r11 verdict asked for: the batch= dir is
        // fully written, the offsets never commit
        if (failOnBatch.contains(id))
          throw new RuntimeException("injected crash after append")
      }
      .option("checkpointLocation", ckpt).start()
    val q1 = stream(failOnBatch = Some(1L))
    intercept[Exception] { q1.processAllAvailable(); q1.awaitTermination() }
    q1.stop()
    // at rest mid-crash: some crawls landed (batch 1's rows are PRESENT
    // but uncommitted), the third never ran — file order is the source's
    // choice, so only the bounds are asserted here; the identity check
    // below is the real gate
    val midCrash = spark.read.parquet(inv).count()
    assert(midCrash > 0 && midCrash < 650, s"unexpected mid-crash state: $midCrash")
    // restart from the same checkpoint: batch 1 replays (overwrite
    // supersedes its own first attempt), batch 2 lands
    val q2 = stream(failOnBatch = None)
    try q2.processAllAvailable() finally q2.stop()
    val grown = spark.read.parquet(inv)
    assert(grown.count() == 650, "crash-replayed append duplicated or lost rows")
    val rebuilt = ivf.assign(vecs(0, 650), "vec_id", "embedding")
    assert(sortedRows(grown.select(col("neighbor_id"), col("_cell"), col("_cv")))
      == sortedRows(rebuilt.select(col("neighbor_id"), col("_cell"), col("_cv"))),
      "post-crash incremental index diverged from rebuild")
  }

  test("retrain with a fresh PQ codebook re-encodes in the rebuild pass; searches match a from-scratch IVF-PQ build") {
    val tmp = java.nio.file.Files.createTempDirectory("ann_retr_pq").toString
    val inv = s"$tmp/inv"
    val base = vecs(0, 500)
    val v1Ivf = SimilarityFunctions.ivfTrain(base, "embedding", cells = 8)
    val v1Pq = SimilarityFunctions.pqTrain(base, "embedding", m = 4, codes = 8)
    SimilarityFunctions.ivfAppendBatch(v1Ivf, inv, base,
      "vec_id", "embedding", 0L, pq = Some(v1Pq))
    val drifted = driftedVecs(1000, 1500)
    SimilarityFunctions.ivfAppendBatch(v1Ivf, inv, drifted,
      "vec_id", "embedding", 1L, pq = Some(v1Pq))
    // drift response retrains BOTH artifacts; the rebuild re-encodes
    val union = vecs(0, 500).unionByName(drifted)
    val v2Pq = SimilarityFunctions.pqTrain(union, "embedding", m = 4, codes = 8)
    val v2Ivf = SimilarityFunctions.ivfRetrain(spark, inv, cells = 8,
      pq = Some(v2Pq))
    val swapped = spark.read.parquet(inv)
    val scratch = v2Ivf.assign(union, "vec_id", "embedding")
      .withColumn("_codes",
        graft.functions.expressions.PqExpressions.pq_encode(
          col("_cv").cast("array<double>"), v2Pq.codebooks))
    val probes = union.filter(col("vec_id") % 71 === 0)
    val a = SimilarityFunctions.ivfPqSearch(swapped, probes, v2Ivf, v2Pq,
      "vec_id", "embedding", 5, nProbe = 3)
    val b = SimilarityFunctions.ivfPqSearch(scratch, probes, v2Ivf, v2Pq,
      "vec_id", "embedding", 5, nProbe = 3)
    assert(sortedRows(a) == sortedRows(b),
      "PQ-re-encoding retrain diverged from a from-scratch IVF-PQ build")
    assert(a.count() > 0)
  }

  test("tombstone compaction: removed docs leave the index; survivors' cells untouched; appends continue") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("ann_tomb").toString
    val inv = s"$tmp/inv"
    val ivf = SimilarityFunctions.ivfTrain(vecs(0, 600), "embedding", cells = 8)
    SimilarityFunctions.ivfAppendBatch(ivf, inv, vecs(0, 600),
      "vec_id", "embedding", 0L)
    SimilarityFunctions.ivfAppendBatch(ivf, inv, vecs(600, 900),
      "vec_id", "embedding", 1L)
    // the crawl's `removed` set: every id divisible by 3
    val gone = spark.range(0, 900, 3).select($"id".as("doc_id"))
    val same = SimilarityFunctions.ivfCompact(spark, inv, ivf, gone, "doc_id")
    assert(same.clusterCenters.map(_.toSeq).toSeq ==
      ivf.clusterCenters.map(_.toSeq).toSeq, "compaction must not retrain")
    val after = spark.read.parquet(inv)
    assert(after.count() == 600, s"tombstones not purged: ${after.count()}")
    assert(after.filter(pmod($"neighbor_id", lit(3)) === 0).count() == 0)
    // survivors row-identical to a rebuild over the surviving corpus
    val survivors = vecs(0, 900).filter(pmod($"vec_id", lit(3)) =!= 0)
    assert(sortedRows(after.select($"neighbor_id", $"_cell", $"_cv")) ==
      sortedRows(ivf.assign(survivors, "vec_id", "embedding")
        .select($"neighbor_id", $"_cell", $"_cv")))
    // searches never return a tombstoned id, and the layout still
    // accepts the next crawl
    val probed = SimilarityFunctions.ivfSearch(after,
      vecs(0, 900).filter($"vec_id" % 97 === 0), ivf,
      "vec_id", "embedding", 5, nProbe = 3)
    assert(probed.filter(pmod($"neighbor_id", lit(3)) === 0).count() == 0)
    SimilarityFunctions.ivfAppendBatch(ivf, inv, vecs(900, 950),
      "vec_id", "embedding", 2L)
    assert(spark.read.parquet(inv).count() == 650)
  }

  // ------------------------------------------------------------------
  // Mechanized retrain-vs-appender exclusion (r12 verdict task 1): an
  // append racing a swap must either FAIL LOUDLY or LAND in the
  // published index — never vanish silently.
  // ------------------------------------------------------------------

  test("swap lock: appends and a second swap refuse loudly while a retrain is in flight") {
    val tmp = java.nio.file.Files.createTempDirectory("ann_lock").toString
    val inv = s"$tmp/inv"
    val ivf = SimilarityFunctions.ivfTrain(vecs(0, 400), "embedding", cells = 8)
    SimilarityFunctions.ivfAppendBatch(ivf, inv, vecs(0, 400),
      "vec_id", "embedding", 0L)
    var appendErr: Option[IllegalStateException] = None
    var retrainErr: Option[IllegalStateException] = None
    SimilarityFunctions.retrainWithHooked(spark, inv,
      df => SimilarityFunctions.ivfTrain(df, "_cv", cells = 8),
      (u, n) => u.withColumn("_cell",
        element_at(graft.functions.expressions.IvfExpressions.ivf_rank_cells(
          col("_cv"), n.clusterCenters, 1), 1)),
      testBeforeRetire = () => {
        appendErr = Some(intercept[IllegalStateException] {
          SimilarityFunctions.ivfAppendBatch(ivf, inv, vecs(400, 450),
            "vec_id", "embedding", 1L)
        })
        retrainErr = Some(intercept[IllegalStateException] {
          SimilarityFunctions.ivfRetrain(spark, inv, cells = 8)
        })
      })
    assert(appendErr.get.getMessage.contains("swap"),
      s"append-vs-swap error not actionable: ${appendErr.get.getMessage}")
    assert(retrainErr.get.getMessage.contains("lock"),
      s"swap-vs-swap error not actionable: ${retrainErr.get.getMessage}")
    // the lock is released after the swap: normal operation resumes
    SimilarityFunctions.ivfAppendBatch(
      SimilarityFunctions.ivfLoad(SimilarityFunctions.ivfQuantizerPath(inv)),
      inv, vecs(400, 450), "vec_id", "embedding", 1L)
    assert(spark.read.parquet(inv).count() == 450)
  }

  test("an append landing in the swap window is forwarded into the published index, re-assigned under the NEW quantizer") {
    val tmp = java.nio.file.Files.createTempDirectory("ann_fwd").toString
    val inv = s"$tmp/inv"
    val v1 = SimilarityFunctions.ivfTrain(vecs(0, 400), "embedding", cells = 8)
    SimilarityFunctions.ivfAppendBatch(v1, inv, vecs(0, 400),
      "vec_id", "embedding", 0L)
    // simulate appends already past their lock pre-check whose writes
    // land (a) just before the live dir is retired and (b) inside the
    // rename gap — raw writes, exactly what the committer's final rename
    // produces
    val next = SimilarityFunctions.retrainWithHooked(spark, inv,
      df => SimilarityFunctions.ivfTrain(df, "_cv", cells = 8, seed = 7L),
      (u, n) => u.withColumn("_cell",
        element_at(graft.functions.expressions.IvfExpressions.ivf_rank_cells(
          col("_cv"), n.clusterCenters, 1), 1)),
      testBeforeRetire = () =>
        v1.assign(vecs(400, 460), "vec_id", "embedding")
          .write.parquet(s"$inv/batch=7"),
      testBetweenRenames = () =>
        v1.assign(vecs(460, 500), "vec_id", "embedding")
          .write.parquet(s"$inv/batch=8"))
    val pub = spark.read.parquet(inv)
    assert(pub.count() == 500,
      s"racing appends were dropped by the swap: ${pub.count()}")
    // the rescued rows carry NEW-quantizer cells (verbatim forwarding
    // would leave them invisible to post-retrain searches)
    assert(sortedRows(pub.select(col("neighbor_id"), col("_cell"), col("_cv")))
      == sortedRows(next.assign(vecs(0, 500), "vec_id", "embedding")
        .select(col("neighbor_id"), col("_cell"), col("_cv"))),
      "forwarded increments diverge from a rebuild under the new quantizer")
    // no residue: strays/staging/retired all cleaned up
    val fs = new org.apache.hadoop.fs.Path(tmp)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val leftovers = fs.listStatus(new org.apache.hadoop.fs.Path(tmp))
      .map(_.getPath.getName).filterNot(_ == "inv")
    assert(leftovers.isEmpty, s"swap left residue: ${leftovers.mkString(",")}")
  }

  test("an append whose write overlaps a full swap observes the epoch bump and fails loudly; the instructed replay converges") {
    val tmp = java.nio.file.Files.createTempDirectory("ann_epoch").toString
    val inv = s"$tmp/inv"
    val v1 = SimilarityFunctions.ivfTrain(vecs(0, 400), "embedding", cells = 8)
    SimilarityFunctions.ivfAppendBatch(v1, inv, vecs(0, 400),
      "vec_id", "embedding", 0L)
    // the append's batch=1 write lands, then a whole retrain runs before
    // the appender's post-validation (its lock pre-check passed earlier)
    val raced = intercept[IllegalStateException] {
      SimilarityFunctions.ivfAppendBatchHooked(v1, inv, vecs(400, 500),
        "vec_id", "embedding", 1L,
        testAfterWrite =
          () => { SimilarityFunctions.ivfRetrain(spark, inv, cells = 8); () })
    }
    assert(raced.getMessage.contains("replay"),
      s"epoch-bump error not actionable: ${raced.getMessage}")
    // nothing silently dropped: batch=1 was in the union the retrain read
    // (it landed before), so the rebuild carries its rows already
    assert(spark.read.parquet(inv).count() == 500)
    // the instructed replay (after reloading the swapped quantizer) is
    // idempotent — same 500 rows, now all under the new assignment
    val v2 = SimilarityFunctions.ivfLoad(
      SimilarityFunctions.ivfQuantizerPath(inv))
    SimilarityFunctions.ivfAppendBatch(v2, inv, vecs(400, 500),
      "vec_id", "embedding", 1L)
    val after = spark.read.parquet(inv)
    assert(after.count() == 500, s"replay duplicated rows: ${after.count()}")
    assert(sortedRows(after.select(col("neighbor_id"), col("_cell"), col("_cv")))
      == sortedRows(v2.assign(vecs(0, 500), "vec_id", "embedding")
        .select(col("neighbor_id"), col("_cell"), col("_cv"))))
  }

  test("a stale in-memory quantizer is refused after a swap (rows would land in unprobed cells)") {
    val tmp = java.nio.file.Files.createTempDirectory("ann_stale").toString
    val inv = s"$tmp/inv"
    val v1 = SimilarityFunctions.ivfTrain(vecs(0, 400), "embedding", cells = 8)
    SimilarityFunctions.ivfAppendBatch(v1, inv, vecs(0, 400),
      "vec_id", "embedding", 0L)
    SimilarityFunctions.ivfRetrain(spark, inv, cells = 8, seed = 7L)
    val stale = intercept[IllegalStateException] {
      SimilarityFunctions.ivfAppendBatch(v1, inv, vecs(400, 500),
        "vec_id", "embedding", 1L)
    }
    assert(stale.getMessage.contains("STALE"),
      s"stale-quantizer error not actionable: ${stale.getMessage}")
    // reloading the co-located quantizer is the fix
    val v2 = SimilarityFunctions.ivfLoad(
      SimilarityFunctions.ivfQuantizerPath(inv))
    SimilarityFunctions.ivfAppendBatch(v2, inv, vecs(400, 500),
      "vec_id", "embedding", 1L)
    assert(spark.read.parquet(inv).count() == 500)
  }

  test("an append racing a COMPACT swap is forwarded through the same anti-join: tombstoned ids are purged from the stray too") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("ann_fwd_c").toString
    val inv = s"$tmp/inv"
    val ivf = SimilarityFunctions.ivfTrain(vecs(0, 400), "embedding", cells = 8)
    SimilarityFunctions.ivfAppendBatch(ivf, inv, vecs(0, 400),
      "vec_id", "embedding", 0L)
    // the crawl's removed set covers ids the RACING append also carries:
    // forwarding the stray verbatim would resurrect tombstoned docs
    val gone = spark.range(0, 500, 5).select($"id".as("neighbor_id")).distinct()
    SimilarityFunctions.retrainWithHooked(spark, inv,
      _ => ivf, // compact: quantizer unchanged
      (u, _) => u.join(gone, Seq("neighbor_id"), "left_anti"),
      testBeforeRetire = () =>
        ivf.assign(vecs(400, 500), "vec_id", "embedding")
          .write.parquet(s"$inv/batch=7"))
    val after = spark.read.parquet(inv)
    assert(after.count() == 400, s"compact+forward row count: ${after.count()}")
    assert(after.filter(pmod($"neighbor_id", lit(5)) === 0).count() == 0,
      "forwarded stray resurrected tombstoned ids")
    // the stray's SURVIVING ids are all present
    assert(after.filter($"neighbor_id" >= 400).count() == 80)
  }

  test("PQ retrain co-locates the fresh codebook; compact carries it forward; stale-codebook appends refused; restart reload serves identically") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("ann_pqloc").toString
    val inv = s"$tmp/inv"
    val base = vecs(0, 400)
    val v1 = SimilarityFunctions.ivfTrain(base, "embedding", cells = 8)
    val v1Pq = SimilarityFunctions.pqTrain(base, "embedding", m = 4, codes = 8)
    SimilarityFunctions.ivfAppendBatch(v1, inv, base,
      "vec_id", "embedding", 0L, pq = Some(v1Pq))
    val drifted = driftedVecs(1000, 1400)
    SimilarityFunctions.ivfAppendBatch(v1, inv, drifted,
      "vec_id", "embedding", 1L, pq = Some(v1Pq))
    val union = base.unionByName(drifted)
    val v2Pq = SimilarityFunctions.pqTrain(union, "embedding", m = 4, codes = 8)
    val v2 = SimilarityFunctions.ivfRetrain(spark, inv, cells = 8,
      pq = Some(v2Pq))
    // the fresh codebook published ATOMICALLY with the codes it encodes
    val (loadedIvf, loadedPq) = SimilarityFunctions.ivfLoadArtifacts(spark, inv)
    assert(loadedPq.nonEmpty, "PQ retrain did not co-locate the codebook")
    assert(loadedPq.get.toJson == v2Pq.toJson,
      "co-located codebook diverged from the retrained one")
    assert(loadedIvf.clusterCenters.map(_.toSeq).toSeq ==
      v2.clusterCenters.map(_.toSeq).toSeq)
    // a codes-preserving swap (compact) carries the codebook forward
    SimilarityFunctions.ivfCompact(spark, inv, v2,
      spark.range(0, 100).select($"id".as("doc_id")), "doc_id")
    val (_, carried) = SimilarityFunctions.ivfLoadArtifacts(spark, inv)
    assert(carried.map(_.toJson).contains(v2Pq.toJson),
      "compact dropped the co-located codebook")
    // appending codes from the SUPERSEDED codebook is refused loudly
    val stale = intercept[IllegalStateException] {
      SimilarityFunctions.ivfAppendBatch(v2, inv, vecs(2000, 2050),
        "vec_id", "embedding", 2L, pq = Some(v1Pq))
    }
    assert(stale.getMessage.contains("STALE PQ"),
      s"stale-codebook error not actionable: ${stale.getMessage}")
    // the driver-restart shape: reload BOTH artifacts, append, serve —
    // identical to serving with the in-memory pair
    val (ri, rpq) = SimilarityFunctions.ivfLoadArtifacts(spark, inv)
    SimilarityFunctions.ivfAppendBatch(ri, inv, vecs(2000, 2050),
      "vec_id", "embedding", 2L, pq = rpq)
    val served = spark.read.parquet(inv)
    val probes = union.filter(col("vec_id") % 83 === 0)
    val a = SimilarityFunctions.ivfPqSearch(served, probes, ri, rpq.get,
      "vec_id", "embedding", 5, nProbe = 3)
    val b = SimilarityFunctions.ivfPqSearch(served, probes, v2, v2Pq,
      "vec_id", "embedding", 5, nProbe = 3)
    assert(sortedRows(a) == sortedRows(b) && a.count() > 0,
      "reloaded artifacts serve differently from the in-memory pair")
  }

  test("crash between the publish renames self-heals on the next retrain; orphaned swap dirs are swept") {
    val tmp = java.nio.file.Files.createTempDirectory("ann_heal").toString
    val inv = s"$tmp/inv"
    val ivf = SimilarityFunctions.ivfTrain(vecs(0, 400), "embedding", cells = 8)
    SimilarityFunctions.ivfAppendBatch(ivf, inv, vecs(0, 400),
      "vec_id", "embedding", 0L)
    val fs = new org.apache.hadoop.fs.Path(inv)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // crash state: live index stranded at .retired-<uuid>, a complete
    // staging dir beside it, nothing at invPath (the operator has removed
    // the stale lock per refuseIfSwapLocked's instructions)
    assert(fs.rename(new org.apache.hadoop.fs.Path(inv),
      new org.apache.hadoop.fs.Path(s"$inv.retired-deadbeef")))
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$inv.retrain-deadbeef/batch=0"))
    // with the stale lock still present, recovery is refused with the
    // actionable message
    val lockP = new org.apache.hadoop.fs.Path(
      SimilarityFunctions.ivfSwapLockPath(inv))
    fs.create(lockP, false).close()
    val locked = intercept[IllegalStateException] {
      SimilarityFunctions.ivfRetrain(spark, inv, cells = 8)
    }
    assert(locked.getMessage.contains("lock"))
    fs.delete(lockP, false)
    val next = SimilarityFunctions.ivfRetrain(spark, inv, cells = 8)
    val pub = spark.read.parquet(inv)
    assert(pub.count() == 400, "self-heal lost rows")
    assert(sortedRows(pub.select(col("neighbor_id"), col("_cell"), col("_cv")))
      == sortedRows(next.assign(vecs(0, 400), "vec_id", "embedding")
        .select(col("neighbor_id"), col("_cell"), col("_cv"))))
    val leftovers = fs.listStatus(new org.apache.hadoop.fs.Path(tmp))
      .map(_.getPath.getName).filterNot(_ == "inv")
    assert(leftovers.isEmpty, s"orphans not swept: ${leftovers.mkString(",")}")
  }

  test("a crashed swap's STALE lock is swept unattended; a live-heartbeat lock still refuses; staleLockMs=0 disables auto-heal") {
    val tmp = java.nio.file.Files.createTempDirectory("ann_stale").toString
    val inv = s"$tmp/inv"
    val ivf = SimilarityFunctions.ivfTrain(vecs(0, 400), "embedding", cells = 8)
    SimilarityFunctions.ivfAppendBatch(ivf, inv, vecs(0, 400),
      "vec_id", "embedding", 0L)
    val fs = new org.apache.hadoop.fs.Path(inv)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val lockP = new org.apache.hadoop.fs.Path(
      SimilarityFunctions.ivfSwapLockPath(inv))
    // crash state: the lock survives with the crashed swap's uuid + ts
    // content and a staging orphan beside it; the heartbeat thread died
    // with the JVM, so the lock mtime stops moving
    def plantCrashedLock(): Unit = {
      val out = fs.create(lockP, false)
      out.write("""{"uuid":"deadbeef","ts":0}""".getBytes("UTF-8"))
      out.close()
      fs.mkdirs(new org.apache.hadoop.fs.Path(s"$inv.retrain-deadbeef/batch=0"))
      val past = System.currentTimeMillis() - 60 * 60 * 1000L // 1h silent
      fs.setTimes(lockP, past, past)
    }
    plantCrashedLock()
    // default staleLockMs (30 min) < 1h silence: swept unattended, the
    // retrain completes, the orphaned staging dir is swept with it
    val next = SimilarityFunctions.ivfRetrain(spark, inv, cells = 8)
    assert(spark.read.parquet(inv).count() == 400)
    assert(sortedRows(spark.read.parquet(inv)
        .select(col("neighbor_id"), col("_cell"), col("_cv")))
      == sortedRows(next.assign(vecs(0, 400), "vec_id", "embedding")
        .select(col("neighbor_id"), col("_cell"), col("_cv"))))
    val leftovers = fs.listStatus(new org.apache.hadoop.fs.Path(tmp))
      .map(_.getPath.getName).filterNot(_ == "inv")
    assert(leftovers.isEmpty, s"stale-lock heal left residue: ${leftovers.mkString(",")}")
    // a FRESH lock (heartbeat younger than staleLockMs) still refuses —
    // concurrent exclusion is intact
    fs.create(lockP, false).close()
    val fresh = intercept[IllegalStateException] {
      SimilarityFunctions.ivfRetrain(spark, inv, cells = 8)
    }
    assert(fresh.getMessage.contains("live heartbeat"),
      s"fresh-lock refusal lost its message: ${fresh.getMessage}")
    fs.delete(lockP, false)
    // staleLockMs = 0: auto-heal disabled, even an ancient lock refuses
    plantCrashedLock()
    val disabled = intercept[IllegalStateException] {
      SimilarityFunctions.ivfRetrain(spark, inv, cells = 8, staleLockMs = 0L)
    }
    assert(disabled.getMessage.contains("lock"))
    assert(fs.exists(lockP), "staleLockMs=0 must not sweep the lock")
  }

  test("orphan sweep refuses when an append recreated the live dir over a crashed swap (the .retired index must not be deleted)") {
    val tmp = java.nio.file.Files.createTempDirectory("ann_guard").toString
    val inv = s"$tmp/inv"
    val ivf = SimilarityFunctions.ivfTrain(vecs(0, 400), "embedding", cells = 8)
    SimilarityFunctions.ivfAppendBatch(ivf, inv, vecs(0, 400),
      "vec_id", "embedding", 0L)
    val fs = new org.apache.hadoop.fs.Path(inv)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // crash between the publish renames: the whole index is stranded at
    // .retired-<uuid>; the operator removed the stale lock, and an append
    // ran BEFORE the next retrain — recreating invPath from scratch (a
    // fresh dir has no co-located quantizer, so the staleness checks are
    // skipped; the append even bootstraps a _graft_epoch)
    assert(fs.rename(new org.apache.hadoop.fs.Path(inv),
      new org.apache.hadoop.fs.Path(s"$inv.retired-cafef00d")))
    SimilarityFunctions.ivfAppendBatch(ivf, inv, vecs(400, 450),
      "vec_id", "embedding", 1L)
    // the retrain must fail LOUDLY with reconcile instructions — sweeping
    // would silently destroy the 400-row pre-crash index
    val err = intercept[IllegalStateException] {
      SimilarityFunctions.ivfRetrain(spark, inv, cells = 8)
    }
    assert(err.getMessage.contains("Reconcile") ||
      err.getMessage.contains("pre-crash"), s"not actionable: ${err.getMessage}")
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$inv.retired-cafef00d")),
      "guard deleted the pre-crash index anyway")
    // the instructed reconcile: move the new increments into the retired
    // index, restore it, retrain — nothing lost
    assert(fs.rename(new org.apache.hadoop.fs.Path(s"$inv/batch=1"),
      new org.apache.hadoop.fs.Path(s"$inv.retired-cafef00d/batch=1")))
    fs.delete(new org.apache.hadoop.fs.Path(inv), true)
    assert(fs.rename(new org.apache.hadoop.fs.Path(s"$inv.retired-cafef00d"),
      new org.apache.hadoop.fs.Path(inv)))
    val next = SimilarityFunctions.ivfRetrain(spark, inv, cells = 8)
    assert(spark.read.parquet(inv).count() == 450, "reconcile lost rows")
    assert(sortedRows(spark.read.parquet(inv)
        .select(col("neighbor_id"), col("_cell"), col("_cv")))
      == sortedRows(next.assign(vecs(0, 450), "vec_id", "embedding")
        .select(col("neighbor_id"), col("_cell"), col("_cv"))))
    // and with a PUBLISHED live index (post-swap: co-located quantizer),
    // a leftover .retired-* orphan IS swept — the guard only blocks the
    // ambiguous case
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$inv.retired-99999999/batch=0"))
    SimilarityFunctions.ivfRetrain(spark, inv, cells = 8)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$inv.retired-99999999")),
      "published-index orphan sweep regressed")
  }

  test("a batch dir landing between the B0 listing and the union read is rebuilt AND forwarded — landed, not dropped") {
    // the r13 ordering (read, then B0) had a silent-drop window: a dir
    // landing between the read's eager listing and the B0 snapshot was
    // in B0 but absent from the union — not rebuilt, not penned, deleted
    // with the retired dir. B0 is now a committed-FILE signature
    // snapshot taken BEFORE the read: a dir whose signature at pen time
    // is not exactly B0's is forwarded (re-derived from its final
    // content, overwriting its own batch=N partition — idempotent), so
    // over-forwarding a dir the read did carry is safe.
    val tmp = java.nio.file.Files.createTempDirectory("ann_b0").toString
    val inv = s"$tmp/inv"
    val v1 = SimilarityFunctions.ivfTrain(vecs(0, 400), "embedding", cells = 8)
    SimilarityFunctions.ivfAppendBatch(v1, inv, vecs(0, 400),
      "vec_id", "embedding", 0L)
    // batch=3 lands before the retrain starts — it is in BOTH B0 and the
    // union read (the B0-first ordering guarantees read ⊇ B0, so the only
    // race residue is read-minus-B0, which is both rebuilt and forwarded)
    SimilarityFunctions.ivfAppendBatch(v1, inv, vecs(400, 460),
      "vec_id", "embedding", 3L)
    val next = SimilarityFunctions.retrainWithHooked(spark, inv,
      df => SimilarityFunctions.ivfTrain(df, "_cv", cells = 8, seed = 7L),
      (u, n) => u.withColumn("_cell",
        element_at(graft.functions.expressions.IvfExpressions.ivf_rank_cells(
          col("_cv"), n.clusterCenters, 1), 1)),
      // a dir landing AFTER both listings (read-minus-B0 at the next
      // boundary): penned from the retired copy, re-derived, forwarded
      testBeforeRetire = () =>
        v1.assign(vecs(460, 500), "vec_id", "embedding")
          .write.parquet(s"$inv/batch=4"))
    val pub = spark.read.parquet(inv)
    assert(pub.count() == 500, s"rows lost across the B0 boundary: ${pub.count()}")
    assert(sortedRows(pub.select(col("neighbor_id"), col("_cell"), col("_cv")))
      == sortedRows(next.assign(vecs(0, 500), "vec_id", "embedding")
        .select(col("neighbor_id"), col("_cell"), col("_cv"))))
  }

  test("a batch dir REWRITTEN mid-swap (replay delete+rewrite) is forwarded with its final content — file-signature pen, not name membership") {
    // the swaprace stress section caught the file-level hole a dir-name
    // B0 leaves open: a dir can be "in B0" while its part files commit
    // (or are deleted + rewritten by an at-least-once replay) after the
    // union read's listing — zero/stale rows in the rebuild, pen skipped,
    // content deleted with the retired dir, and the appender's epoch
    // check passes because the publish comes later. The signature pen
    // forwards ANY dir whose committed files changed since B0.
    val tmp = java.nio.file.Files.createTempDirectory("ann_sig").toString
    val inv = s"$tmp/inv"
    val v1 = SimilarityFunctions.ivfTrain(vecs(0, 400), "embedding", cells = 8)
    SimilarityFunctions.ivfAppendBatch(v1, inv, vecs(0, 400),
      "vec_id", "embedding", 0L)
    SimilarityFunctions.ivfAppendBatch(v1, inv, vecs(400, 450),
      "vec_id", "embedding", 1L)
    val fs = new org.apache.hadoop.fs.Path(inv)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val next = SimilarityFunctions.retrainWithHooked(spark, inv,
      df => SimilarityFunctions.ivfTrain(df, "_cv", cells = 8, seed = 7L),
      (u, n) => u.withColumn("_cell",
        element_at(graft.functions.expressions.IvfExpressions.ivf_rank_cells(
          col("_cv"), n.clusterCenters, 1), 1)),
      testBeforeRetire = () => {
        // the replay: batch=1's first attempt had already committed
        // before the swap began (it IS in B0 and in the union read);
        // mid-swap the appender replays it with DIFFERENT rows
        fs.delete(new org.apache.hadoop.fs.Path(s"$inv/batch=1"), true)
        v1.assign(vecs(400, 480), "vec_id", "embedding")
          .write.parquet(s"$inv/batch=1")
      })
    val pub = spark.read.parquet(inv)
    // the REWRITTEN content (80 rows) must win — the rebuild's stale
    // 50-row copy of batch=1 is overwritten by the forward
    assert(pub.count() == 480,
      s"rewritten batch content lost or duplicated: ${pub.count()}")
    assert(sortedRows(pub.select(col("neighbor_id"), col("_cell"), col("_cv")))
      == sortedRows(next.assign(vecs(0, 480), "vec_id", "embedding")
        .select(col("neighbor_id"), col("_cell"), col("_cv"))),
      "forwarded rewrite diverges from a rebuild under the new quantizer")
    val leftovers = fs.listStatus(new org.apache.hadoop.fs.Path(tmp))
      .map(_.getPath.getName).filterNot(_ == "inv")
    assert(leftovers.isEmpty, s"swap left residue: ${leftovers.mkString(",")}")
  }

  test("compacting away the whole corpus leaves a readable, append-able empty index") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("ann_empty").toString
    val inv = s"$tmp/inv"
    val ivf = SimilarityFunctions.ivfTrain(vecs(0, 300), "embedding", cells = 8)
    SimilarityFunctions.ivfAppendBatch(ivf, inv, vecs(0, 300),
      "vec_id", "embedding", 0L)
    SimilarityFunctions.ivfCompact(spark, inv, ivf,
      spark.range(0, 300).select($"id".as("doc_id")), "doc_id")
    // the swapped dir must stay schema-readable (an empty multi-partition
    // write emits no part files and would fail schema inference)
    val emptied = spark.read.parquet(inv)
    assert(emptied.count() == 0)
    assert(emptied.columns.contains("neighbor_id") &&
      emptied.columns.contains("_cell"))
    // and the next crawl appends into the same layout
    SimilarityFunctions.ivfAppendBatch(ivf, inv, vecs(300, 350),
      "vec_id", "embedding", 1L)
    assert(spark.read.parquet(inv).count() == 50)
  }

  test("IVF-PQ: appended codes serve identically to a rebuilt inverted file") {
    val tmp = java.nio.file.Files.createTempDirectory("ann_incr_pq").toString
    val base = vecs(0, 500)
    val ivf = SimilarityFunctions.ivfTrain(base, "embedding", cells = 8)
    val pq = SimilarityFunctions.pqTrain(base, "embedding", m = 4, codes = 8)
    // persist BOTH artifacts and serve from the loaded copies
    ivf.save(s"$tmp/q")
    pq.save(s"$tmp/pq.json", spark.sparkContext.hadoopConfiguration)
    val lIvf = SimilarityFunctions.ivfLoad(s"$tmp/q")
    val lPq = SimilarityFunctions.pqLoad(s"$tmp/pq.json",
      spark.sparkContext.hadoopConfiguration)
    lIvf.assign(base, "vec_id", "embedding")
      .join(lPq.encode(base, "vec_id", "embedding"), Seq("neighbor_id"))
      .write.mode("overwrite").parquet(s"$tmp/inv")
    SimilarityFunctions.ivfAppend(lIvf, s"$tmp/inv", vecs(500, 800),
      "vec_id", "embedding", pq = Some(lPq))
    val full = vecs(0, 800)
    val rebuiltInv = lIvf.assign(full, "vec_id", "embedding")
      .join(lPq.encode(full, "vec_id", "embedding"), Seq("neighbor_id"))
    val probes = full.filter(col("vec_id") % 83 === 0)
    val a = SimilarityFunctions.ivfPqSearch(spark.read.parquet(s"$tmp/inv"),
      probes, lIvf, lPq, "vec_id", "embedding", 5, nProbe = 3)
    val b = SimilarityFunctions.ivfPqSearch(rebuiltInv,
      probes, lIvf, lPq, "vec_id", "embedding", 5, nProbe = 3)
    assert(sortedRows(a) == sortedRows(b),
      "incremental IVF-PQ search diverged from rebuild")
    assert(a.count() > 0)
  }
}
