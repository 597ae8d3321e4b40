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
