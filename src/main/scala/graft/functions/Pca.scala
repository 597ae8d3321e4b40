package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PCA dimensionality reduction for embedding columns — the third leg of
  * the embedding storage/serving toolkit next to int8 quantization and PQ
  * ([[SimilarityFunctions]]): project 64-dim vectors to the k directions
  * that carry the variance, shrinking ANN scan bandwidth and improving
  * cell/bucket balance (the OPQ-style rotation step of a production
  * vector pipeline, without the per-subspace permutation).
  *
  * Lifecycle mirrors `pqTrain`: fit on a BOUNDED seeded sample collected
  * to the driver (covariance + eigendecomposition of a dim×dim matrix —
  * milliseconds for any realistic embedding width), then project the full
  * corpus in one codegen'd pass with the model shipped inside the plan
  * ([[expressions.PcaExpressions]]). Nothing driver-side scales with the
  * corpus.
  *
  * Determinism: the collected sample is sorted lexicographically before
  * accumulation (float sums are order-sensitive — the same discipline as
  * the micro-unit-quantized centroids), and each eigenvector's sign is
  * canonicalized (largest-|x| component made positive), so the model is a
  * pure function of the sample SET — independent of partitioning.
  */
object Pca {

  final class PcaModel private[functions] (val mean: Array[Double],
                                           val components: Array[Array[Double]],
                                           val explainedBp: Long) {
    def dim: Int = mean.length
    def k: Int = components.length

    /** Project an `array<float|double>` column to the k components. */
    def project(vec: Column): Column =
      expressions.PcaExpressions.pca_project(vec.cast("array<double>"),
        mean, components)

    def toJson: String = {
      val comps = components.map(_.mkString("[", ",", "]"))
        .mkString("[", ",", "]")
      s"""{"mean":${mean.mkString("[", ",", "]")},"explainedBp":$explainedBp,"components":$comps}"""
    }

    /** Persist to any Hadoop scheme — same shape as `PqIndex.save`. */
    def save(path: String, conf: org.apache.hadoop.conf.Configuration): Unit = {
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(conf)
      val out = fs.create(p, true)
      try out.write(toJson.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
    }
  }

  /** Load a model persisted by [[PcaModel.save]]. */
  def pcaLoad(path: String,
              conf: org.apache.hadoop.conf.Configuration): PcaModel = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val in = fs.open(p)
    val body =
      try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
      finally in.close()
    import graft.ingest.JVal._
    def doubles(v: JVal): Array[Double] = v match {
      case JArr(xs) => xs.map {
        case n: JNum => n.text.toDouble
        case other   => sys.error(s"pcaLoad: expected number, got $other")
      }.toArray
      case other => sys.error(s"pcaLoad: expected array, got $other")
    }
    graft.ingest.JsonEventParser.mapperRead(body) match {
      case o: JObj =>
        (o.toMap.get("mean"), o.toMap.get("explainedBp"),
         o.toMap.get("components")) match {
          case (Some(m), Some(e: JNum), Some(JArr(cs))) =>
            new PcaModel(doubles(m), cs.map(doubles).toArray,
              e.text.toDouble.toLong)
          case _ => sys.error(s"pcaLoad: malformed model JSON at $path")
        }
      case _ => sys.error(s"pcaLoad: malformed model JSON at $path")
    }
  }

  /** Fit a k-component model on a bounded seeded sample of `vecCol`. */
  def pcaTrain(corpus: DataFrame, vecCol: String, k: Int,
               seed: Long = 42L, maxTrainRows: Long = 100000L): PcaModel = {
    val all = corpus
      .where(graft.functions.SimilarityFunctions.finiteVec(vecCol))
      .select(col(vecCol).cast("array<double>").as("_v"))
    val n = all.count()
    val train = if (n <= maxTrainRows) all
                else all.sample(withReplacement = false, maxTrainRows.toDouble / n, seed)
    // bounded collect; sorted so float accumulation order is partition-free
    val sample = train.collect().map(_.getSeq[Double](0).toArray)
      .sortWith { (a, b) =>
        var i = 0
        while (i < a.length && a(i) == b(i)) i += 1
        i < a.length && a(i) < b(i)
      }
    if (sample.isEmpty) {
      // empty (or all-unusable) corpus: a placeholder identity model of
      // dimension k — nothing will ever be projected through it, and the
      // caller's shortlist/re-rank over the empty corpus stays empty
      return new PcaModel(new Array[Double](k),
        Array.tabulate(k, k)((i, j) => if (i == j) 1.0 else 0.0),
        explainedBp = 0L)
    }
    val dim = sample(0).length
    require(k >= 1 && k <= dim, s"k=$k not in 1..$dim")
    val m = sample.length
    val mean = new Array[Double](dim)
    sample.foreach { v =>
      var i = 0
      while (i < dim) { mean(i) += v(i); i += 1 }
    }
    var i = 0
    while (i < dim) { mean(i) /= m; i += 1 }
    val cov = Array.ofDim[Double](dim, dim)
    sample.foreach { v =>
      var a = 0
      while (a < dim) {
        val da = v(a) - mean(a)
        var b = a
        while (b < dim) { cov(a)(b) += da * (v(b) - mean(b)); b += 1 }
        a += 1
      }
    }
    i = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        cov(i)(j) /= m
        cov(j)(i) = cov(i)(j)
        j += 1
      }
      i += 1
    }
    val eig = new org.apache.commons.math3.linear.EigenDecomposition(
      new org.apache.commons.math3.linear.Array2DRowRealMatrix(cov, false))
    val order = eig.getRealEigenvalues.zipWithIndex.sortBy(-_._1)
    val totalVar = eig.getRealEigenvalues.map(math.max(_, 0.0)).sum
    val keptVar = order.take(k).map(p => math.max(p._1, 0.0)).sum
    val comps = order.take(k).map { case (_, idx) =>
      val v = eig.getEigenvector(idx).toArray
      // sign canonicalization: largest-|x| component positive (first wins)
      var best = 0
      var bi = 0
      while (bi < v.length) {
        if (math.abs(v(bi)) > math.abs(v(best))) best = bi
        bi += 1
      }
      if (v(best) < 0) v.map(-_) else v
    }
    val explained =
      if (totalVar == 0.0) 10000L
      else math.floor(keptVar / totalVar * 10000 + 0.5).toLong
    new PcaModel(mean, comps, explained)
  }

  /** One-shot convenience: train on the corpus, return it projected —
    * `vecCol` replaced by the k-dim projection, other columns untouched.
    */
  def pcaProject(corpus: DataFrame, vecCol: String, k: Int,
                 seed: Long = 42L): (PcaModel, DataFrame) = {
    val model = pcaTrain(corpus, vecCol, k, seed)
    val cols = corpus.columns.map {
      case c if c == vecCol => model.project(col(vecCol)).as(vecCol)
      case c                => col(c)
    }
    (model, corpus.select(cols.toSeq: _*))
  }
}
