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

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix. Rotations
    * zero each off-diagonal pair in a FIXED (p,q) sweep order until the
    * off-diagonal mass vanishes, so the result is fully deterministic —
    * and, unlike tridiagonal-QL implementations, Jacobi is
    * unconditionally convergent on symmetric input. That matters here:
    * the covariance of a mass-duplicated corpus (few distinct vectors,
    * the crawl-dedup input shape) has a high-multiplicity spectrum on
    * which commons-math's EigenDecomposition throws "convergence
    * failed". dim is bounded by the embedding width, so the O(dim³)
    * sweeps are driver-trivial.
    *
    * Returns (eigenvalues, eigenvector matrix V with eigenvectors as
    * COLUMNS — column i pairs with eigenvalue i).
    */
  private def jacobiEigen(src: Array[Array[Double]])
      : (Array[Double], Array[Array[Double]]) = {
    val n = src.length
    val a = src.map(_.clone())
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    val scale = {
      var t = 0.0; var i = 0
      while (i < n) { t += math.abs(a(i)(i)); i += 1 }
      math.max(t, 1.0)
    }
    val tol = scale * 1e-14
    def offNorm(): Double = {
      var s = 0.0; var i = 0
      while (i < n) {
        var j = i + 1
        while (j < n) { s += a(i)(j) * a(i)(j); j += 1 }
        i += 1
      }
      math.sqrt(s)
    }
    var sweep = 0
    while (sweep < 100 && offNorm() > tol) {
      var p = 0
      while (p < n - 1) {
        var q = p + 1
        while (q < n) {
          val apq = a(p)(q)
          if (math.abs(apq) > tol / n) {
            val tau = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t = math.signum(tau) match {
              case 0.0 => 1.0 / (tau + math.sqrt(1.0 + tau * tau))
              case sgn => sgn / (math.abs(tau) + math.sqrt(1.0 + tau * tau))
            }
            val c = 1.0 / math.sqrt(1.0 + t * t)
            val s = t * c
            var r = 0
            while (r < n) { // rotate rows/cols p,q of a
              val arp = a(r)(p); val arq = a(r)(q)
              a(r)(p) = c * arp - s * arq
              a(r)(q) = s * arp + c * arq
              r += 1
            }
            r = 0
            while (r < n) {
              val apr = a(p)(r); val aqr = a(q)(r)
              a(p)(r) = c * apr - s * aqr
              a(q)(r) = s * apr + c * aqr
              r += 1
            }
            r = 0
            while (r < n) { // accumulate the rotation into V
              val vrp = v(r)(p); val vrq = v(r)(q)
              v(r)(p) = c * vrp - s * vrq
              v(r)(q) = s * vrp + c * vrq
              r += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    (Array.tabulate(n)(i => a(i)(i)), v)
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
    val (eigVals, eigVecs) = jacobiEigen(cov)
    val order = eigVals.zipWithIndex.sortBy(-_._1)
    val totalVar = eigVals.map(math.max(_, 0.0)).sum
    val keptVar = order.take(k).map(p => math.max(p._1, 0.0)).sum
    val comps = order.take(k).map { case (_, idx) =>
      val v = Array.tabulate(dim)(r => eigVecs(r)(idx))
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
