package graft

import graft.functions.{Pca, SimilarityFunctions}
import graft.operators.{Bpe, NaiveBayes, Sampling}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Degenerate-cardinality contracts (hostile drill wave 7): every
  * trainer/mixer/certified query must treat an EMPTY or single-row
  * corpus as a legitimate state — a fresh project, a first test event —
  * and produce the oracle's answer (usually zero rows), never throw.
  * The full-surface proof is the drill (`tools/degenerate_tables.py` →
  * Verify → oracle_check, 102/102 on both modes); these pin the
  * operator-level semantics the drill flushed out.
  */
class DegenerateInputSpec extends SparkSpec {
  import spark.implicits._

  private def emptyDocs: DataFrame =
    Seq.empty[(Long, String, String, String)]
      .toDF("doc_id", "text", "lang", "source")

  private def emptyVecs: DataFrame =
    Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")

  private def oneVec: DataFrame =
    Seq((0L, Array(1.0f, 0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")

  test("ivfTrain on an empty corpus yields a servable index") {
    val idx = SimilarityFunctions.ivfTrain(emptyVecs, "embedding", cells = 8)
    assert(idx.assign(emptyVecs, "vec_id", "embedding").count() === 0)
    assert(SimilarityFunctions.ivfSearch(
      idx.assign(emptyVecs, "vec_id", "embedding"), emptyVecs, idx,
      "vec_id", "embedding", k = 5).count() === 0)
  }

  test("ivfTrain on a single vector trains and assigns it") {
    val idx = SimilarityFunctions.ivfTrain(oneVec, "embedding", cells = 8)
    val assigned = idx.assign(oneVec, "vec_id", "embedding")
    assert(assigned.count() === 1)
    // self is excluded, so the search over the 1-vector corpus is empty
    assert(SimilarityFunctions.ivfSearch(assigned, oneVec, idx,
      "vec_id", "embedding", k = 5).count() === 0)
  }

  test("pqTrain handles empty and smaller-than-codebook corpora") {
    val idxE = SimilarityFunctions.pqTrain(emptyVecs, "embedding", m = 2)
    assert(SimilarityFunctions.pqSearch(
      idxE.encode(emptyVecs, "vec_id", "embedding"), emptyVecs, idxE,
      "vec_id", "embedding", k = 5).count() === 0)
    // 1 point < 16 codes: the codebook shrinks instead of the fit crashing
    val idx1 = SimilarityFunctions.pqTrain(oneVec, "embedding", m = 2)
    assert(idx1.encode(oneVec, "vec_id", "embedding").count() === 1)
  }

  test("pcaTrain on an empty corpus yields a servable placeholder model") {
    val m = Pca.pcaTrain(emptyVecs, "embedding", k = 2)
    assert(m.k === 2)
    assert(emptyVecs.select(m.project($"embedding")).count() === 0)
  }

  test("pcaTrain on a single vector (zero covariance) trains") {
    val m = Pca.pcaTrain(oneVec, "embedding", k = 2)
    assert(m.dim === 4 && m.k === 2)
    assert(oneVec.select(m.project($"embedding")).count() === 1)
  }

  test("pcaTrain converges on a mass-duplicated (rank-deficient) corpus") {
    // 10 distinct 64-dim vectors repeated 50x: covariance rank <= 9 with
    // a high-multiplicity zero eigenvalue — the spectrum commons-math's
    // QL iteration failed on (drill wave 8); the cyclic Jacobi path must
    // converge, stay deterministic, and keep components orthonormal
    val canon = Array.tabulate(10, 64)((i, j) =>
      math.sin(i * 17 + j).toFloat)
    val dup = Seq.tabulate(500)(i => (i.toLong, canon(i % 10)))
      .toDF("vec_id", "embedding")
    val m1 = Pca.pcaTrain(dup, "embedding", k = 24)
    val m2 = Pca.pcaTrain(dup.repartition(7), "embedding", k = 24)
    assert(m1.components.map(_.toSeq).toSeq === m2.components.map(_.toSeq).toSeq)
    for (a <- 0 until 3; b <- 0 until 3) {
      val dot = m1.components(a).zip(m1.components(b)).map { case (x, y) => x * y }.sum
      assert(math.abs(dot - (if (a == b) 1.0 else 0.0)) < 1e-9, s"<$a,$b> = $dot")
    }
    // all real variance lives in the rank-9 span, so 24 kept components
    // explain everything
    assert(m1.explainedBp === 10000L)
  }

  test("NaiveBayes with an empty training set predicts nothing, quietly") {
    val out = NaiveBayes.classify(
      docs = Seq((1L, "some text")).toDF("doc_id", "text"),
      train = emptyDocs, "doc_id", "lang", "text")
    assert(out.columns.toSeq === Seq("doc_id", "pred", "score_unats"))
    assert(out.count() === 0)
  }

  test("sqrtMixtureSample of zero sources is the empty corpus") {
    val out = Sampling.sqrtMixtureSample(emptyDocs, "doc_id", "source",
      budgetDocs = 100L)
    assert(out.columns.toSeq === emptyDocs.columns.toSeq)
    assert(out.count() === 0)
    // all-null sources count as zero sources too
    val nullSrc = Seq((1L, "t", "en", null: String))
      .toDF("doc_id", "text", "lang", "source")
    assert(Sampling.sqrtMixtureSample(nullSrc, "doc_id", "source",
      budgetDocs = 100L).count() === 0)
  }

  test("redact is linear on a giant address-less token (bounded PII regex)") {
    // 200 KB of one token: the unbounded email pattern's `[…]+@` was
    // O(len^2) here (wave 9 measured it in the hours); the RFC-bounded
    // pattern does constant work per start position. A real address at
    // the end must still redact.
    val giant = "x" * 200_000 + " mail a@b.co now"
    val out = Seq((1L, giant)).toDF("doc_id", "text")
      .select(graft.functions.TextFunctions.redact($"text").as("r"))
      .head().getString(0)
    assert(out.endsWith(" mail <EMAIL> now"))
    assert(out.startsWith("xxxx"))
  }

  test("Bpe.train on an empty corpus returns no merges") {
    assert(Bpe.train(emptyDocs, "text", numMerges = 8).isEmpty)
    // and on a corpus whose only pair occurs once (under minPairCount=2)
    val once = Seq((1L, "ab")).toDF("doc_id", "text")
    assert(Bpe.train(once, "text", numMerges = 8).isEmpty)
  }
}
