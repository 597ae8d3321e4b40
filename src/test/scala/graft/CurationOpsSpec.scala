package graft

import graft.functions.DedupFunctions
import graft.operators.{Dsir, HeuristicFilters, Sampling}
import org.apache.spark.sql.functions._

/** Round-7 curation operators: C4 structural filters, incremental
  * cross-corpus dedup, sequence packing, DSIR importance scoring.
  */
class CurationOpsSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------------ C4 filters

  private val c4Docs = Seq(
    // 4 good sentences (>=5 words, terminal punct) -> kept
    (1L, "This is a perfectly fine sentence.\nHere is another good long sentence!\nA third sentence keeps the page alive?\nAnd \"a quoted closer works too.\""),
    // good lines but page contains lorem ipsum -> dropped
    (2L, "This is a perfectly fine sentence.\nHere is another good long sentence!\nA third sentence keeps the page alive today.\nlorem ipsum dolor sit amet."),
    // good lines but a curly brace leaks code -> dropped
    (3L, "This is a perfectly fine sentence.\nHere is another good long sentence!\nfunction f() { return 1; }\nA third sentence keeps the page alive."),
    // only 2 surviving lines -> dropped (min 3)
    (4L, "This is a perfectly fine sentence.\nHere is another good long sentence!\nno punct\nshort."),
    // javascript banner line must not survive
    (5L, "Please enable JavaScript to view this site.\nThis is a perfectly fine sentence.\nHere is another good long sentence!\nA third sentence keeps the page alive.")
  ).toDF("doc_id", "text")

  test("c4: line rules — terminal punct, min words, javascript ban") {
    val a = HeuristicFilters.annotate(c4Docs, "doc_id", "text")
      .select($"doc_id", $"n_lines", $"n_kept_lines", $"kept", $"clean_text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3), r.getString(4)))).toMap
    assert(a(1L) === ((4L, 4L, true,
      "This is a perfectly fine sentence.\nHere is another good long sentence!\nA third sentence keeps the page alive?\nAnd \"a quoted closer works too.\"")))
    // doc 4: "no punct" fails the punct rule, "short." fails min words
    assert(a(4L)._2 === 2L && !a(4L)._3)
    // doc 5: the javascript banner line is scrubbed, 3 good lines remain
    assert(a(5L)._2 === 3L && a(5L)._3)
    assert(!a(5L)._4.toLowerCase.contains("javascript"))
  }

  test("c4: page rules — lorem ipsum and brace kill kept pages") {
    val a = HeuristicFilters.annotate(c4Docs, "doc_id", "text")
    val kept = a.where($"kept").select($"doc_id").as[Long].collect().toSet
    assert(kept === Set(1L, 5L))
    val flags = a.select($"doc_id", $"has_lorem", $"has_brace")
      .collect().map(r => r.getLong(0) -> ((r.getBoolean(1), r.getBoolean(2)))).toMap
    assert(flags(2L) === ((true, false)) && flags(3L) === ((false, true)))
  }

  test("c4: clean replaces text with the scrubbed lines, survivors only") {
    val cleaned = HeuristicFilters.clean(c4Docs, "doc_id", "text")
    assert(cleaned.columns.toSeq === Seq("doc_id", "text"))
    assert(cleaned.count() === 2)
    val t5 = cleaned.where($"doc_id" === 5L).select($"text").as[String].head()
    assert(t5.linesIterator.size === 3)
  }

  test("c4 + paragraph dedup: null text reads as empty, docs never vanish") {
    val docs = Seq((1L, null.asInstanceOf[String]), (2L, "real line here okay."))
      .toDF("doc_id", "text")
    val c4 = HeuristicFilters.annotate(docs, "doc_id", "text")
    assert(c4.count() === 2)
    val r1 = c4.where($"doc_id" === 1L)
      .select($"n_lines", $"n_kept_lines", $"kept", $"clean_text").head()
    assert(r1.getLong(0) === 0L && r1.getLong(1) === 0L &&
      !r1.getBoolean(2) && r1.getString(3) === "")
    val para = DedupFunctions.dedupParagraphs(docs, "doc_id", "text")
    assert(para.count() === 2)
    val p1 = para.where($"doc_id" === 1L)
      .select($"n_lines", $"n_kept_lines", $"clean_text").head()
    assert(p1.getLong(0) === 0L && p1.getLong(1) === 0L && p1.getString(2) === "")
  }

  // ------------------------------------------------- incremental dedup

  test("incremental dedup: corpus hits drop, batch dedups within itself") {
    val corpus = Seq((1L, "alpha beta gamma"), (2L, "delta epsilon"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (10L, "ALPHA   beta gamma"), // dup of corpus 1 (normalized) -> dropped
      (11L, "zeta eta"),           // fresh, duplicated in-batch -> min id kept
      (12L, "zeta   ETA"),
      (13L, "unique content here") // fresh singleton
    ).toDF("doc_id", "text")
    val kept = DedupFunctions.incrementalDedup(batch, corpus, "doc_id", "text")
    assert(kept.columns.toSeq === Seq("doc_id", "text"))
    assert(kept.select($"doc_id").as[Long].collect().sorted.toSeq === Seq(11L, 13L))
  }

  test("incremental dedup: empty corpus degrades to plain exact dedup") {
    val corpus = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val batch = Seq((1L, "a b"), (2L, "A  b"), (3L, "c")).toDF("doc_id", "text")
    val kept = DedupFunctions.incrementalDedup(batch, corpus, "doc_id", "text")
    assert(kept.select($"doc_id").as[Long].collect().sorted.toSeq === Seq(1L, 3L))
  }

  test("incremental dedup bloom: exact parity with the plain path, both gates") {
    // real corpus split: src0 = corpus, rest = batch — planted dups ride
    // along in the driver testdata (same split the oracle query uses)
    val d = sf("documents")
    val corpus = d.where($"source" === "src0")
    val batch = d.where($"source" =!= "src0")
    val plain = DedupFunctions.incrementalDedup(batch, corpus, "doc_id", "text")
      .select($"doc_id").as[Long].collect().sorted.toSeq
    val bloom = DedupFunctions.incrementalDedupBloom(batch, corpus,
        "doc_id", "text", expectedDistinct = 4096)
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(bloom === plain)
    // degenerate gate: broadcastMaxSuspicious = 0 forces the fallback
    // shuffle anti-join — still identical
    val fallback = DedupFunctions.incrementalDedupBloom(batch, corpus,
        "doc_id", "text", expectedDistinct = 4096,
        broadcastMaxSuspicious = 0L)
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(fallback === plain)
    // a deliberately tiny/overloaded filter (fpp driven way up) still
    // returns exact results — false positives only cost verification work
    val overloaded = DedupFunctions.incrementalDedupBloom(batch, corpus,
        "doc_id", "text", expectedDistinct = 2, fpp = 0.5)
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(overloaded === plain)
    // planted corpus dup + in-batch dup: the bloom path must drop both
    val corpus2 = Seq((1L, "alpha beta gamma")).toDF("doc_id", "text")
    val batch2 = Seq(
      (10L, "ALPHA   beta gamma"), (11L, "zeta eta"),
      (12L, "zeta   ETA"), (13L, "unique content here"))
      .toDF("doc_id", "text")
    val kept2 = DedupFunctions.incrementalDedupBloom(batch2, corpus2,
        "doc_id", "text", expectedDistinct = 64)
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(kept2 === Seq(11L, 13L))
  }

  test("incremental dedup bloom: null text agrees with the plain path") {
    // null fingerprints never match an equi-join key: the plain path keeps
    // the min-id null-fp batch row (anti-join passes nulls through, the
    // winner agg groups them), and a null corpus text must not NPE the
    // sketch build. The bloom path must do exactly the same.
    val corpus = Seq((1L, "alpha beta gamma"), (2L, null: String))
      .toDF("doc_id", "text")
    val batch = Seq(
      (10L, null: String),          // null fp — kept (min id of null group)
      (11L, null: String),          // null fp — dropped by the winner rule
      (12L, "ALPHA beta   gamma"),  // corpus dup — dropped
      (13L, "fresh content"))       // fresh singleton — kept
      .toDF("doc_id", "text")
    val plain = DedupFunctions.incrementalDedup(batch, corpus, "doc_id", "text")
      .select($"doc_id").as[Long].collect().sorted.toSeq
    val bloom = DedupFunctions.incrementalDedupBloom(batch, corpus,
        "doc_id", "text", expectedDistinct = 64)
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(bloom === plain)
    assert(bloom === Seq(10L, 13L))
    // fallback branch sees the same null routing
    val fallback = DedupFunctions.incrementalDedupBloom(batch, corpus,
        "doc_id", "text", expectedDistinct = 64,
        broadcastMaxSuspicious = 0L)
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(fallback === plain)
  }

  test("paragraph dedup: each distinct line survives once — smallest doc, first slot") {
    val docs = Seq(
      (1L, "alpha one\nshared footer\nalpha two"),
      (2L, "beta one\nshared footer\nbeta two"),        // loses the footer
      (3L, "shared footer\nSHARED   footer\ngamma one"),// both copies lose
      (4L, "shared footer")                             // whole doc was boilerplate
    ).toDF("doc_id", "text")
    val out = DedupFunctions.dedupParagraphs(docs, "doc_id", "text")
      .select($"doc_id", $"n_lines", $"n_kept_lines", $"clean_text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) === ((3L, 3L, "alpha one\nshared footer\nalpha two")))
    assert(out(2L) === ((3L, 2L, "beta one\nbeta two")))
    // doc 3: both copies (exact + case/space variant) are removed
    assert(out(3L) === ((3L, 1L, "gamma one")))
    assert(out(4L) === ((1L, 0L, "")))
  }

  test("paragraph dedup: duplicate line within ONE doc keeps only the first slot") {
    val docs = Seq((7L, "x y z\nrepeat me\nmiddle line here\nrepeat me"))
      .toDF("doc_id", "text")
    val out = DedupFunctions.dedupParagraphs(docs, "doc_id", "text")
      .select($"n_kept_lines", $"clean_text").head()
    assert(out.getLong(0) === 3L)
    assert(out.getString(1) === "x y z\nrepeat me\nmiddle line here")
  }

  test("cross-corpus minhash: exactly the self-join candidates that cross sides") {
    import org.apache.spark.sql.functions.col
    val d = sf("documents")
    val corpus = d.where(col("source") === "src0")
    val batch = d.where(col("source") =!= "src0")
    val corpusIds = corpus.select("doc_id").as[Long].collect().toSet
    val across = DedupFunctions
      .minhashCandidatesAcross(batch, corpus, "doc_id", "text")
      .select(col("batch_id"), col("corpus_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every candidate genuinely crosses sides
    assert(across.forall { case (b, c) => !corpusIds(b) && corpusIds(c) })
    // and the set equals the whole-corpus self-join restricted to cross pairs
    val crossFromFull = DedupFunctions.minhashCandidates(d, "doc_id", "text")
      .select(col("id_a"), col("id_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .flatMap { case (x, y) =>
        if (corpusIds(x) && !corpusIds(y)) Some((y, x))
        else if (corpusIds(y) && !corpusIds(x)) Some((x, y))
        else None
      }.toSet
    assert(across === crossFromFull && across.nonEmpty)
  }

  // ------------------------------------------------- sequence packing

  test("packBlocks: per-shard block arithmetic matches a local replay") {
    val docs = sf("documents").withColumn("tok_cnt",
      size(graft.functions.TextFunctions.tokens(coalesce($"text", lit(""))))
        .cast("long"))
    val packed = Sampling.packBlocks(docs, "doc_id", "tok_cnt",
      blockTokens = 128L, numShards = 4, salt = "spec")
    val rows = packed.select($"shard", $"shard_order", $"doc_id", $"tok_cnt",
        $"block_start", $"block_end", $"spans_boundary")
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getBoolean(6)))
    assert(rows.nonEmpty)
    // local replay: concatenate each shard in (order, id) order and cut
    // every 128 tokens
    rows.groupBy(_._1).foreach { case (_, rs) =>
      var cum = 0L
      rs.sortBy(r => (r._2, r._3)).foreach {
        case (_, _, _, toks, bs, be, spans) =>
          val expectedStart = cum / 128
          cum += toks
          val expectedEnd =
            if (toks == 0) expectedStart else math.max(expectedStart, (cum - 1) / 128)
          assert(bs === expectedStart && be === expectedEnd)
          assert(spans === (expectedEnd > expectedStart))
      }
    }
    // block counts: every shard's max block is ceil(token_sum / 128) - 1
    rows.groupBy(_._1).foreach { case (_, rs) =>
      val total = rs.map(_._4).sum
      val expectedBlocks = if (total == 0) 0L else (total - 1) / 128 + 1
      assert(rs.map(_._6).max + 1 === expectedBlocks)
    }
  }

  test("packBlocks: null/zero-token docs never span a boundary") {
    val docs = Seq((1L, Some(5L)), (2L, None), (3L, Some(0L)), (4L, Some(300L)))
      .toDF("doc_id", "tok_cnt")
    val packed = Sampling.packBlocks(docs, "doc_id", "tok_cnt",
      blockTokens = 100L, numShards = 1, salt = "z")
    val zeroish = packed.where($"doc_id".isin(2L, 3L))
      .select($"spans_boundary", $"block_start" === $"block_end")
      .collect()
    assert(zeroish.forall(r => !r.getBoolean(0) && r.getBoolean(1)))
    // the 300-token doc must span blocks wherever it starts
    assert(packed.where($"doc_id" === 4L).select($"spans_boundary")
      .head().getBoolean(0))
  }

  test("scorecard: one row per doc, family verdicts match the standalone ops") {
    import graft.operators.{DocPipeline, Repetition}
    val d = sf("documents")
    val sc = DocPipeline.scorecard(d, "doc_id", "text")
    assert(sc.count() === d.count())
    // conjunction identity
    assert(sc.where($"all_ok" =!=
      ($"c4_ok" && $"gopher_ok" && $"langq_ok" && $"lm_ok")).count() === 0)
    // gopher flag = gate membership
    assert(sc.where($"gopher_ok").count() ===
      Repetition.gate(d, "doc_id", "text").count())
    // langq flag = batch clean filter (pre-dedup)
    val lq = DocPipeline.annotate(d, "doc_id", "text")
      .where($"lang_pred" === "en" && $"quality_bp" >= 2500).count()
    assert(sc.where($"langq_ok").count() === lq)
  }

  // ------------------------------------------------------------- splits

  test("splits: exhaustive, exclusive, growth-stable, roughly proportional") {
    import graft.operators.Sampling
    val d = sf("documents", "/root/testdata/sf0.01")
    val splits = Seq("train" -> 9000, "val" -> 500, "test" -> 500)
    val assigned = Sampling.assignSplits(d, "doc_id", splits, salt = "t")
    val counts = assigned.groupBy($"split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = d.count()
    assert(counts.values.sum === n) // exhaustive + exclusive (one col)
    assert(counts("train") > n * 8 / 10 && counts("val") > 0 && counts("test") > 0)
    // growth stability: assignments on a subset are the subset of assignments
    val subset = Sampling.assignSplits(d.where($"doc_id" % 2 === 0), "doc_id",
        splits, salt = "t")
      .select($"doc_id", $"split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val full = assigned.select($"doc_id", $"split")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    subset.foreach { case (id, s) => assert(full(id) === s) }
  }

  // ---------------------------------------------------------------- PCA

  test("pca: projection matches a local replay; variance concentrates") {
    import graft.functions.Pca
    val emb = sf("embeddings", "/root/testdata/sf0.01")
    val model = Pca.pcaTrain(emb, "embedding", k = 16)
    assert(model.k === 16 && model.dim === 64)
    assert(model.explainedBp > 2500 && model.explainedBp <= 10000)
    // local replay of one projection
    val row = emb.orderBy($"vec_id").select($"embedding").head()
      .getSeq[Float](0).map(_.toDouble).toArray
    val projected = Pca.pcaProject(emb, "embedding", 16)._2
      .orderBy($"vec_id").select($"embedding").head().getSeq[Double](0)
    val expected = model.components.map { c =>
      var acc = 0.0
      var i = 0
      while (i < row.length) { acc += (row(i) - model.mean(i)) * c(i); i += 1 }
      acc
    }
    projected.zip(expected).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-9, s"$a vs $b")
    }
    // components are orthonormal (eigendecomposition of a symmetric matrix)
    val c0 = model.components(0)
    val c1 = model.components(1)
    def dot(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => x * y }.sum
    assert(math.abs(dot(c0, c0) - 1.0) < 1e-9)
    assert(math.abs(dot(c0, c1)) < 1e-9)
  }

  test("pca: model is partition-independent and survives a disk round-trip") {
    import graft.functions.Pca
    val emb = sf("embeddings")
    val m1 = Pca.pcaTrain(emb, "embedding", k = 8)
    val m2 = Pca.pcaTrain(emb.repartition(7), "embedding", k = 8)
    assert(m1.mean.toSeq === m2.mean.toSeq)
    assert(m1.components.map(_.toSeq).toSeq === m2.components.map(_.toSeq).toSeq)
    val path = java.nio.file.Files.createTempDirectory("pca").toString + "/model.json"
    m1.save(path, spark.sparkContext.hadoopConfiguration)
    val loaded = Pca.pcaLoad(path, spark.sparkContext.hadoopConfiguration)
    assert(loaded.mean.toSeq === m1.mean.toSeq &&
      loaded.explainedBp === m1.explainedBp &&
      loaded.components.map(_.toSeq).toSeq === m1.components.map(_.toSeq).toSeq)
  }

  // ---------------------------------------------------------------- BPE

  test("bpe: learns the classic Sennrich merges with deterministic tie-breaks") {
    import graft.operators.Bpe
    // word freqs low:5 lower:2 newest:6 widest:3 — the paper's example.
    // Hand-derived: es:9 ties st:9 (pair-asc -> e s), then es t:9,
    // then l o:7 ties o w:7 (-> l o), then lo w:7.
    val corpus = Seq(
      (1L, ("low " * 5).trim), (2L, ("lower " * 2).trim),
      (3L, ("newest " * 6).trim), (4L, ("widest " * 3).trim)
    ).toDF("doc_id", "text")
    val merges = Bpe.train(corpus, "text", numMerges = 4)
    assert(merges.map(m => (m.a, m.b, m.count)) === Seq(
      ("e", "s", 9L), ("es", "t", 9L), ("l", "o", 7L), ("lo", "w", 7L)))
    // the famous result: an unseen word segments into learned subwords
    val seg = Bpe.segmentVocab(Seq((9L, "lowest")).toDF("doc_id", "text"),
        "text", merges)
      .select($"subwords").head().getSeq[String](0)
    assert(seg === Seq("low", "est"))
  }

  test("bpe: one merge pass folds runs pairwise like the reference (aa aa, not aa a a)") {
    import graft.operators.Bpe
    val merges = Bpe.train(Seq((1L, ("aaaa " * 3).trim)).toDF("doc_id", "text"),
      "text", numMerges = 1)
    assert(merges.head.a === "a" && merges.head.b === "a")
    val seg = Bpe.segmentVocab(Seq((1L, "aaaa")).toDF("doc_id", "text"),
        "text", merges)
      .select($"subwords").head().getSeq[String](0)
    assert(seg === Seq("aa", "aa"))
  }

  test("bpe: merges survive a disk round-trip and segment identically") {
    import graft.operators.Bpe
    val corpus = Seq((1L, ("low " * 5).trim), (2L, ("newest " * 6).trim))
      .toDF("doc_id", "text")
    val merges = Bpe.train(corpus, "text", numMerges = 3)
    val path = java.nio.file.Files.createTempDirectory("bpe").toString + "/merges.tsv"
    Bpe.saveMerges(merges, path, spark.sparkContext.hadoopConfiguration)
    val loaded = Bpe.loadMerges(path, spark.sparkContext.hadoopConfiguration)
    assert(loaded === merges)
    val a = Bpe.segmentVocab(corpus, "text", merges).orderBy($"_w").collect()
    val b = Bpe.segmentVocab(corpus, "text", loaded).orderBy($"_w").collect()
    assert(a === b)
  }

  test("bpe: subword counts bounded by words and chars; empty docs zero") {
    import graft.operators.Bpe
    val corpus = Seq((1L, "low lower newest"), (2L, ""), (3L, "widest low"))
      .toDF("doc_id", "text")
    val merges = Bpe.train(corpus, "text", numMerges = 3, minPairCount = 1L)
    val out = Bpe.subwordCounts(corpus, "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(2L) === ((0L, 0L, 0L)))
    out.filterKeys(_ != 2L).values.foreach { case (w, c, s) =>
      assert(w <= s && s <= c, s"violated words<=subwords<=chars: ($w,$c,$s)")
    }
    // merges actually fired somewhere
    assert(out.values.map(_._3).sum < out.values.map(_._2).sum)
  }

  // --------------------------------------------------------------- DSIR

  test("dsir: target-like documents outscore off-target ones") {
    val target = Seq.tabulate(20)(i => (1000L + i,
      "quantum physics entanglement superposition qubit decoherence"))
      .toDF("doc_id", "text")
    val noise = Seq.tabulate(20)(i => (2000L + i,
      s"cheap viagra casino jackpot winner prize$i click now"))
      .toDF("doc_id", "text")
    val raw = target.unionByName(noise)
    val scores = Dsir.importanceScores(raw, target, "doc_id", "text", buckets = 256)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val tAvg = (0 until 20).map(i => scores(1000L + i)).sum / 20.0
    val nAvg = (0 until 20).map(i => scores(2000L + i)).sum / 20.0
    assert(tAvg > 0 && nAvg < 0 && tAvg > nAvg,
      s"target avg $tAvg should exceed noise avg $nAvg")
  }

  test("dsir: empty docs score zero; weight table bounded by bucket count") {
    val target = Seq((1L, "alpha beta")).toDF("doc_id", "text")
    val raw = target.unionByName(Seq((2L, ""), (3L, "alpha gamma"))
      .toDF("doc_id", "text"))
    val out = Dsir.importanceScores(raw, target, "doc_id", "text", buckets = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val empty = out.find(_._1 == 2L).get
    assert(empty._2 === 0L && empty._3 === 0L)
    assert(out.length === 3)
    assert(Dsir.weightTable(raw, target, "text", 64).count() <= 64)
  }

  test("drift: identical snapshots measure exactly zero; disjoint vocab large") {
    import graft.operators.Dsir
    val a = Seq.tabulate(30)(i => (i.toLong, s"alpha beta gamma word$i"))
      .toDF("doc_id", "text")
    val zero = Dsir.driftUnats(a, a, "text", buckets = 128)
      .head().getLong(2)
    assert(zero === 0L) // tc=rc, T=R -> every weight is ln(1) = 0 exactly
    val b = Seq.tabulate(30)(i => (100L + i, s"zeta eta theta other$i"))
      .toDF("doc_id", "text")
    val shifted = Dsir.driftUnats(a.unionByName(b), b, "text", buckets = 128)
      .head().getLong(2)
    assert(shifted > 0L, s"disjoint-vocab drift should be positive, got $shifted")
  }

  test("dsir: snapshot and model survive a save/load round trip exactly") {
    import graft.operators.Dsir
    val raw = (Seq.tabulate(40)(i => (i.toLong, s"alpha beta common$i noise")) ++
      Seq((90L, ""))).toDF("doc_id", "text")
    val target = Seq.tabulate(10)(i => (200L + i, s"alpha beta quality$i"))
      .toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("dsir").toString

    // drift through a loaded snapshot == drift trained in-query
    // (integer counts round-trip parquet exactly)
    val direct = Dsir.driftUnats(raw, target, "text", buckets = 128)
      .collect().map(_.toSeq).toSeq
    Dsir.snapshot(raw, "text", buckets = 128).save(s"$tmp/snap")
    val viaSnap = Dsir.driftFromSnapshot(
        Dsir.loadSnapshot(spark, s"$tmp/snap"), target, "text")
      .collect().map(_.toSeq).toSeq
    assert(viaSnap === direct)

    // scoring through a loaded model == importanceScores trained in-query
    val directScores = Dsir.importanceScores(raw, target, "doc_id", "text",
        buckets = 128)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    Dsir.trainModel(raw, target, "text", buckets = 128).save(s"$tmp/model")
    val loaded = Dsir.loadModel(spark, s"$tmp/model")
    assert(loaded.buckets === 128)
    val viaModel = Dsir.scoreWith(loaded, raw, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaModel === directScores)
  }

  test("sqrt mixture: rates follow isqrt weighting; kept set is a hash filter") {
    import graft.operators.Sampling
    // sizes 100 and 400: sqrt weights 10 and 20 -> the small source keeps
    // a 4x HIGHER rate (boosted), budget 250 of 500
    val docs = (Seq.tabulate(100)(i => (i.toLong, "s")) ++
      Seq.tabulate(400)(i => (1000L + i, "b"))).toDF("doc_id", "source")
    val kept = Sampling.sqrtMixtureSample(docs, "doc_id", "source",
        budgetDocs = 250L, salt = "t")
      .groupBy($"source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // exact expected rates: wsum=30; s: 1e4*250*10/(30*100)=8333bp,
    // b: 1e4*250*20/(30*400)=4166bp
    assert(kept("s") > 70 && kept("s") <= 100)   // ~83% of 100
    assert(kept("b") > 130 && kept("b") < 200)   // ~42% of 400
    // per-doc keep decision is independent of other rows: a subset corpus
    // with the same rates keeps exactly the intersection
    val all = Sampling.sqrtMixtureSample(docs, "doc_id", "source", 250L, "t")
      .select($"doc_id").as[Long].collect().toSet
    assert(kept.values.sum === all.size)
  }

  test("sqrt mixture: null sources are excluded from quota and output") {
    import graft.operators.Sampling
    val docs = (Seq.tabulate(50)(i => (i.toLong, Option("s"))) ++
      Seq.tabulate(20)(i => (1000L + i, Option.empty[String])))
      .toDF("doc_id", "source")
    val kept = Sampling.sqrtMixtureSample(docs, "doc_id", "source",
      budgetDocs = 30L, salt = "t")
    assert(kept.where($"source".isNull).count() === 0L)
    // quota computed over the 50 non-null docs only: rate = 1e4*30/50 = 6000bp
    val n = kept.count()
    assert(n > 15 && n < 45, s"~60% of 50 expected, got $n")
    // all-null sources = zero mixable sources = the empty corpus (the
    // degenerate-input contract, DegenerateInputSpec), not an error
    val allNull = Seq.tabulate(5)(i => (i.toLong, Option.empty[String]))
      .toDF("doc_id", "source")
    assert(Sampling.sqrtMixtureSample(allNull, "doc_id", "source", 3L, "t")
      .count() === 0L)
  }

  test("tfidf: rare terms outrank ubiquitous ones; ties break on term") {
    import graft.operators.Tfidf
    val docs = Seq(
      (1L, "common rare common"),
      (2L, "common common"),
      (3L, "common zeta alfa")).toDF("doc_id", "text")
    // 'common' df=3 -> idf ln(4/4)=0 -> score 0 always
    val kw = Tfidf.topKeywords(docs, "doc_id", "text", k = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3),
        r.getLong(4))).toSeq
    val d1 = kw.filter(_._1 == 1L).sortBy(_._4)
    assert(d1.head._2 === "rare" && d1.head._3 > 0)
    assert(d1(1)._2 === "common" && d1(1)._3 === 0L)
    // doc 3: alfa and zeta tie (same tf, same df) -> term-string order
    val d3 = kw.filter(_._1 == 3L).sortBy(_._4).map(_._2)
    assert(d3 === Seq("alfa", "zeta"))
    // partition-independence: integer scores survive a repartition
    val again = Tfidf.topKeywords(docs.repartition(7), "doc_id", "text", 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3),
        r.getLong(4))).toSet
    assert(again === kw.toSet)
  }

  test("cap per group: keeps top-k by score with id tiebreak") {
    val d = Seq(
      (1L, "a", 10L), (2L, "a", 30L), (3L, "a", 30L), (4L, "a", 5L),
      (5L, "b", 1L)).toDF("doc_id", "source", "score")
    val kept = Sampling.capPerGroup(d, "doc_id", "source", "score", k = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3))).toSet
    // group a: scores 30(id2), 30(id3) — tie broken by id; group b under cap
    assert(kept === Set((2L, "a", 1L), (3L, "a", 2L), (5L, "b", 1L)))
  }

  test("naive bayes: separable vocabularies classify; empty doc falls back to prior") {
    import graft.operators.NaiveBayes
    val train = (Seq.tabulate(20)(i => (i.toLong, "spam", "buy cheap pills now win prize")) ++
      Seq.tabulate(30)(i => (100L + i, "ham", "meeting notes agenda quarterly review")))
      .toDF("doc_id", "label", "text")
    val test = Seq(
      (500L, "cheap prize pills"),
      (501L, "agenda for the quarterly meeting"),
      (502L, "")).toDF("doc_id", "text")
    val pred = NaiveBayes.classify(test, train, "doc_id", "label", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(pred(500L) === "spam")
    assert(pred(501L) === "ham")
    assert(pred(502L) === "ham") // prior-only: ham is the majority class
    // integer scores are partition-independent
    val again = NaiveBayes.classify(test.repartition(5), train.repartition(7),
        "doc_id", "label", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val once = NaiveBayes.classify(test, train, "doc_id", "label", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(again === once)
  }

  test("naive bayes: NULL-label rows train nothing — no null class, priors unpolluted") {
    import graft.operators.NaiveBayes
    // fuzz seed 48's find: a NULL "class" trained from unlabeled rows can
    // TIE a real class on the prior-only argmax, and the tiebreak on a
    // null label is engine-divergent (Spark ASC sorts nulls first, ANSI
    // engines last). Unlabeled rows must be dropped before training.
    val train = (Seq.tabulate(20)(i => (i.toLong, "spam", "buy cheap pills now win prize")) ++
      Seq.tabulate(30)(i => (100L + i, "ham", "meeting notes agenda quarterly review")) ++
      Seq.tabulate(40)(i => (200L + i, null: String, "unlabeled noise rows everywhere")))
      .toDF("doc_id", "label", "text")
    val model = NaiveBayes.trainModel(train, "label", "text")
    val classes = model.classes.select("label").collect().map(_.getString(0)).toSet
    assert(classes === Set("spam", "ham"), s"null class leaked: $classes")
    // the empty doc's prior-only argmax is computed over LABELED rows
    // only (ham 30/50), never over the unlabeled 40
    val test = Seq((502L, "")).toDF("doc_id", "text")
    val pred = NaiveBayes.classifyWith(model, test, "doc_id", "text").head()
    assert(pred.getString(1) === "ham" && !pred.isNullAt(1))
    // all-unlabeled training set: zero classes, zero predictions — not a
    // crash, not a null class
    val none = NaiveBayes.classify(test,
      train.where($"label".isNull), "doc_id", "label", "text")
    assert(none.isEmpty)
  }

  test("naive bayes + tfidf: models survive a save/load round trip exactly") {
    import graft.operators.{NaiveBayes, Tfidf}
    val train = (Seq.tabulate(20)(i => (i.toLong, "spam", "buy cheap pills now win prize")) ++
      Seq.tabulate(30)(i => (100L + i, "ham", "meeting notes agenda quarterly review")))
      .toDF("doc_id", "label", "text")
    val test = Seq(
      (500L, "cheap prize pills"),
      (501L, "agenda for the quarterly meeting"),
      (502L, "")).toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("models").toString

    // NB: scoring through a loaded model == training in-query
    val direct = NaiveBayes.classify(test, train, "doc_id", "label", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    NaiveBayes.trainModel(train, "label", "text").save(s"$tmp/nb")
    val nb = NaiveBayes.loadModel(spark, s"$tmp/nb")
    assert(nb.buckets === 1024)
    val viaModel = NaiveBayes.classifyWith(nb, test, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(viaModel === direct)

    // TF-IDF: keywords through a loaded idf table == in-query idf
    val docs = Seq(
      (1L, "alpha beta beta unique1"),
      (2L, "alpha beta unique2 unique2"),
      (3L, "alpha gamma unique3 filler")).toDF("doc_id", "text")
    val directKw = Tfidf.topKeywords(docs, "doc_id", "text", k = 2)
      .collect().map(_.toSeq).toSet
    Tfidf.saveIdf(Tfidf.idfTable(docs, "doc_id", "text"), s"$tmp/idf")
    val viaIdf = Tfidf.topKeywordsWith(Tfidf.loadIdf(spark, s"$tmp/idf"),
        docs, "doc_id", "text", k = 2)
      .collect().map(_.toSeq).toSet
    assert(viaIdf === directKw)
  }

  test("dsir: integer micro-nat scores are partition-independent") {
    val target = Seq.tabulate(10)(i => (i.toLong, s"term$i common word"))
      .toDF("doc_id", "text")
    val raw = target.unionByName(
      Seq.tabulate(30)(i => (100L + i, s"other$i filler text noise"))
        .toDF("doc_id", "text"))
    val once = Dsir.importanceScores(raw, target, "doc_id", "text", buckets = 128)
      .orderBy($"doc_id").collect().toSeq
    val repart = Dsir.importanceScores(raw.repartition(7), target.repartition(3),
        "doc_id", "text", buckets = 128)
      .orderBy($"doc_id").collect().toSeq
    assert(once === repart)
  }

  // ------------------------------------------------------- corpus diff

  test("corpus diff: added/removed/changed/unchanged by id-keyed fingerprint") {
    import graft.operators.CorpusDiff
    val old = Seq(
      (Some(1L), Some("alpha")),   // unchanged
      (Some(2L), Some("beta")),    // changed
      (Some(3L), Some("gamma")),   // removed
      (Some(4L), None: Option[String]), // null text ≡ '' — unchanged vs ""
      (Some(5L), Some("dup a")),   // dup id: min-fp contract
      (Some(5L), Some("dup b")),
      (None, Some("ghost-old"))    // null id: never pairs → removed
    ).toDF("doc_id", "text")
    val neu = Seq(
      (Some(1L), Some("alpha")),
      (Some(2L), Some("beta v2")),
      (Some(4L), Some("")),
      (Some(5L), Some("dup a")),   // min over {dup a} vs {dup a, dup b}
      (Some(6L), Some("delta")),   // added
      (None, Some("ghost-new"))    // null id → added
    ).toDF("doc_id", "text")
    val byId = CorpusDiff.diff(old, neu, "doc_id", "text")
      .collect().map(r => (Option(r.get(0)), r.getString(1))).toSeq
    def statusOf(id: Long) = byId.collect { case (Some(i), s) if i == id => s }
    assert(statusOf(1L) == Seq("unchanged"))
    assert(statusOf(2L) == Seq("changed"))
    assert(statusOf(3L) == Seq("removed"))
    assert(statusOf(4L) == Seq("unchanged"), "null text must fingerprint like ''")
    // dup-id snapshot: min fp on each side — old min(md5(dup a), md5(dup b))
    // vs new md5(dup a); deterministic either way, and min decides (the
    // expectation computes through the engine so it tracks the contract)
    val minOld = old.where($"doc_id" === 5L)
      .select(min(md5(coalesce($"text", lit(""))))).head().getString(0)
    val minNew = neu.where($"doc_id" === 5L)
      .select(min(md5(coalesce($"text", lit(""))))).head().getString(0)
    assert(statusOf(5L) == Seq(if (minOld == minNew) "unchanged" else "changed"))
    assert(statusOf(6L) == Seq("added"))
    // the two null-id groups never pair: one removed + one added
    val nullStatuses = byId.collect { case (None, s) => s }.sorted
    assert(nullStatuses == Seq("added", "removed"))

    val counts = CorpusDiff.summary(old, neu, "doc_id", "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("added") == 2 && counts("removed") == 2)
    assert(counts("changed") + counts("unchanged") == 4)
  }

  test("corpus diff is partition-independent") {
    import graft.operators.CorpusDiff
    val old = Seq.tabulate(40)(i => (i.toLong, s"text $i")).toDF("doc_id", "text")
    val neu = Seq.tabulate(40)(i =>
      ((i + 10).toLong, if (i % 4 == 0) s"text ${i + 10} rev" else s"text ${i + 10}"))
      .toDF("doc_id", "text")
    val a = CorpusDiff.diff(old, neu, "doc_id", "text")
      .orderBy($"doc_id").collect().map(_.toSeq).toSeq
    val b = CorpusDiff.diff(old.repartition(7), neu.repartition(3), "doc_id", "text")
      .orderBy($"doc_id").collect().map(_.toSeq).toSeq
    assert(a === b)
  }
}
