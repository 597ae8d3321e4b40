package graft

import graft.operators.Repetition

class RepetitionSpec extends SparkSpec {

  // Hand-computable fixtures (the driver's oracle gate covers the corpus;
  // this pins the multi-line and degenerate shapes the single-line
  // synthetic corpus never exercises).
  private lazy val fixtures = {
    import spark.implicits._
    Seq(
      // 4 non-empty lines, "spam spam" twice -> 2 duplicate line slots
      (1L, "spam spam\nreal content here\nspam spam\n\n  \nother line", "s0"),
      // no repetition at all: every token and line unique
      (2L, "alpha beta gamma delta", "s0"),
      // one token repeated 5x: dup_token 4/5; only bigram is "rep rep"
      (3L, "rep rep rep rep rep", "s1"),
      // short text below the bigram fallback: single whole-text gram
      (4L, "one", "s1"),
      // whitespace-only: zero lines, zero tokens, all signals 0
      (5L, "  \n \n ", "s1"),
      // NULL text: must still produce a row (all signals 0), not vanish
      (6L, null.asInstanceOf[String], "s1"))
      .toDF("doc_id", "text", "source")
  }

  test("profile: duplicate-line and duplicate-token fractions") {
    val rows = Repetition.profile(fixtures, "doc_id", "text")
      .orderBy("doc_id").collect()

    val d1 = rows(0)
    assert(d1.getAs[Int]("n_lines") == 4)
    // 4 lines, 3 distinct -> 1/4 duplicated
    assert(d1.getAs[Long]("dup_line_bp") == 2500L)
    // tokens: spam spam real content here spam spam other line -> 9 total,
    // 6 distinct -> 3/9
    assert(d1.getAs[Long]("dup_token_bp") == 3333L)

    val d2 = rows(1)
    assert(d2.getAs[Long]("dup_line_bp") == 0L)
    assert(d2.getAs[Long]("dup_token_bp") == 0L)

    val d3 = rows(2)
    assert(d3.getAs[Long]("dup_token_bp") == 8000L) // 4 of 5 are repeats
    // every bigram is "rep rep" -> the top one holds all bigram chars
    assert(d3.getAs[Long]("top_bigram_bp") == 10000L)
    assert(d3.getAs[Long]("top_trigram_bp") == 10000L)

    val d4 = rows(3)
    assert(d4.getAs[Long]("top_bigram_bp") == 10000L) // whole-text fallback

    val d5 = rows(4)
    assert(d5.getAs[Int]("n_lines") == 0)
    assert(d5.getAs[Long]("dup_line_bp") == 0L)
    assert(d5.getAs[Long]("dup_token_bp") == 0L)
    assert(d5.getAs[Long]("top_bigram_bp") == 0L) // zero-char fallback gram

    // null text: one-row-per-document contract holds, zeros everywhere
    assert(rows.length == 6)
    val d6 = rows(5)
    assert(d6.getAs[Int]("n_lines") == 0)
    assert(d6.getAs[Long]("dup_token_bp") == 0L)
    assert(d6.getAs[Long]("top_bigram_bp") == 0L)
  }

  test("profile: top-bigram share prefers count, ties break on gram") {
    import spark.implicits._
    val df = Seq(
      // bigrams: "a a" x2, "a b", "b b" x3 -> top = "b b" by count;
      // chars: 6 grams x 3 = 18, top 3x3 = 9 -> 5000 bp
      (1L, "a a a b b b b"),
      // bigrams: "a a" x2, "a b", "b b" x2 -> 2-2 count tie, "a a" wins
      // lexicographically; chars: 5x3 = 15, top 2x3 = 6 -> 4000 bp
      (2L, "a a a b b b")).toDF("doc_id", "text")
    val rows = Repetition.profile(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(rows(0).getAs[Long]("top_bigram_bp") == 5000L)
    assert(rows(1).getAs[Long]("top_bigram_bp") == 4000L)
  }

  test("stripMarkup: tags dropped, entities decoded, whitespace collapsed") {
    import spark.implicits._
    import graft.functions.TextFunctions
    val df = Seq(
      "<p>Hello &amp; <b>world</b></p>",
      "a<br/>b",
      "&amp;lt;",                       // double-escape: decodes to &lt;
      "no markup at all",
      "<div class=\"x\">spaced   out</div>")
      .toDF("t")
    val out = df.select(TextFunctions.stripMarkup($"t").as("s"))
      .as[String].collect().toSeq
    assert(out == Seq("Hello & world", "a b", "&lt;", "no markup at all",
      "spaced out"))
  }

  test("profile signals agree with brute-force recomputation on random docs") {
    import spark.implicits._
    // deterministic pseudo-random docs over a tiny vocab so repetition is
    // dense; brute-force recompute per doc must match the operator exactly
    val vocab = Vector("a", "bb", "ccc", "dd", "e")
    val docsSeq = (0 until 40).map { i =>
      val rnd = new scala.util.Random(i)
      val n = 1 + rnd.nextInt(30)
      (i.toLong, (0 until n).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val got = Repetition.profile(docsSeq.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("dup_token_bp"), r.getAs[Long]("top_bigram_bp"))).toMap

    docsSeq.foreach { case (id, text) =>
      val toks = text.split("\\s+").toSeq
      val dupBp = math.floor((toks.size - toks.distinct.size).toDouble /
        toks.size * 10000 + 0.5).toLong
      val grams = if (toks.size < 2) Seq(toks.mkString(" "))
                  else toks.sliding(2).map(_.mkString(" ")).toSeq
      val counts = grams.groupBy(identity).view.mapValues(_.size)
      val (topGram, topCnt) = counts.toSeq.sortBy { case (g, c) => (-c, g) }.head
      val total = counts.map { case (g, c) => g.length.toLong * c }.sum
      val topBp = if (total == 0) 0L
        else math.floor(topGram.length.toLong * topCnt.toDouble / total * 10000 + 0.5).toLong
      assert(got(id) == (dupBp, topBp), s"doc $id: ${got(id)} != ($dupBp, $topBp)")
    }
  }

  test("gate: volume floor and repetition ceilings filter rows") {
    import spark.implicits._
    val longUnique = (1 to 40).map(i => s"tok$i").mkString(" ")
    val longSpam = Seq.fill(40)("buy now").mkString(" ")
    val df = Seq(
      (1L, longUnique, "a"), // passes
      (2L, longSpam, "a"),   // fails: dup tokens + dominant bigram
      (3L, "too short", "b") // fails: volume floor
    ).toDF("doc_id", "text", "source")

    val kept = Repetition.gate(df, "doc_id", "text").select("doc_id")
      .as[Long].collect().toSet
    assert(kept == Set(1L))

    // loosened config keeps the spammy doc too
    val loose = Repetition.gate(df, "doc_id", "text",
      Repetition.Config(minTokens = 1, maxDupTokenBp = 10000,
        maxTopBigramBp = 10000))
      .select("doc_id").as[Long].collect().toSet
    assert(loose == Set(1L, 2L, 3L))
  }
}
