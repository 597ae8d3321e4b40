package graft

import graft.plans.RangeJoinRewrite
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Property fuzz for the range-join rewrite (round-9 verdict task #4):
  * seeded-random corpora (nulls, duplicates, degenerate and malformed
  * intervals, double and timestamp domains) joined under seeded-random
  * inequality predicates (random strictness, random operand orientation,
  * optional extra conjuncts), asserting exact row parity between the
  * naive plan (rule off) and the bucketed rewrite (rule on) at a
  * seeded-random bucket width. Any divergence is a real rewrite bug —
  * the rewrite's contract is raw-predicate equivalence on ANY input.
  */
class RangeJoinFuzzSpec extends SparkSpec {

  import spark.implicits._

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  /** Deterministic corpus for one seed: points with ~10% nulls and
    * duplicates; intervals with nulls, lo==hi, lo>hi, and varied lengths.
    * Values bounded so interval span / width stays far below the
    * maxBandsPerRow guard (the guard's own firing is covered in
    * RangeJoinRewriteSpec).
    */
  private def corpus(seed: Int): (DataFrame, DataFrame) = {
    val r = new scala.util.Random(seed)
    val nP = 150 + r.nextInt(250)
    val nI = 30 + r.nextInt(70)
    val pts = (0 until nP).map { i =>
      val v: java.lang.Double =
        if (r.nextDouble() < 0.1) null
        else if (r.nextDouble() < 0.1) (r.nextInt(40) * 25).toDouble // dup-prone
        else r.nextDouble() * 4000.0 - 1000.0
      (i.toLong, v)
    }.toDF("pid", "p")
    val ivs = (0 until nI).map { i =>
      val lo: java.lang.Double =
        if (r.nextDouble() < 0.08) null
        else r.nextDouble() * 3800.0 - 1200.0
      val hi: java.lang.Double =
        if (lo == null) r.nextDouble() * 100.0
        else r.nextInt(5) match {
          case 0 => lo                                  // degenerate lo == hi
          case 1 => lo - 1.0 - r.nextDouble() * 50.0    // malformed lo > hi
          case _ => lo + r.nextDouble() * 180.0
        }
      (i.toLong, lo, hi)
    }.toDF("band", "lo", "hi")
    (pts, ivs)
  }

  /** One random comparison `a (< | <= | > | >=) b` with random operand
    * orientation — all four spellings normalize to the same pair.
    */
  private def cmp(r: scala.util.Random, small: Column, large: Column): Column =
    (r.nextBoolean(), r.nextBoolean()) match {
      case (true, true)   => small < large
      case (true, false)  => small <= large
      case (false, true)  => large > small
      case (false, false) => large >= small
    }

  private def parity(naiveDf: => DataFrame, w: Double, label: String): Unit = {
    val naive = sortedRows(naiveDf)
    val fast = RangeJoinRewrite.withBucketWidth(spark, w) { sortedRows(naiveDf) }
    assert(fast == naive,
      s"$label diverged at width $w: ${fast.size} vs ${naive.size} rows")
  }

  for (seed <- 1 to 6) {
    test(s"seed $seed: random predicate shapes keep exact parity, rule on vs off") {
      val r = new scala.util.Random(seed * 1000 + 7)
      val (pts0, ivs0) = corpus(seed)
      // cache: both runs and every predicate must see identical data
      val pts = pts0.cache(); val ivs = ivs0.cache()
      pts.count(); ivs.count()
      try {
        val width = Seq(0.7, 5.0, 60.0, 800.0)(r.nextInt(4))

        // point-in-interval, random strictness/orientation
        val pCond = cmp(r, ivs("lo"), pts("p")) && cmp(r, pts("p"), ivs("hi"))
        parity(pts.join(ivs, pCond), width, s"point seed=$seed")

        // ... with a random extra conjunct riding along
        val extra = Seq[Column](
          pts("pid") % 3 === ivs("band") % 3,
          pts("pid") > ivs("band"),
          ivs("band") % 2 === 0)(r.nextInt(3))
        parity(pts.join(ivs, pCond && extra), width, s"point+conj seed=$seed")

        // overlap idiom between two interval tables (self-join shape)
        val ivs2 = ivs.select($"band".as("b2"), $"lo".as("lo2"), $"hi".as("hi2"))
        val oCond = cmp(r, ivs("lo"), ivs2("hi2")) && cmp(r, ivs2("lo2"), ivs("hi"))
        parity(ivs.join(ivs2, oCond), width, s"overlap seed=$seed")

        // timestamp domain: same shapes through the epoch-seconds map
        val tp = pts.select($"pid",
          timestamp_millis((($"p" * 1000).cast("long")) + 1700000000000L).as("t"))
        val ti = ivs.select($"band",
          timestamp_millis((($"lo" * 1000).cast("long")) + 1700000000000L).as("ws"),
          timestamp_millis((($"hi" * 1000).cast("long")) + 1700000000000L).as("we"))
        val tCond = cmp(r, ti("ws"), tp("t")) && cmp(r, tp("t"), ti("we"))
        parity(tp.join(ti, tCond), width, s"timestamp seed=$seed")
      } finally { pts.unpersist(); ivs.unpersist(); () }
    }
  }
}
