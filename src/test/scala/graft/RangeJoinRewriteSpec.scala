package graft

import graft.plans.RangeJoinRewrite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The Catalyst range-join rewrite: parity with the naive plan on messy
  * inputs (nulls, empty/degenerate intervals, duplicates), plan-shape
  * pins (no nested-loop join once enabled), and conjunct preservation.
  */
class RangeJoinRewriteSpec extends SparkSpec {

  GraftExtensions.register(spark)
  import spark.implicits._

  /** Deterministic messy points: values in [-2000, 6000) plus nulls. */
  private def points: DataFrame =
    spark.range(0, 400).select($"id".as("pid"),
      when($"id" % 37 === 0, lit(null).cast("double"))
        .otherwise((hash($"id".cast("string")).cast("double") % 4000.0) + 2000.0)
        .as("p"))

  /** Bands with overlap, a null-lo band, a lo>hi band, and a lo==hi band. */
  private def intervals: DataFrame =
    spark.range(0, 50).select($"id".as("band"),
      when($"id" === 48, lit(null).cast("double"))
        .otherwise($"id" * 120.0 - 2000.0).as("lo"),
      when($"id" === 47, $"id" * 120.0 - 2300.0) // lo > hi: unsatisfiable
        .when($"id" === 46, $"id" * 120.0 - 2000.0) // lo == hi
        .otherwise($"id" * 120.0 - 1700.0).as("hi"))

  private def withWidth[T](w: Double)(body: => T): T = {
    spark.conf.set(RangeJoinRewrite.WidthConf, w.toString)
    try body finally spark.conf.unset(RangeJoinRewrite.WidthConf)
  }

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def parity(query: => DataFrame): Unit = {
    val naive = sortedRows(query) // conf unset: rule is a no-op
    val rewritten = withWidth(300.0) {
      val df = query
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoop"), plan)
      assert(!plan.contains("CartesianProduct"), plan)
      sortedRows(df)
    }
    assert(rewritten == naive)
  }

  test("parity on inner join, half-open interval (>= lo, < hi)") {
    parity(points.join(intervals, $"p" >= $"lo" && $"p" < $"hi"))
  }

  test("parity on closed interval with swapped operand order") {
    parity(points.join(intervals, $"lo" <= $"p" && $"hi" >= $"p"))
  }

  test("parity on fully strict bounds") {
    parity(points.join(intervals, $"p" > $"lo" && $"p" < $"hi"))
  }

  test("extra conjuncts ride along (composite condition)") {
    parity(points.join(intervals,
      $"p" >= $"lo" && $"p" < $"hi" && ($"pid" % 3 === $"band" % 3)))
  }

  test("parity on timestamp domains (incl. TIMESTAMP_NTZ), width in seconds") {
    val base = 1700000000000L
    val pts = spark.range(0, 500).select($"id".as("pid"),
      timestamp_millis(lit(base) + $"id" * 97000).as("t"))
    val ivs = spark.range(0, 30).select($"id".as("w"),
      timestamp_millis(lit(base) + $"id" * 1500000).as("ws"),
      timestamp_millis(lit(base) + $"id" * 1500000 + 3000000).as("we"))
    parity(pts.join(ivs, $"t" >= $"ws" && $"t" < $"we"))
    // NTZ routes through TimestampType with the session tz on both sides
    val ptsN = pts.select($"pid", $"t".cast("timestamp_ntz").as("t"))
    val ivsN = ivs.select($"w", $"ws".cast("timestamp_ntz").as("ws"),
      $"we".cast("timestamp_ntz").as("we"))
    parity(ptsN.join(ivsN, $"t" >= $"ws" && $"t" < $"we"))
  }

  /** Messy interval pair for the overlap rewrite: long/short/degenerate
    * (lo==hi), malformed (lo>hi — which the rule must keep emitting when
    * the raw predicate accepts them), null bounds.
    */
  private def leftIntervals: DataFrame =
    spark.range(0, 300).select($"id".as("lid"),
      when($"id" % 41 === 0, lit(null).cast("double"))
        .otherwise(($"id" * 3.7) % 120.0).as("llo"))
      .withColumn("lhi",
        when($"lid" % 53 === 0, $"llo" - 25.0) // malformed: lo > hi
          .otherwise($"llo" + ($"lid" % 7) * 4.1))

  private def rightIntervals: DataFrame =
    spark.range(0, 200).select($"id".as("rid"),
      (($"id" * 5.3) % 120.0).as("rlo"))
      .withColumn("rhi",
        when($"rid" % 29 === 0, $"rlo") // degenerate: lo == hi
          .otherwise($"rlo" + 9.0))

  test("overlap rewrite: exact raw-predicate parity, incl. malformed intervals") {
    parity(leftIntervals.join(rightIntervals,
      $"llo" < $"rhi" && $"rlo" < $"lhi"))
  }

  test("overlap rewrite: non-strict bounds and extra conjuncts preserved") {
    parity(leftIntervals.join(rightIntervals,
      $"llo" <= $"rhi" && $"rlo" <= $"lhi" && ($"lid" % 2 === $"rid" % 2)))
  }

  test("overlap rewrite: swapped conjunct order and operand direction") {
    parity(leftIntervals.join(rightIntervals,
      $"lhi" > $"rlo" && $"rhi" > $"llo"))
  }

  test("naive plan IS a nested-loop join (the rewrite changes something)") {
    val plan = points.join(intervals, $"p" >= $"lo" && $"p" < $"hi")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoop") || plan.contains("CartesianProduct"), plan)
  }

  test("rule is inert for non-range joins and when disabled") {
    // equi-join: same canonical plan with and without the width conf
    // (exprIds churn between two builds, so compare canonicalized)
    val before = points.join(intervals, $"pid" === $"band")
      .queryExecution.optimizedPlan.canonicalized.toString
    val after = withWidth(300.0) {
      points.join(intervals, $"pid" === $"band")
        .queryExecution.optimizedPlan.canonicalized.toString
    }
    assert(before == after)
  }

  test("SQL path through temp views matches the naive result") {
    points.createOrReplaceTempView("rj_points")
    intervals.createOrReplaceTempView("rj_intervals")
    val sql =
      """SELECT band, count(*) AS n, round(sum(p), 2) AS sum_p
        |FROM rj_points JOIN rj_intervals
        |  ON p >= lo AND p < hi
        |GROUP BY band ORDER BY band""".stripMargin
    val naive = sortedRows(spark.sql(sql))
    val rewritten = withWidth(120.0) {
      val df = spark.sql(sql)
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoop"), plan)
      sortedRows(df)
    }
    assert(rewritten == naive)
  }

  test("randomized parity across seeds and widths (point and overlap paths)") {
    for (seed <- Seq(1, 2); w <- Seq(3.0, 77.0, 5000.0)) {
      val pts = spark.range(0, 250).select($"id".as("pid"),
        (rand(seed) * 2000.0 - 500.0).as("p"))
      val ivs = spark.range(0, 60).select($"id".as("band"),
        (rand(seed + 100) * 1800.0 - 400.0).as("lo"))
        .withColumn("hi", $"lo" + rand(seed + 200) * 120.0 - 10.0) // some lo>hi
      // cache so both the naive and rewritten runs see identical rand draws
      pts.cache().count(); ivs.cache().count()
      try {
        val naiveP = sortedRows(pts.join(ivs, $"p" >= $"lo" && $"p" < $"hi"))
        val fastP = withWidth(w) {
          sortedRows(pts.join(ivs, $"p" >= $"lo" && $"p" < $"hi"))
        }
        assert(fastP == naiveP, s"point path seed=$seed w=$w")
        val ivs2 = ivs.select($"band".as("b2"), $"lo".as("lo2"), $"hi".as("hi2"))
        val naiveO = sortedRows(ivs.join(ivs2, $"lo" < $"hi2" && $"lo2" < $"hi"))
        val fastO = withWidth(w) {
          sortedRows(ivs.join(ivs2, $"lo" < $"hi2" && $"lo2" < $"hi"))
        }
        assert(fastO == naiveO, s"overlap path seed=$seed w=$w")
      } finally { pts.unpersist(); ivs.unpersist() }
    }
  }

  test("skips joins that already carry a cross-side equality (existing hash join)") {
    // Catalyst already plans `key = key AND range` as a hash join with the
    // range as residual — the rewrite would only add an explode
    val before = points.join(intervals,
        $"pid" % 7 === $"band" % 7 && $"p" >= $"lo" && $"p" < $"hi")
      .queryExecution.optimizedPlan.canonicalized.toString
    val after = withWidth(300.0) {
      points.join(intervals,
          $"pid" % 7 === $"band" % 7 && $"p" >= $"lo" && $"p" < $"hi")
        .queryExecution.optimizedPlan.canonicalized.toString
    }
    assert(before == after)
    // ... which also keeps it off RangeJoin.rangeJoin's own bucketed output
    val manual = withWidth(300.0) {
      graft.operators.RangeJoin.rangeJoin(points, "p", intervals, "lo", "hi", 300.0)
        .queryExecution.optimizedPlan.toString
    }
    assert(!manual.contains("_graft_rj_"), manual)
  }

  test("RANGE_JOIN hint on a join input activates the rewrite with NO session conf") {
    assert(spark.conf.getOption(RangeJoinRewrite.WidthConf).isEmpty,
      "precondition: the session-global conf must be unset")
    val cond = $"p" >= $"lo" && $"p" < $"hi"
    val naive = sortedRows(points.join(intervals, cond))
    val df = points.hint("range_join", 300.0).join(intervals, cond)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop") &&
      !plan.contains("CartesianProduct"), plan)
    assert(sortedRows(df) == naive)
  }

  test("SQL RANGE_JOIN hint is per-query: the unhinted twin stays naive") {
    points.createOrReplaceTempView("rjh_points")
    intervals.createOrReplaceTempView("rjh_intervals")
    val body =
      """SELECT band, count(*) AS n, round(sum(p), 2) AS sum_p
        |FROM rjh_points JOIN rjh_intervals ON p >= lo AND p < hi
        |GROUP BY band ORDER BY band""".stripMargin
    val hinted = spark.sql(body.replace("SELECT", "SELECT /*+ RANGE_JOIN(120) */"))
    val hintedPlan = hinted.queryExecution.executedPlan.toString
    assert(!hintedPlan.contains("BroadcastNestedLoop") &&
      !hintedPlan.contains("CartesianProduct"), hintedPlan)
    // scoping: nothing leaked into the session — the SAME query without
    // the hint still plans the nested loop
    val unhinted = spark.sql(body)
    val unhintedPlan = unhinted.queryExecution.executedPlan.toString
    assert(unhintedPlan.contains("BroadcastNestedLoop") ||
      unhintedPlan.contains("CartesianProduct"), unhintedPlan)
    assert(sortedRows(hinted) == sortedRows(unhinted))
  }

  test("RANGE_JOIN hint: overlap joins rewrite too, and timestamp widths are seconds") {
    val base = 1700000000000L
    val pts = spark.range(0, 300).select($"id".as("pid"),
      timestamp_millis(lit(base) + $"id" * 91000).as("t"))
    val ivs = spark.range(0, 25).select($"id".as("w"),
      timestamp_millis(lit(base) + $"id" * 1200000).as("ws"),
      timestamp_millis(lit(base) + $"id" * 1200000 + 2500000).as("we"))
    val cond = pts("t") >= ivs("ws") && pts("t") < ivs("we")
    val naive = sortedRows(pts.join(ivs, cond))
    val df = pts.join(ivs.hint("range_join", 2500), cond) // hint on EITHER side
    assert(!df.queryExecution.executedPlan.toString.contains("BroadcastNestedLoop"))
    assert(sortedRows(df) == naive)
  }

  test("hint with no eligible join underneath is dropped cleanly") {
    val df = points.hint("range_join", 10.0).agg(count(lit(1)))
    assert(df.collect().head.getLong(0) == 400)
  }

  test("hint rejects a non-numeric or missing width loudly") {
    val e = intercept[Exception] {
      points.hint("range_join", "not-a-number")
        .join(intervals, $"p" >= $"lo" && $"p" < $"hi")
        .queryExecution.analyzed
    }
    assert(e.getMessage.contains("RANGE_JOIN"), e.getMessage)
    val e2 = intercept[Exception] {
      points.hint("range_join").join(intervals, $"p" >= $"lo")
        .queryExecution.analyzed
    }
    assert(e2.getMessage.contains("RANGE_JOIN"), e2.getMessage)
  }

  test("malformed width conf disables the rule instead of breaking the session") {
    spark.conf.set(RangeJoinRewrite.WidthConf, "1,500")
    try {
      val naive = sortedRows(points.join(intervals, $"p" >= $"lo" && $"p" < $"hi"))
      assert(naive.nonEmpty) // optimization didn't throw
      val plan = points.join(intervals, $"p" >= $"lo" && $"p" < $"hi")
        .queryExecution.optimizedPlan.toString
      assert(!plan.contains("_graft_rj_"), plan)
    } finally spark.conf.unset(RangeJoinRewrite.WidthConf)
  }

  test("NTZ bucketing is DST-safe: parity under a DST-gapped session timezone") {
    val prevTz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try {
      // NTZ wall-clock times spanning the 2026-03-08 02:00 spring-forward
      // gap; a session-tz epoch map is non-monotone here, UTC is not
      val base = java.time.LocalDateTime.of(2026, 3, 8, 0, 0)
        .toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L
      val pts = spark.range(0, 60).select($"id".as("pid"),
        timestamp_micros(lit(base) + $"id" * 300000000L) // 5-min steps
          .cast("timestamp_ntz").as("t"))
      val ivs = spark.range(0, 8).select($"id".as("w"),
        timestamp_micros(lit(base) + $"id" * 3600000000L).cast("timestamp_ntz").as("ws"),
        timestamp_micros(lit(base) + ($"id" * 3600L + 5400L) * 1000000L)
          .cast("timestamp_ntz").as("we")) // 1.5h windows, 1h step
      val naive = sortedRows(pts.join(ivs, $"t" >= $"ws" && $"t" < $"we"))
      val fast = withWidth(900.0) {
        sortedRows(pts.join(ivs, $"t" >= $"ws" && $"t" < $"we"))
      }
      assert(fast == naive && naive.nonEmpty)
    } finally spark.conf.set("spark.sql.session.timeZone", prevTz)
  }

  test("pathological interval spans fail loudly with the conf key, not an OOM") {
    val pts = spark.range(0, 10).select($"id".as("pid"), ($"id" * 1.0).as("p"))
    val ivs = spark.range(0, 3).select($"id".as("band"),
      ($"id" * 1.0).as("lo"), ($"id" * 1.0 + 1.0e12).as("hi"))
    val e = intercept[Exception] {
      withWidth(0.001) {
        pts.join(ivs, $"p" >= $"lo" && $"p" < $"hi").collect()
      }
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains(RangeJoinRewrite.MaxBandsConf)),
      messages(e).mkString(" | "))
  }

  test("inner-join multiplicity: duplicate points and intervals surface once per pair") {
    val dupPoints = points.unionAll(points)
    val dupIntervals = intervals.unionAll(intervals)
    val naive = sortedRows(
      dupPoints.join(dupIntervals, $"p" >= $"lo" && $"p" < $"hi")
        .groupBy($"band").agg(count(lit(1)).as("n")))
    val rewritten = withWidth(77.0) { // width deliberately misaligned
      sortedRows(
        dupPoints.join(dupIntervals, $"p" >= $"lo" && $"p" < $"hi")
          .groupBy($"band").agg(count(lit(1)).as("n")))
    }
    assert(rewritten == naive)
  }
}
