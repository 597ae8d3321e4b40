package graft

import graft.operators.AsOfJoin
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {
  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("as-of join picks the latest right row at or before the left time") {
    import spark.implicits._
    val trades = Seq(
      ("A", ts("2024-01-01 10:00:05"), 100.0),
      ("A", ts("2024-01-01 10:00:00"), 99.0), // exactly at a quote time
      ("B", ts("2024-01-01 10:00:01"), 50.0),
      ("C", ts("2024-01-01 10:00:01"), 10.0)) // no quotes for C
      .toDF("sym", "trade_ts", "price")
    val quotes = Seq(
      ("A", ts("2024-01-01 10:00:00"), 98.5),
      ("A", ts("2024-01-01 10:00:03"), 98.9),
      ("A", ts("2024-01-01 10:00:06"), 99.9), // after both trades
      ("B", ts("2024-01-01 09:59:00"), 49.5))
      .toDF("sym", "quote_ts", "bid")

    val out = AsOfJoin.asOfJoin(trades, quotes, Seq("sym"), "trade_ts", "quote_ts")
      .collect().map(r => (r.getString(0), r.getAs[java.sql.Timestamp]("trade_ts"),
        Option(r.getAs[java.lang.Double]("bid")).map(_.doubleValue))).toSet
    assert(out == Set(
      ("A", ts("2024-01-01 10:00:05"), Some(98.9)),
      ("A", ts("2024-01-01 10:00:00"), Some(98.5)), // >= semantics: equal matches
      ("B", ts("2024-01-01 10:00:01"), Some(49.5)),
      ("C", ts("2024-01-01 10:00:01"), None)))
  }

  test("tolerance nulls out stale matches") {
    import spark.implicits._
    val l = Seq(("A", ts("2024-01-01 12:00:00"), 1)).toDF("k", "lt", "v")
    val r = Seq(("A", ts("2024-01-01 10:00:00"), 7)).toDF("k", "rt", "w")
    val within = AsOfJoin.asOfJoin(l, r, Seq("k"), "lt", "rt",
      Some(expr("INTERVAL 3 HOURS"))).head()
    assert(within.getAs[java.lang.Integer]("w") == 7)
    val stale = AsOfJoin.asOfJoin(l, r, Seq("k"), "lt", "rt",
      Some(expr("INTERVAL 1 HOUR"))).head()
    assert(stale.getAs[java.lang.Integer]("w") == null)
  }

  test("range join equals the naive inequality join, without a cross product") {
    import spark.implicits._
    import graft.operators.RangeJoin
    val points = (1 to 500).map(i => (i.toLong, i * 7.3 % 100)).toDF("id", "p")
    val intervals = (0 until 40).map(i => (i.toLong, i * 2.5, i * 2.5 + 6.0))
      .toDF("band", "lo", "hi") // overlapping intervals
    val fast = RangeJoin.rangeJoin(points, "p", intervals, "lo", "hi", bucketWidth = 5.0)
      .select($"id", $"band").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = points.join(intervals, $"p" >= $"lo" && $"p" < $"hi")
      .select($"id", $"band").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fast == naive && fast.nonEmpty)
    // plan stays an equi-join on the bucket key — no cartesian/BNLJ
    val plan = RangeJoin.rangeJoin(points, "p", intervals, "lo", "hi", 5.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Cartesian") && !plan.contains("BroadcastNestedLoop"))
  }

  test("overlap join equals the naive interval-intersection join, once per pair") {
    import spark.implicits._
    import graft.operators.RangeJoin
    // messy intervals: long/short/degenerate (lo==hi), malformed (lo>hi),
    // null bounds; widths misaligned with the bucket width
    val left = (0 until 300).map { i =>
      val lo = i * 3.7 % 120
      (i.toLong, if (i % 41 == 0) null else java.lang.Double.valueOf(lo),
        if (i % 53 == 0) java.lang.Double.valueOf(lo - 5) // malformed
        else java.lang.Double.valueOf(lo + (i % 7) * 4.1))
    }.toDF("lid", "llo", "lhi")
    val right = (0 until 200).map { i =>
      val lo = i * 5.3 % 120
      (i.toLong, java.lang.Double.valueOf(lo),
        java.lang.Double.valueOf(if (i % 29 == 0) lo else lo + 9.0))
    }.toDF("rid", "rlo", "rhi")

    val fast = RangeJoin.overlapJoin(left, "llo", "lhi", right, "rlo", "rhi",
        bucketWidth = 6.0)
      .select($"lid", $"rid").collect().map(r => (r.getLong(0), r.getLong(1)))
    // operator semantics: malformed lo>hi = empty interval (the raw
    // predicate alone would emit them against a wide-enough partner)
    val naive = left.where($"llo" <= $"lhi")
      .join(right.where($"rlo" <= $"rhi"), $"llo" < $"rhi" && $"rlo" < $"lhi")
      .select($"lid", $"rid").collect().map(r => (r.getLong(0), r.getLong(1)))
    // exact multiset equality: each overlapping pair surfaces exactly once
    assert(fast.sorted.toSeq == naive.sorted.toSeq && fast.nonEmpty)

    val plan = RangeJoin.overlapJoin(left, "llo", "lhi", right, "rlo", "rhi", 6.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Cartesian") && !plan.contains("BroadcastNestedLoop"))
  }

  test("suggestBucketWidth: median interval length, robust to outliers and junk") {
    import spark.implicits._
    import graft.operators.RangeJoin
    // 99 width-10 intervals + one width-100000 outlier + malformed + null
    val iv = ((0 until 99).map(i => (i * 5.0, i * 5.0 + 10.0)) ++
      Seq((0.0, 100000.0), (50.0, 40.0))).toDF("lo", "hi")
      .unionByName(Seq((Option.empty[Double], Option(1.0))).toDF("lo", "hi"))
    val w = RangeJoin.suggestBucketWidth(iv, "lo", "hi")
    assert(w >= 9.0 && w <= 11.0, s"width $w")
    assert(RangeJoin.suggestBucketWidth(iv.limit(0), "lo", "hi") == 1.0)
  }

  test("matches brute-force as-of on real events (purchases → prior click)") {
    import spark.implicits._
    val evRaw = sf("events")
    val ev = evRaw.select($"event_id", $"user_id",
      SparkEntry.tsTimestamp(evRaw).as("ts"), $"event_type")
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"ts", $"event_id")
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id", $"ts".as("click_ts"), $"event_id".as("click_id"))

    val fast = AsOfJoin.asOfJoin(purchases, clicks, Seq("user_id"), "ts", "click_ts")
      .select($"event_id", $"click_id").collect()
      .map(r => r.getLong(0) -> Option(r.getAs[java.lang.Long]("click_id"))).toMap

    // brute force: max click_ts <= ts per purchase via join + groupBy
    val brute = purchases.join(clicks, Seq("user_id"))
      .where($"click_ts" <= $"ts")
      .groupBy($"event_id")
      .agg(max(struct($"click_ts", $"click_id")).as("m"))
      .select($"event_id", $"m.click_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

    assert(fast.size == purchases.count())
    brute.foreach { case (eid, cid) => assert(fast(eid).contains(cid), s"event $eid") }
    fast.foreach { case (eid, cid) => if (cid.isEmpty) assert(!brute.contains(eid)) }
  }

  test("segmented windows tame a hot key: identical output, bounded partitions") {
    import spark.implicits._
    // planted skew: ONE user owns 20% of all events (the window-partition
    // hazard AQE cannot split — skew-join handling only covers joins)
    val n = 10000
    val hotShare = n / 5
    val events = ((0 until hotShare).map(i => (1L, i.toLong * 7919 % 99991, i % 3 == 0)) ++
      (hotShare until n).map(i => (2L + i % 500, i.toLong * 6101 % 99991, i % 3 == 0)))
      .zipWithIndex.map { case ((u, t, isP), i) => (i.toLong, u, t, isP) }
      .toDF("event_id", "user_id", "t", "is_purchase")
    val purchases = events.where($"is_purchase")
      .select($"user_id", $"t", $"event_id")
    val clicks = events.where(!$"is_purchase")
      .select($"user_id", $"t".as("click_t"), $"event_id".as("click_id"))

    def result(buckets: Int) = AsOfJoin.asOfJoin(purchases, clicks,
        Seq("user_id"), "t", "click_t", skewBuckets = buckets)
      .select($"event_id", $"click_id").collect()
      .map(r => r.getLong(0) -> Option(r.getAs[java.lang.Long]("click_id")))
      .toMap

    // parity: the segmented plan is bit-identical to the single-window one
    val single = result(1)
    assert(result(8) == single)
    assert(result(32) == single)
    // more buckets than distinct times still agrees (degenerate segments)
    assert(result(997) == single)

    // bounded partitions: the hot key's window work is the max (key,
    // bucket) group — with 8 time buckets no task sees more than ~1/8th
    // of the hot key's rows (2× slack for non-uniform time)
    val hotRows = events.where($"user_id" === 1L).count()
    val maxGroup = events
      .withColumn("_b", least(lit(7), greatest(lit(0),
        floor($"t".cast("double") / 99991.0 * 8).cast("int"))))
      .groupBy($"user_id", $"_b").count()
      .agg(max($"count")).head().getLong(0)
    assert(maxGroup <= hotRows / 8 * 2,
      s"hot key not spread: max group $maxGroup of $hotRows hot rows")

    // carry across right-empty buckets: clicks only at early times, a late
    // purchase many empty buckets away still finds the old click
    val lateL = Seq((9L, 1000L, 100L)).toDF("user_id", "t", "event_id")
    val earlyR = Seq((9L, 1L, 200L)).toDF("user_id", "click_t", "click_id")
    val carried = AsOfJoin.asOfJoin(lateL, earlyR, Seq("user_id"), "t",
        "click_t", skewBuckets = 16)
      .head().getAs[java.lang.Long]("click_id")
    assert(carried == 200L)

    // the timestamp edge cases from the basic test hold under bucketing
    val trades = Seq(
      ("A", ts("2024-01-01 10:00:05"), 100.0),
      ("A", ts("2024-01-01 10:00:00"), 99.0),
      ("B", ts("2024-01-01 10:00:01"), 50.0),
      ("C", ts("2024-01-01 10:00:01"), 10.0))
      .toDF("sym", "trade_ts", "price")
    val quotes = Seq(
      ("A", ts("2024-01-01 10:00:00"), 98.5),
      ("A", ts("2024-01-01 10:00:03"), 98.9),
      ("A", ts("2024-01-01 10:00:06"), 99.9),
      ("B", ts("2024-01-01 09:59:00"), 49.5))
      .toDF("sym", "quote_ts", "bid")
    val a = AsOfJoin.asOfJoin(trades, quotes, Seq("sym"), "trade_ts", "quote_ts")
      .collect().map(_.toSeq).toSet
    val b = AsOfJoin.asOfJoin(trades, quotes, Seq("sym"), "trade_ts", "quote_ts",
        skewBuckets = 4)
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("auto mode: planted hot key engages segmented buckets; uniform keys stay single-window") {
    import spark.implicits._
    val n = 10000
    val hotShare = n / 5
    val events = ((0 until hotShare).map(i => (1L, i.toLong * 7919 % 99991, i % 3 == 0)) ++
      (hotShare until n).map(i => (2L + i % 500, i.toLong * 6101 % 99991, i % 3 == 0)))
      .zipWithIndex.map { case ((u, t, isP), i) => (i.toLong, u, t, isP) }
      .toDF("event_id", "user_id", "t", "is_purchase")
    val purchases = events.where($"is_purchase")
      .select($"user_id", $"t", $"event_id")
    val clicks = events.where(!$"is_purchase")
      .select($"user_id", $"t".as("click_t"), $"event_id".as("click_id"))

    // the probe sees the 20%-share key and the policy picks >1 bucket
    val total = purchases.count() + clicks.count()
    val share = AsOfJoin.probeTopKeyShare(purchases, clicks, Seq("user_id"), total)
    assert(share > 0.1, s"probe missed the planted 20% key: $share")
    assert(AsOfJoin.chooseSkewBuckets(share, parallelism = 32) > 1)

    // uniform corpus: probe share is tiny, policy stays at 1
    val uni = spark.range(0, 5000).select(($"id" % 500).as("user_id"),
      ($"id" * 31 % 9973).as("t"))
    val uniShare = AsOfJoin.probeTopKeyShare(uni, uni, Seq("user_id"), 10000)
    assert(AsOfJoin.chooseSkewBuckets(uniShare, parallelism = 32) == 1,
      s"uniform keys must not pay the segmented plan: share=$uniShare")

    // pure policy pins
    assert(AsOfJoin.chooseSkewBuckets(0.0, 32) == 1)
    assert(AsOfJoin.chooseSkewBuckets(0.2, 32) == 7)   // ceil(6.4)
    assert(AsOfJoin.chooseSkewBuckets(1.0, 1000) == 32) // capped
    assert(AsOfJoin.chooseSkewBuckets(0.06, 16) == 2)  // floor of 2
    assert(AsOfJoin.chooseSkewBuckets(Double.NaN, 32) == 1)

    // end-to-end: auto (probe + hot-row floor forced on) matches the
    // single-window plan exactly on the skewed corpus; the default
    // minHotRows floor would (correctly) keep this small corpus on the
    // single-window plan — the measured crossover is in SCALE.md
    val auto = AsOfJoin.asOfJoinAuto(purchases, clicks, Seq("user_id"),
        "t", "click_t", minProbeRows = 1, minHotRows = 1)
      .select($"event_id", $"click_id").collect()
      .map(r => r.getLong(0) -> Option(r.getAs[java.lang.Long]("click_id")))
      .toMap
    val single = AsOfJoin.asOfJoin(purchases, clicks, Seq("user_id"),
        "t", "click_t", skewBuckets = 1)
      .select($"event_id", $"click_id").collect()
      .map(r => r.getLong(0) -> Option(r.getAs[java.lang.Long]("click_id")))
      .toMap
    assert(auto == single)
  }

  test("segmented mode: null keys, null right times, NTZ domain all match single-window") {
    import spark.implicits._
    // ANSI join semantics (drill wave 10, matching SQL ASOF / the DuckDB
    // oracle): a NULL join key satisfies no equality and a NULL right
    // time no `<=`, so right rows carrying either match NOTHING and
    // left rows carrying either match nothing but still appear (left
    // join). The window formulation would otherwise invent its own
    // rules (partitionBy groups NULL keys; NULL times sort first).
    val l = Seq(
      (Option(1L), 10L, 1L),
      (Option.empty[Long], 90L, 2L), // null key: no match, row kept
      (Option.empty[Long], 5L, 3L),  // null key: no match, row kept
      (Option(5L), 95L, 4L))         // key whose only right row has a null time
      .toDF("user_id", "t", "event_id")
    val r = Seq(
      (Option(1L), Option(8L), 10L),
      (Option.empty[Long], Option(7L), 20L), // null key: unmatchable
      (Option(5L), Option.empty[Long], 50L)) // null time: unmatchable
      .toDF("user_id", "click_t", "click_id")

    def result(buckets: Int) = AsOfJoin.asOfJoin(l, r, Seq("user_id"), "t",
        "click_t", skewBuckets = buckets)
      .collect()
      .map(row => row.getLong(row.fieldIndex("event_id")) ->
        Option(row.getAs[java.lang.Long]("click_id")).map(_.longValue))
      .toMap

    val single = result(1)
    assert(single == Map(1L -> Some(10L), 2L -> None, 3L -> None,
      4L -> None))
    assert(result(8) == single)
    assert(result(32) == single)

    // TimestampNTZ time domain: NTZ has no numeric cast — the segmented
    // bucketing must route through the wall-clock field extraction
    val trades = Seq(
      ("A", ts("2024-01-01 10:00:05"), 100.0),
      ("A", ts("2024-01-01 10:00:00"), 99.0),
      ("B", ts("2024-01-01 10:00:01"), 50.0),
      ("C", ts("2024-01-01 10:00:01"), 10.0))
      .toDF("sym", "trade_ts", "price")
      .withColumn("trade_ts", $"trade_ts".cast("timestamp_ntz"))
    val quotes = Seq(
      ("A", ts("2024-01-01 10:00:00"), 98.5),
      ("A", ts("2024-01-01 10:00:03"), 98.9),
      ("A", ts("2024-01-01 10:00:06"), 99.9),
      ("B", ts("2024-01-01 09:59:00"), 49.5))
      .toDF("sym", "quote_ts", "bid")
      .withColumn("quote_ts", $"quote_ts".cast("timestamp_ntz"))
    val a = AsOfJoin.asOfJoin(trades, quotes, Seq("sym"), "trade_ts", "quote_ts")
      .collect().map(_.toSeq).toSet
    val b = AsOfJoin.asOfJoin(trades, quotes, Seq("sym"), "trade_ts", "quote_ts",
        skewBuckets = 4)
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }
}
