package graft

import graft.layout.ZOrder
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {

  test("zValue interleaves bits exactly (reference Morton)") {
    import spark.implicits._
    def morton(vals: Seq[Long], bits: Int): Long = {
      val d = vals.size
      var z = 0L
      for (i <- 0 until bits; j <- 0 until d)
        z |= ((vals(j) >> i) & 1L) << (i * d + j)
      z
    }
    val rnd = new scala.util.Random(42)
    val rows = Seq.fill(200)((rnd.nextInt(4096).toLong,
      rnd.nextInt(4096).toLong, rnd.nextInt(4096).toLong))
    val got = rows.toDF("a", "b", "c")
      .select(ZOrder.zValue(Seq(col("a"), col("b"), col("c")), 12).as("z"))
      .collect().map(_.getLong(0)).toSeq
    val want = rows.map { case (a, b, c) => morton(Seq(a, b, c), 12) }
    assert(got == want)
    // 2-dim flavor too (different stride)
    val got2 = rows.toDF("a", "b", "c")
      .select(ZOrder.zValue(Seq(col("a"), col("b")), 12).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(got2 == rows.map { case (a, b, _) => morton(Seq(a, b), 12) })
  }

  test("bucketize: integer-exact, clamped, degenerate span safe") {
    import spark.implicits._
    val lo = 1700000000000L
    val hi = 1700009999999L // ~1e7 span
    val vals = Seq(lo - 5, lo, lo + 1234567L, hi - 1, hi, hi + 99)
    val got = vals.toDF("v")
      .select(ZOrder.bucketize(col("v"), lo, hi, 12).as("b"))
      .collect().map(_.getLong(0)).toSeq
    val span = BigInt(hi - lo)
    def ref(v: Long): Long = {
      val c = math.min(hi, math.max(lo, v))
      ((BigInt(c - lo) * 4095) / span).toLong
    }
    assert(got == vals.map(ref))
    assert(got.head == 0 && got(4) == 4095 && got(5) == 4095) // clamps
    // zero span: everything lands in bucket 0
    val deg = Seq(7L, 7L).toDF("v")
      .select(ZOrder.bucketize(col("v"), 7L, 7L, 12)).collect().map(_.getLong(0))
    assert(deg.forall(_ == 0L))
  }

  test("z-order layout prunes box scans on EVERY interleaved dimension") {
    import spark.implicits._
    val n = 200000L
    // y = the natural sort axis (time-like); x = uncorrelated (user-like)
    val data = spark.range(n).select(
      $"id".as("y"),
      pmod(hash($"id"), lit(100000)).cast("long").as("x"),
      ($"id" * 7 % 997).as("payload"))

    val natDir = java.nio.file.Files.createTempDirectory("zo_nat").toString
    val zDir = java.nio.file.Files.createTempDirectory("zo_z").toString
    // natural: range-sorted on y only (what a time-partitioned table gives)
    data.repartitionByRange(256, $"y").sortWithinPartitions("y")
      .write.mode("overwrite").parquet(natDir)
    // z-order on (x, y)
    ZOrder.zorder(data, Seq("x", "y"), bits = 12, numPartitions = 256)
      .write.mode("overwrite").parquet(zDir)

    def scanRows(dir: String, pred: org.apache.spark.sql.Column): (Long, Long) = {
      val q = spark.read.parquet(dir).filter(pred)
      // execute THIS dataset's plan (count() would build a different one
      // whose metrics this queryExecution never sees)
      val res = q.collect().length.toLong
      val scanned = q.queryExecution.executedPlan.collectLeaves()
        .map(_.metrics("numOutputRows").value).sum
      (res, scanned)
    }

    // x-only box: the y-sorted layout cannot prune it at all
    val xPred = $"x" >= 1000L && $"x" < 3000L
    val (natXRes, natXScan) = scanRows(natDir, xPred)
    val (zXRes, zXScan) = scanRows(zDir, xPred)
    assert(natXRes == zXRes, "layouts must return identical results")
    info(s"x-box: natural scanned $natXScan, z-order scanned $zXScan")
    assert(zXScan * 4 <= natXScan,
      s"z-order should prune the un-sorted dimension ≥4×: $zXScan vs $natXScan")

    // y-only box: z-order still prunes (locality is preserved per dim)
    val yPred = $"y" >= 50000L && $"y" < 60000L
    val (natYRes, natYScan) = scanRows(natDir, yPred)
    val (zYRes, zYScan) = scanRows(zDir, yPred)
    assert(natYRes == zYRes)
    info(s"y-box: natural scanned $natYScan, z-order scanned $zYScan")
    assert(zYScan * 4 <= n,
      s"z-order lost y locality entirely: scanned $zYScan of $n")

    // 2-D box: compounding selectivity
    val (natBRes, natBScan) = scanRows(natDir, xPred && yPred)
    val (zBRes, zBScan) = scanRows(zDir, xPred && yPred)
    assert(natBRes == zBRes)
    info(s"xy-box: natural scanned $natBScan, z-order scanned $zBScan")
    assert(zBScan <= natBScan,
      s"z-order must not scan more than the 1-D layout on a 2-D box")
  }
}
