package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Scratch decomposition (not part of the driver contract): split one
  * query's wall time into fn() (driver-side actions + plan construction),
  * plan compilation of the returned frame, and execution via the noop
  * sink — so an optimization targets the right phase.
  * Usage: sbt 'runMain graft.tools.QueryProbe <name> [sfDir] [cpus]'.
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: QueryProbe <name> [sfDir] [cpus]")
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = if (args.length > 2) args(2) else "32"
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", false)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .appName("query-probe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup
    try {
      spark.range(1000000).selectExpr("sum(id)").collect()
      SparkEntry.queries("q1_agg")(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
    } catch { case _: Throwable => () }
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sfDir)
      val t1 = System.nanoTime()
      df.queryExecution.executedPlan // force analysis + optimization
      val t2 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      val t3 = System.nanoTime()
      println(f"[probe] $name run$i fn=${(t1 - t0) / 1e9}%.2fs " +
        f"plan=${(t2 - t1) / 1e9}%.2fs exec=${(t3 - t2) / 1e9}%.2fs " +
        f"total=${(t3 - t0) / 1e9}%.2fs")
      graft.Bench.drainBlocks(spark)
    }
    spark.stop()
  }
}
