package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SimpleMode

/** Scratch audit (not part of the driver contract): one-line plan-shape
  * fingerprint per registered query — exchange/join/aggregate operator
  * counts — so an optimization round can sweep the WHOLE surface for
  * red-flag shapes (product joins, sort-agg fallbacks, unexpected
  * exchanges or cache scans) instead of auditing only the slowest few.
  * Usage: sbt 'runMain graft.tools.PlanSweep [sfDir]'.
  */
object PlanSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[8]")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", false)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .appName("plan-sweep").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def count(p: String, tok: String): Int =
      p.sliding(tok.length).count(_ == tok)
    println(f"${"query"}%-28s exch union sortagg smj bnlj cart inmem window")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, q) =>
      try {
        val p = q(spark, sfDir).queryExecution.explainString(SimpleMode)
        println(f"$name%-28s ${count(p, "Exchange")}%4d ${count(p, "Union")}%5d " +
          f"${count(p, "SortAggregate")}%7d ${count(p, "SortMergeJoin")}%3d " +
          f"${count(p, "BroadcastNestedLoop")}%4d ${count(p, "CartesianProduct")}%4d " +
          f"${count(p, "InMemoryTableScan")}%5d ${count(p, "Window")}%6d")
      } catch {
        case t: Throwable => println(f"$name%-28s ERROR ${t.getMessage.take(60)}")
      }
    }
    spark.stop()
  }
}
