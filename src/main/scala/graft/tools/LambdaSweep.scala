package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SimpleMode

/** Scratch audit (not part of the driver contract): which registered
  * queries still carry interpreted higher-order-function lambdas in their
  * optimized plans, and which HOF calls they are. Interpreted lambdas on
  * full-corpus paths are the perf class r11-r14 eliminated one by one
  * (ModPChecksum, ModPElementSum, SumLenDiv, IvfRankCells, WinnowSelect,
  * WordShingles, array_remove tokens) — this sweep finds the residue.
  */
object LambdaSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[8]")
      .withExtensions(new graft.GraftExtensions) // range-join hint queries resolve
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", false)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .appName("lambda-sweep").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val hofNames = Seq("aggregate(", "transform(", "filter(", "exists(",
      "zip_with(", "forall(", "array_sort(lambdafunction", "map_filter(",
      "transform_keys(", "transform_values(", "reduce(")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, q) =>
      try {
        val p = q(spark, sfDir).queryExecution.explainString(SimpleMode)
        val n = p.sliding("lambdafunction".length).count(_ == "lambdafunction")
        if (n > 0) {
          val hofs = hofNames.filter(h => p.contains(h)).map(_.stripSuffix("("))
          println(s"SWEEP $name lambdas=$n hofs=${hofs.mkString("/")}")
        }
      } catch {
        case t: Throwable => println(s"SWEEP $name ERROR ${t.getMessage.take(80)}")
      }
    }
    spark.stop()
  }
}
