package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Dump formatted physical plans of the query inventory for plan-hygiene
  * review (pushdown, broadcast, codegen spans). Not part of the driver
  * contract. Usage: sbt 'runMain graft.tools.ExplainDump [names...]'.
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq
                else Seq("q1_agg", "q3_top_orders", "q5_region_revenue",
                         "dedup_minhash_pairs", "dedup_ngram_jaccard",
                         "dedup_clusters", "decontam_hits", "doc_pipeline_kept",
                         "ann_brute_topk", "ann_lsh_topk", "ann_quantized_topk",
                         "agg_approx_sketch", "w3_sessions", "text_stats")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      try println(SparkEntry.queries(n)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      catch { case e: Throwable => println(s"explain failed: $e") }
    }
    spark.stop()
  }
}
