package graft.tools

import graft.functions.TextFunctions
import graft.functions.expressions.TextStats
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch A/B timing for the fused [[TextStats]] expression vs the
  * composed TextFunctions plan (not part of the driver contract).
  * Usage: SPARK_GRAFT_SF_DIR=... sbt 'runMain graft.tools.TextStatsBench'
  */
object TextStatsBench {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time(name: String)(f: => Unit): Double = {
      val t0 = System.nanoTime(); f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[micro] $name: $s%.2f s"); s
    }

    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id", $"text")

    def composed() = docs.select(
      $"doc_id",
      TextFunctions.tokenCount($"text").as("n_tokens"),
      TextFunctions.basisPoints(TextFunctions.punctRatio($"text")).as("punct_bp"),
      TextFunctions.langId($"text").as("lang_pred"),
      TextFunctions.basisPoints(TextFunctions.qualityScore($"text")).as("quality_bp"),
      TextFunctions.fingerprint($"text").as("fingerprint"))
      .orderBy($"doc_id")

    def fused() = docs
      .select($"doc_id", TextStats.textStats($"text").as("_st"))
      .select($"doc_id", $"_st.n_tokens".as("n_tokens"),
        $"_st.punct_bp".as("punct_bp"), $"_st.lang_pred".as("lang_pred"),
        $"_st.quality_bp".as("quality_bp"), $"_st.fingerprint".as("fingerprint"))
      .orderBy($"doc_id")

    // warmup both
    composed().write.mode("overwrite").format("noop").save()
    fused().write.mode("overwrite").format("noop").save()
    (1 to 2).foreach { r =>
      time(s"composed r$r") { composed().write.mode("overwrite").format("noop").save() }
      time(s"fused    r$r") { fused().write.mode("overwrite").format("noop").save() }
    }
    spark.stop()
  }
}
