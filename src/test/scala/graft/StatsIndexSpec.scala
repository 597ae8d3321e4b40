package graft

import graft.layout.{StatsIndex, ZOrder}
import org.apache.spark.sql.functions._

class StatsIndexSpec extends SparkSpec {

  test("manifest pruning: box reads a fraction of a z-ordered table's files, exactly") {
    import spark.implicits._
    val n = 100000L
    val data = spark.range(n).select(
      $"id".as("y"),
      pmod(hash($"id"), lit(50000)).cast("long").as("x"),
      ($"id" % 13).as("payload"))
    val dir = java.nio.file.Files.createTempDirectory("sidx").toString
    ZOrder.zorder(data, Seq("x", "y"), bits = 12, numPartitions = 128)
      .write.mode("overwrite").parquet(dir)

    val nFiles = StatsIndex.build(spark, dir, Seq("x", "y"))
    assert(nFiles >= 100, s"expected ~128 files, indexed $nFiles")

    val pruned = StatsIndex.prunedRead(spark, dir,
      Seq(("x", 1000L, 2999L), ("y", 20000L, 29999L)))
    val filesRead = pruned.select(input_file_name()).distinct().count()
    info(s"manifest kept $filesRead of $nFiles files")
    assert(filesRead * 4 <= nFiles,
      s"manifest should prune ≥4×: read $filesRead of $nFiles files")

    // exactness: filtering the superset equals filtering the full table
    val predFull = spark.read.parquet(dir)
      .where($"x".between(1000, 2999) && $"y".between(20000, 29999))
      .agg(count(lit(1)), sum($"payload")).head()
    val predPruned = pruned
      .where($"x".between(1000, 2999) && $"y".between(20000, 29999))
      .agg(count(lit(1)), sum($"payload")).head()
    assert(predFull == predPruned, "pruned read lost rows")
    assert(predFull.getLong(0) > 0, "empty test predicate proves nothing")
  }

  test("staleness: files written after build are still read (conservative)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("sidx_stale").toString
    spark.range(1000).select($"id".as("x"), ($"id" * 2).as("v"))
      .repartitionByRange(8, $"x").write.mode("overwrite").parquet(dir)
    StatsIndex.build(spark, dir, Seq("x"))
    // late arrival OUTSIDE the indexed range — a naive manifest would
    // prune every indexed file and silently miss these rows
    Seq((5000L, 777L)).toDF("x", "v")
      .coalesce(1).write.mode("append").parquet(dir)
    val out = StatsIndex.prunedRead(spark, dir, Seq(("x", 4500L, 6000L)))
      .where($"x" >= 4500 && $"x" <= 6000).collect()
    assert(out.length == 1 && out.head.getLong(1) == 777L,
      "stale file dropped by the manifest")
    // and a disjoint range still prunes to zero files / zero rows
    val none = StatsIndex.prunedRead(spark, dir, Seq(("x", 100000L, 200000L)))
    assert(none.where($"x" >= 100000).count() == 0)
  }
}
