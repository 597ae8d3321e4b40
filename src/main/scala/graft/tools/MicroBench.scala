package graft.tools

import graft.functions.{DedupFunctions, TextFunctions}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch micro-benchmark for plan diagnosis (not part of the driver
  * contract). Usage: sbt 'runMain graft.tools.MicroBench'.
  */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[micro] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val docs = spark.read.parquet(s"$dir/documents.parquet")

    val prepped = docs.select(concat($"lang", lit("|"), $"source").as("_blk"),
      $"doc_id".as("_id"),
      sort_array(array_distinct(transform(TextFunctions.shingles($"text", 3),
        s => DedupFunctions.hash60(s)))).as("_sh"))

    time("prep only (noop write)") {
      prepped.write.mode("overwrite").format("noop").save()
    }
    val cached = prepped.persist()
    time("prep materialize to cache") { cached.count() }

    val a = cached.select($"_blk", $"_id".as("id_a"), $"_sh".as("_sh_a"))
    val b = cached.select($"_blk", $"_id".as("id_b"), $"_sh".as("_sh_b"))
    val joined = a.join(b, Seq("_blk")).where($"id_a" < $"id_b")
    time("join+jaccard from cache") {
      joined.select($"id_a", $"id_b",
          round(graft.functions.expressions.SortedJaccard.sorted_jaccard($"_sh_a", $"_sh_b"), 4).as("j"))
        .where($"j" >= 0.05)
        .write.mode("overwrite").format("noop").save()
    }
    cached.unpersist()

    // minhash pipeline stages
    val sigsOnly = docs.select($"doc_id".as("_id"),
      DedupFunctions.minhashSignature($"text", 12, 3).as("_sig"))
    time("minhash signatures only") {
      sigsOnly.write.mode("overwrite").format("noop").save()
    }
    val withToks = docs.select($"doc_id".as("_id"),
      TextFunctions.tokens($"text").as("_toks"),
      DedupFunctions.minhashSignature($"text", 12, 3).as("_sig"))
    time("sig + tokens") {
      withToks.write.mode("overwrite").format("noop").save()
    }
    val banded = withToks.withColumn("_band",
      explode(DedupFunctions.bandKeys($"_sig", 4, 3)))
    time("sig + tokens + bands explode") {
      banded.write.mode("overwrite").format("noop").save()
    }
    time("full minhashCandidates") {
      // explicit hot-band cap: the library default became opt-in (0) for
      // oracle parity, but the bench must stay bounded on corpora with a
      // giant exact-copy family — and comparable to pre-change timings
      DedupFunctions.minhashCandidates(docs, "doc_id", "text", 12, 4, 3,
        maxBandFreq = 1000)
        .write.mode("overwrite").format("noop").save()
    }

    // ingest pipeline stages
    val raw = graft.SparkEntry.eventsAsFabricJson(spark, dir)
    time("json synthesis only") {
      raw.write.mode("overwrite").format("noop").save()
    }
    val routed = graft.ingest.JsonIngest.withRouting(raw, graft.ingest.JsonDialect.Fabric)
    time("routing pass") {
      routed.write.mode("overwrite").format("noop").save()
    }
    val routedCached = routed.filter($"_project".isNotNull).persist()
    time("routed materialize") { routedCached.count() }
    time("infer pass") {
      graft.ingest.JsonIngest.inferSchemas(
        routedCached.select($"value").as[String], graft.ingest.JsonDialect.Fabric)
    }
    val registry = new graft.schema.EventSchema.Registry()
    val obs = graft.ingest.JsonIngest.inferSchemas(
      routedCached.select($"value").as[String], graft.ingest.JsonDialect.Fabric)
    time("parse pass (all collections)") {
      obs.foreach { case (id, o) =>
        registry.getOrCreate(id)
        val auth = registry.addColumns(id, o)
        graft.ingest.JsonIngest.parseCollection(routedCached, id, auth,
          graft.ingest.JsonDialect.Fabric)
          .write.mode("overwrite").format("noop").save()
      }
    }
    routedCached.unpersist()
    time("d7_ingest_route full query") {
      graft.SparkEntry.queries("d7_ingest_route")(spark, dir)
        .write.mode("overwrite").format("noop").save()
    }
    time("d7_ingest_route again") {
      graft.SparkEntry.queries("d7_ingest_route")(spark, dir)
        .write.mode("overwrite").format("noop").save()
    }
    spark.stop()
  }
}
