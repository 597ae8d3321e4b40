package graft

import graft.ingest.JsonDialect
import graft.schema.{CollectionId, EventSchema}
import graft.sinks.{ColumnarSink, MemorySink}
import graft.streaming.{FileHistoricalHandler, IngestConfig, IngestStream}
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.types._

import java.nio.file.Files

class IngestStreamSpec extends SparkSpec {

  private def writeLines(dir: java.nio.file.Path, name: String, lines: Seq[String]): Unit = {
    val tmp = Files.createTempFile("batch", ".json.tmp")
    Files.write(tmp, String.join("\n", lines: _*).getBytes)
    Files.move(tmp, dir.resolve(name)) // atomic drop for the file source
  }

  private def todayMillis: Long = System.currentTimeMillis()
  private def fabric(coll: String, time: Long, extra: String = ""): String =
    s"""{"data":{"_project":"p","_collection":"$coll","_time":$time,"_user":"u1"$extra}}"""

  test("batch pipeline: split + historical handoff + evolve + sink insert") {
    import spark.implicits._
    val outBase = Files.createTempDirectory("sink").toString
    val histPath = Files.createTempDirectory("hist").toString + "/data"
    val registry = new EventSchema.Registry()
    val sink = new ColumnarSink(outBase)
    val old = java.time.Instant.now().minus(java.time.Duration.ofDays(40)).toEpochMilli
    val raw = Seq(
      fabric("clicks", todayMillis, ""","page":"/a","n":1"""),
      fabric("clicks", todayMillis, ""","page":"/b","n":2.5,"extra":"x""""),
      fabric("views", todayMillis),
      fabric("clicks", old, ""","page":"/old""""), // → historical
      "not-json"
    ).toDS()
    val counts = IngestStream.processBatch(spark, raw, registry, sink,
      Some(new FileHistoricalHandler(histPath)), IngestConfig())

    assert(counts(CollectionId("p", "clicks")) == 2)
    assert(counts(CollectionId("p", "views")) == 1)
    // historical record handed off raw, not parsed
    val hist = spark.read.text(histPath).collect().map(_.getString(0))
    assert(hist.length == 1 && hist.head.contains("/old"))
    // sink readable, schema evolved (n inferred DOUBLE, extra null-filled),
    // _shard_time injected
    val clicks = sink.read(spark, CollectionId("p", "clicks"))
    assert(clicks.schema("n").dataType == DoubleType)
    assert(clicks.schema.fieldNames.contains("_shard_time"))
    assert(clicks.where($"extra".isNotNull).count() == 1)
  }

  test("streaming e2e: file source, two batches, schema evolution at rest") {
    import spark.implicits._
    val inDir = Files.createTempDirectory("in")
    val outBase = Files.createTempDirectory("sink").toString
    val ckpt = Files.createTempDirectory("ckpt").toString
    val registry = new EventSchema.Registry()
    val sink = new ColumnarSink(outBase)

    writeLines(inDir, "b1.json", Seq(
      fabric("clicks", todayMillis, ""","page":"/a""""),
      fabric("clicks", todayMillis, ""","page":"/b"""")))

    val q = IngestStream.start(spark, IngestStream.fileSource(spark, inDir.toString),
      registry, sink, None, ckpt, IngestConfig(triggerSeconds = 1))
    try {
      q.processAllAvailable()
      // batch 2 brings a brand-new column and a new collection
      writeLines(inDir, "b2.json", Seq(
        fabric("clicks", todayMillis, ""","page":"/c","score":9"""),
        fabric("installs", todayMillis)))
      q.processAllAvailable()
    } finally q.stop()

    val clicks = sink.read(spark, CollectionId("p", "clicks"))
    assert(clicks.count() == 3)
    assert(clicks.schema("score").dataType == DoubleType) // evolved at rest
    assert(clicks.where($"score".isNotNull).count() == 1)
    val installs = sink.read(spark, CollectionId("p", "installs"))
    assert(installs.count() == 1)
    // registry carries the authoritative in-flight order: defaults first
    val reg = registry.get(CollectionId("p", "clicks")).get
    assert(reg.fieldNames.take(2).toSeq == Seq("_time", "_user"))
  }

  test("streaming doc-pipeline clean: stream-safe dedup agrees with the batch funnel") {
    import spark.implicits._
    import graft.operators.DocPipeline
    // the batch clean() uses a row_number window — illegal in a streaming
    // query; cleanStream swaps it for stateful dropDuplicates and must
    // keep the same fingerprint set
    val docsDir = Files.createTempDirectory("docs_stream")
    val batch = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    batch.write.mode("overwrite").parquet(docsDir.toString + "/in")

    val stream = spark.readStream
      .schema(batch.schema)
      .parquet(docsDir.toString + "/in")
    val cleanedStream = DocPipeline.cleanStream(stream, "doc_id", "text")
    assert(cleanedStream.isStreaming)
    val q = cleanedStream.writeStream
      .format("memory").queryName("cleaned_docs").outputMode("append")
      .start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("cleaned_docs")
    val batchClean = DocPipeline.clean(batch, "doc_id", "text")
    // representative CHOICE differs (first-seen vs smallest id) but the
    // kept fingerprint set — what dedup is about — must be identical
    assert(streamed.select("fingerprint").distinct().count() == streamed.count())
    assert(
      streamed.select("fingerprint").collect().map(_.getString(0)).toSet ==
      batchClean.select("fingerprint").collect().map(_.getString(0)).toSet)
    // TTL'd form builds a watermarked streaming plan (state-bounded)
    val withTs = stream.withColumn("seen_at",
      org.apache.spark.sql.functions.current_timestamp())
    val ttlPlan = DocPipeline.cleanStream(withTs, "doc_id", "text",
      watermarkCol = Some("seen_at"))
    assert(ttlPlan.isStreaming)
  }

  test("streaming incremental clean: corpus hits dropped before dedup state") {
    import spark.implicits._
    import graft.operators.{DocPipeline, DocPipeline => DP}
    val all = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val newDocs = all.where($"source" =!= "src0")
    // corpus = src0 plus ONE doc copied from the incoming batch (with a
    // different id), so the corpus-hit path provably fires; pinned
    // driver-side — a lazy limit(1) re-evaluates nondeterministically
    // between the micro-batch join and the later expected-set collect
    val plantRow = DocPipeline.clean(newDocs, "doc_id", "text")
      .select($"doc_id", $"text").orderBy($"doc_id").limit(1).collect().head
    val plant = Seq((plantRow.getLong(0) + 1000000L, plantRow.getString(1)))
      .toDF("doc_id", "text")
    val corpus = all.where($"source" === "src0").select($"doc_id", $"text")
      .unionByName(plant)
    val docsDir = Files.createTempDirectory("docs_inc_stream")
    newDocs.write.mode("overwrite").parquet(docsDir.toString + "/in")

    val corpusFps = DP.corpusFingerprints(corpus, "text")
    val stream = spark.readStream.schema(newDocs.schema)
      .parquet(docsDir.toString + "/in")
    val incStream = DocPipeline.cleanStreamIncremental(
      stream, corpusFps, "doc_id", "text")
    assert(incStream.isStreaming)
    val q = incStream.writeStream
      .format("memory").queryName("inc_cleaned").outputMode("append")
      .start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("inc_cleaned")
      .select("fingerprint").collect().map(_.getString(0)).toSet
    // expected = batch clean of the new docs, minus corpus fingerprints
    val corpusSet = corpusFps.collect().map(_.getString(0)).toSet
    val expected = DocPipeline.clean(newDocs, "doc_id", "text")
      .select("fingerprint").collect().map(_.getString(0)).toSet -- corpusSet
    assert(streamed === expected && expected.nonEmpty)
    assert(spark.table("inc_cleaned").count() === streamed.size) // deduped
    // and at least one would-be-kept doc was dropped as a corpus hit
    val withoutCorpus = DocPipeline.clean(newDocs, "doc_id", "text")
      .select("fingerprint").collect().map(_.getString(0)).toSet
    assert((withoutCorpus -- expected).nonEmpty,
      "fixture has no cross-corpus duplicate — corpus-hit path untested")
  }

  test("watermarked event-time window aggregation over the parsed stream") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val inDir = Files.createTempDirectory("in")
    val ckpt = Files.createTempDirectory("ckpt").toString
    val t0 = java.time.Instant.parse("2026-08-10T00:00:00Z").toEpochMilli
    writeLines(inDir, "b1.json", Seq(
      fabric("ev", t0, ""","v":1"""), fabric("ev", t0 + 600000, ""","v":2"""),
      fabric("ev", t0 + 3600000, ""","v":3""")))
    // event-time windows + watermark on the decoupled stream — a windowed
    // aggregation the reference cannot express (SURVEY §2.8)
    val dec = graft.operators.EventOps.decouple(
      spark.readStream.text(inDir.toString).select("value").as[String],
      graft.ingest.JsonDialect.Fabric)
    val agg = dec.filter($"_time".isNotNull)
      .withWatermark("_time", "1 hour")
      .groupBy(window($"_time", "30 minutes"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.outputMode("complete").format("memory")
      .queryName("win_agg").option("checkpointLocation", ckpt).start()
    try q.processAllAvailable() finally q.stop()
    val out = spark.table("win_agg")
      .select($"window.start".cast("long").as("start"), $"n").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(t0 / 1000) == 2)            // first 30-min window: 2 events
    assert(out(t0 / 1000 + 3600) == 1)     // the +1h event in its own window
  }

  test("TTL dedup (flatMapGroupsWithState): cross-batch duplicates dropped") {
    import spark.implicits._
    val inDir = Files.createTempDirectory("in")
    val ckpt = Files.createTempDirectory("ckpt").toString
    val t = todayMillis
    writeLines(inDir, "b1.json", Seq(
      fabric("ev", t, ""","v":1"""),
      fabric("ev", t, ""","v":2"""),      // same (_user,_time): dropped in-batch
      fabric("ev", t + 1000, ""","v":3""")))
    val dec = graft.operators.EventOps.decouple(
      spark.readStream.text(inDir.toString).select("value").as[String],
      graft.ingest.JsonDialect.Fabric)
    val out = java.util.Collections.synchronizedList(new java.util.ArrayList[String]())
    // ProcessingTimeTimeout keeps a default-trigger query spinning on wake-
    // ups; AvailableNow drains-and-stops — and two runs over one checkpoint
    // also prove the dedup state survives a restart.
    def runOnce(): Unit = {
      val dec2 = graft.operators.EventOps.decouple(
        spark.readStream.text(inDir.toString).select("value").as[String],
        graft.ingest.JsonDialect.Fabric)
      val deduped = graft.streaming.IngestStream.deduplicatedWithTtl(
        dec2.filter($"_project".isNotNull), java.time.Duration.ofDays(30))
      val q = deduped.writeStream.outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.collect().foreach(r => out.add(r.getString(0))); ()
        }.start()
      q.awaitTermination(120000)
    }
    runOnce()
    writeLines(inDir, "b2.json", Seq(
      fabric("ev", t, ""","v":4"""),          // dup from run 1: state drops it
      fabric("ev", t + 2000, ""","v":5"""))) // new key: passes
    runOnce()
    import scala.jdk.CollectionConverters._
    val vals = out.asScala.toList
    assert(vals.length == 3, s"got $vals")
    assert(vals.exists(_.contains("\"v\":1")) && vals.exists(_.contains("\"v\":3")) &&
           vals.exists(_.contains("\"v\":5")))
  }

  test("session windows: gap-based event grouping on the decoupled stream") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val inDir = Files.createTempDirectory("in")
    val ckpt = Files.createTempDirectory("ckpt").toString
    val t0 = java.time.Instant.parse("2026-08-10T00:00:00Z").toEpochMilli
    // two bursts 2h apart → with a 30-min gap they form two sessions
    writeLines(inDir, "b1.json", Seq(
      fabric("ev", t0), fabric("ev", t0 + 60000), fabric("ev", t0 + 120000),
      fabric("ev", t0 + 7200000), fabric("ev", t0 + 7260000)))
    val dec = graft.operators.EventOps.decouple(
      spark.readStream.text(inDir.toString).select("value").as[String],
      graft.ingest.JsonDialect.Fabric)
    val sessions = dec.filter($"_time".isNotNull)
      .withWatermark("_time", "1 hour")
      .groupBy(session_window($"_time", "30 minutes"), $"_collection")
      .agg(count(lit(1)).as("n"))
    val q = sessions.writeStream.outputMode("complete").format("memory")
      .queryName("sess_agg").option("checkpointLocation", ckpt).start()
    try q.processAllAvailable() finally q.stop()
    val ns = spark.table("sess_agg").select($"n").collect().map(_.getLong(0)).sorted
    assert(ns.toSeq == Seq(2L, 3L))
  }

  test("restarted driver keeps authoritative column order via the durable registry") {
    import spark.implicits._
    val inDir = Files.createTempDirectory("in")
    val ckpt = Files.createTempDirectory("ckpt").toString
    val sink = new MemorySink
    val t = todayMillis
    // run 1 establishes order: _time, _user, a, b
    writeLines(inDir, "b1.json", Seq(fabric("ev", t, ""","a":1,"b":"x"""")))
    val q1 = IngestStream.start(spark, IngestStream.fileSource(spark, inDir.toString),
      new EventSchema.Registry(), sink, None, ckpt, IngestConfig(triggerSeconds = 1))
    try q1.processAllAvailable() finally q1.stop()

    // run 2: FRESH registry (driver restart); the same event fields arrive
    // reordered plus a new column — authoritative order must come from the
    // persisted registry, not this batch's observation order
    writeLines(inDir, "b2.json", Seq(fabric("ev", t + 1000, ""","c":true,"b":"y","a":2""")))
    val q2 = IngestStream.start(spark, IngestStream.fileSource(spark, inDir.toString),
      new EventSchema.Registry(), sink, None, ckpt, IngestConfig(triggerSeconds = 1))
    try q2.processAllAvailable() finally q2.stop()

    val schemas = sink.inserted.get(CollectionId("p", "ev")).map(_.schema.fieldNames.toSeq)
    assert(schemas.last == Seq("_time", "_user", "a", "b", "c", "_shard_time"),
      s"got $schemas")
  }

  test("streaming dedup drops repeated (_user,_time) across batches") {
    import spark.implicits._
    val inDir = Files.createTempDirectory("in")
    val ckpt = Files.createTempDirectory("ckpt").toString
    val registry = new EventSchema.Registry()
    val sink = new MemorySink
    val t = todayMillis
    writeLines(inDir, "b1.json", Seq(
      fabric("ev", t, ""","v":1"""),
      fabric("ev", t, ""","v":2"""),   // same (_user,_time) → dropped
      fabric("ev", t + 1000, ""","v":3""")))
    val q = IngestStream.start(spark, IngestStream.fileSource(spark, inDir.toString),
      registry, sink, None, ckpt,
      IngestConfig(triggerSeconds = 1, dedupWithinWatermark = Some("30 days")))
    try {
      q.processAllAvailable()
      writeLines(inDir, "b2.json", Seq(
        fabric("ev", t, ""","v":4"""))) // duplicate from batch 1 → dropped by state
      q.processAllAvailable()
    } finally q.stop()
    assert(sink.rows(CollectionId("p", "ev")) == 2)
  }

  private def fabricNoUser(coll: String, time: Long, extra: String = ""): String =
    s"""{"data":{"_project":"p","_collection":"$coll","_time":$time$extra}}"""

  test("streaming dedup passes null-user rows through undeduplicated") {
    import spark.implicits._
    val inDir = Files.createTempDirectory("in")
    val ckpt = Files.createTempDirectory("ckpt").toString
    val registry = new EventSchema.Registry()
    val sink = new MemorySink
    val t = todayMillis
    // reference Deduplicator only drops on a PRESENT key: two null-user
    // rows sharing a _time must both survive
    writeLines(inDir, "b1.json", Seq(
      fabricNoUser("ev", t, ""","v":1"""),
      fabricNoUser("ev", t, ""","v":2"""),
      fabric("ev", t, ""","v":3"""),
      fabric("ev", t, ""","v":4""")))   // keyed duplicate → dropped
    val q = IngestStream.start(spark, IngestStream.fileSource(spark, inDir.toString),
      registry, sink, None, ckpt,
      IngestConfig(triggerSeconds = 1, dedupWithinWatermark = Some("30 days")))
    try q.processAllAvailable() finally q.stop()
    assert(sink.rows(CollectionId("p", "ev")) == 3)
  }

  test("TTL dedup: Rakam dialect keys on $.properties and null user passes") {
    import spark.implicits._
    val inDir = Files.createTempDirectory("in")
    val ckpt = Files.createTempDirectory("ckpt").toString
    val t = "2026-08-10T00:00:00"
    def rakam(user: Option[String], v: Int): String = {
      val u = user.map(u => s""""_user":"$u",""").getOrElse("")
      s"""{"project":"p","collection":"ev","properties":{$u"_time":"$t","v":$v}}"""
    }
    writeLines(inDir, "b1.json", Seq(
      rakam(Some("u1"), 1),
      rakam(Some("u1"), 2),   // same (user, time) → dropped
      rakam(None, 3),
      rakam(None, 4)))        // null user: BOTH pass through
    val dec = graft.operators.EventOps.decouple(
      spark.readStream.text(inDir.toString).select("value").as[String],
      JsonDialect.Rakam)
    val deduped = IngestStream.deduplicatedWithTtl(
      dec.filter($"_project".isNotNull), java.time.Duration.ofDays(30),
      dialect = JsonDialect.Rakam)
    val out = java.util.Collections.synchronizedList(new java.util.ArrayList[String]())
    val q = deduped.writeStream.outputMode("update")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.collect().foreach(r => out.add(r.getString(0))); ()
      }.start()
    q.awaitTermination(120000)
    import scala.jdk.CollectionConverters._
    val vals = out.asScala.toList
    assert(vals.length == 3, s"got $vals")
    assert(vals.exists(_.contains("\"v\":1")) && vals.exists(_.contains("\"v\":3")) &&
           vals.exists(_.contains("\"v\":4")))
  }
}
