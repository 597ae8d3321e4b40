package graft

import graft.schema.EventSchema
import graft.sinks.ColumnarSink
import graft.streaming.{IngestConfig, IngestStream}

import java.nio.file.Files

/** Pins the README "Quick start" example — same calls, file source instead
  * of the Kafka broker.
  */
class DocExampleSpec extends SparkSpec {
  test("README quick start compiles and runs against the file source") {
    val inDir = Files.createTempDirectory("qs_in")
    val dataDir = Files.createTempDirectory("qs_data").toString
    val ckpt = Files.createTempDirectory("qs_chk").toString
    val now = System.currentTimeMillis()
    Files.write(inDir.resolve("b1.json"), Seq(
      s"""{"data":{"_project":"demo","_collection":"clicks","_time":$now,"_user":"u1","page":"/a"}}""",
      s"""{"data":{"_project":"demo","_collection":"spam","_time":$now,"_user":"u2"}}"""
    ).mkString("\n").getBytes)

    val registry = new EventSchema.Registry()          // in-flight schema authority
    val sink     = new ColumnarSink(dataDir)           // partitioned, idempotent batches

    val query = IngestStream.start(
      spark,
      IngestStream.fileSource(spark, inDir.toString),  // kafkaSource on a real broker
      registry, sink,
      historical = None,
      checkpointDir = ckpt,
      IngestConfig(
        collectionWhitelist = Seq("clicks", "views"),
        dedupWithinWatermark = Some("30 days")))       // TTL'd (_user,_time) dedup
    try query.processAllAvailable() finally query.stop()

    // later, query the sink like any table:
    val n = spark.read.option("mergeSchema", "true")
      .parquet(s"$dataDir/project=demo/collection=clicks").count()
    assert(n == 1) // whitelist dropped the spam collection
  }
}
