package graft

import graft.schema.EventSchema
import graft.sinks.MemorySink
import graft.streaming.{IngestConfig, IngestStream}

/** S1/B5 integration — guarded: this image ships no Kafka connector jar
  * (zero egress), so these cases skip via `assume` and activate untouched
  * the moment `spark-sql-kafka-0-10` lands on the classpath (and, for the
  * end-to-end case, a broker is reachable via GRAFT_KAFKA_BOOTSTRAP).
  */
class KafkaIntegrationSpec extends SparkSpec {

  private def connectorPresent: Boolean =
    try { Class.forName("org.apache.spark.sql.kafka010.KafkaSourceProvider"); true }
    catch { case _: ClassNotFoundException => false }

  test("kafkaSource builds a streaming plan against the connector") {
    assume(connectorPresent, "spark-sql-kafka connector not on classpath")
    val df = IngestStream.kafkaSource(spark, "localhost:9092", "events")
    assert(df.isStreaming)
    assert(df.schema.fieldNames.toSeq == Seq("value"))
  }

  test("kafka end-to-end: ingest pipeline drains a real topic") {
    assume(connectorPresent, "spark-sql-kafka connector not on classpath")
    val bootstrap = sys.env.get("GRAFT_KAFKA_BOOTSTRAP")
    assume(bootstrap.isDefined, "set GRAFT_KAFKA_BOOTSTRAP=host:port to run")
    val ckpt = java.nio.file.Files.createTempDirectory("kafka_ckpt").toString
    val registry = new EventSchema.Registry()
    val sink = new MemorySink
    val source = IngestStream.kafkaSource(spark, bootstrap.get, "graft-it")
    val q = IngestStream.start(spark, source, registry, sink, None, ckpt,
      IngestConfig(triggerSeconds = 1))
    try {
      q.processAllAvailable()
      // the producer side is external; just prove offsets advance and any
      // routed rows land — the full semantics are covered by the file-source
      // parity suites, which share every operator past the source
      assert(q.lastProgress != null)
    } finally q.stop()
    assert(registry.all.keySet.forall(_.project.nonEmpty))
  }

}
