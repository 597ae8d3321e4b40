package graft

import graft.schema.EventSchema
import graft.sinks.ColumnarSink
import graft.streaming.{IngestMetricsListener, IngestConfig, IngestStream}
import org.apache.spark.sql.{Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Sustained streaming-ingest throughput bench — the reference's actual
  * operating point. BASELINE.md's envelope is ingest throughput (300k
  * records per poll on a 15 s cadence — kafka/KafkaConfig.java:33,
  * stream/StreamConfig.java:14), so this drives the REAL streaming entry
  * (`IngestStream.start`: decouple → whitelist → day-split → infer/evolve →
  * parse → per-collection sink insert → registry save, all inside the
  * offset-commit barrier) rather than a batch query.
  *
  * Shape: the `events` table is serialized to Fabric JSON wire records and
  * written as N chunk files; the file source replays them one file per
  * micro-batch (`maxFilesPerTrigger=1` — the B5 intake bound) under
  * `Trigger.AvailableNow`, so the run measures drain CAPACITY: how fast the
  * engine can sustain full batches back-to-back. Reported records/s over
  * busy time is directly comparable to the reference's envelope
  * (300k / 15 s = 20k records/s sustained).
  *
  * Event times are rebased to "now" so the day-split heuristic routes the
  * whole stream real-time (the steady-state shape); the split, inference,
  * dedup-off, retry and registry-persistence paths all run exactly as in
  * production. Batch-latency distribution and the registry-save share of
  * the barrier ride along in the result.
  */
object StreamBench {

  final case class StreamResult(
      records: Long,
      batches: Int,
      chunks: Int,
      wallSec: Double,
      busySec: Double,
      recordsPerSecBusy: Double,
      recordsPerSecWall: Double,
      batchMsP50: Long,
      batchMsP95: Long,
      batchMsMax: Long,
      registrySaveMs: Long,
      collections: Int) {
    def toJson: String =
      f"""{"records":$records,"batches":$batches,"chunks":$chunks,""" +
        f""""wall_sec":$wallSec%.3f,"busy_sec":$busySec%.3f,""" +
        f""""records_per_sec_busy":$recordsPerSecBusy%.0f,""" +
        f""""records_per_sec_wall":$recordsPerSecWall%.0f,""" +
        f""""batch_ms":{"p50":$batchMsP50,"p95":$batchMsP95,"max":$batchMsMax},""" +
        f""""registry_save_ms":$registrySaveMs,"collections":$collections}"""
  }

  /** Serialize `events` rows as Fabric wire JSON with `_time` rebased to a
    * fixed "now" so every record is same-day (real-time split path). The
    * payload shape matches `SparkEntry.eventsAsFabricJson`; rebasing only
    * touches `_time`.
    */
  private def wireJson(spark: SparkSession, sfDir: String, nowMillis: Long) = {
    val ev = graft.schema.TableContract.check("events",
        spark.read.parquet(s"$sfDir/events.parquet"))
      .repartition(spark.sparkContext.defaultParallelism)
    ev.select(concat(
      lit("""{"id":""""), col("event_id"), lit("""","metadata":{},"data":{"""),
      lit(""""_project":"demo","_collection":""""), col("event_type"), lit("\","),
      lit(""""_time":"""), lit(nowMillis), lit(","),
      lit(""""_user":"u"""), col("user_id"), lit("\","),
      lit(""""value":"""), col("value"), lit(","),
      lit(""""props":"""), col("props"),
      lit("}}")).as("value")).as(Encoders.STRING)
  }

  /** Run the replay. `targetRecords` controls how many wire records are
    * staged (the events table is replicated to reach it); `chunks` is the
    * number of micro-batches. Each batch intakes `filesPerBatch` files —
    * the replay analogue of a `filesPerBatch`-partition Kafka topic (one
    * file per batch would serialize the scan+parse onto a single task,
    * which no production source does).
    */
  def run(spark: SparkSession, sfDir: String, chunks: Int = 20,
          targetRecords: Long = 300000, filesPerBatch: Int = 8): StreamResult = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_streambench")
    val input = s"$tmp/input"
    val checkpoint = s"$tmp/checkpoint"
    val sinkDir = s"$tmp/sink"
    try {
      // stage the wire stream: replicate events to the target volume, then
      // one text file per planned micro-batch
      val one = wireJson(spark, sfDir, System.currentTimeMillis())
      val nEvents = one.count()
      val replication = math.max(1, math.ceil(targetRecords.toDouble / nEvents).toInt)
      val wire = Seq.fill(replication)(one).reduce(_.union(_))
      wire.repartition(chunks * filesPerBatch).write.text(input)
      val staged = nEvents * replication

      // keep every batch's progress (default history is 100; be explicit)
      spark.conf.set("spark.sql.streaming.numRecentProgressUpdates",
        (chunks + 8).toString)
      val registry = new EventSchema.Registry()
      val sink = new ColumnarSink(sinkDir)
      val metrics = new IngestMetricsListener().register(spark)
      val t0 = System.nanoTime()
      val query = IngestStream.start(spark,
        IngestStream.fileSource(spark, input, maxFilesPerTrigger = Some(filesPerBatch)),
        registry, sink, historical = None, checkpoint,
        IngestConfig(availableNow = true))
      try query.awaitTermination()
      finally spark.streams.removeListener(metrics)
      val wallSec = (System.nanoTime() - t0) / 1e9

      val progress = query.recentProgress.toSeq.filter(_.numInputRows > 0)
      val batchMs = progress
        .map(p => Option(p.durationMs.get("triggerExecution"))
          .map(_.longValue()).getOrElse(0L))
        .sorted
      def pct(q: Double): Long =
        if (batchMs.isEmpty) 0L
        else batchMs(math.min(batchMs.size - 1, (q * batchMs.size).toInt))
      val busySec = batchMs.sum / 1e3
      val records = progress.map(_.numInputRows).sum
      if (records != staged)
        System.err.println(s"[streambench] staged $staged records but " +
          s"progress reports $records — counts below are as-reported")
      StreamResult(
        records = records,
        batches = progress.size,
        chunks = chunks,
        wallSec = wallSec,
        busySec = busySec,
        recordsPerSecBusy = if (busySec > 0) records / busySec else 0.0,
        recordsPerSecWall = if (wallSec > 0) records / wallSec else 0.0,
        batchMsP50 = pct(0.50),
        batchMsP95 = pct(0.95),
        batchMsMax = batchMs.lastOption.getOrElse(0L),
        registrySaveMs = registry.persistMillis,
        collections = registry.all.size)
    } finally {
      try {
        java.nio.file.Files.walk(tmp).sorted(java.util.Comparator.reverseOrder())
          .forEach(f => { java.nio.file.Files.deleteIfExists(f); () })
      } catch { case _: Throwable => () }
    }
  }

  /** Standalone entry: one JSON line, same contract style as [[Bench]]. */
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val r = run(spark, sfDir,
      chunks = sys.env.getOrElse("SPARK_GRAFT_STREAM_CHUNKS", "20").toInt,
      targetRecords = sys.env.getOrElse("SPARK_GRAFT_STREAM_TARGET", "300000").toLong,
      filesPerBatch = sys.env.getOrElse("SPARK_GRAFT_STREAM_FILES", "8").toInt)
    println(s"""{"metric":"stream_ingest","unit":"records_per_sec","value":${r.recordsPerSecBusy.toLong},"detail":${r.toJson},"sf":"$sfDir"}""")
    spark.stop()
  }
}
