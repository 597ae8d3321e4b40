package graft

import graft.schema.CollectionId
import graft.sinks.ColumnarSink
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import java.nio.file.Files

class SinkSpec extends SparkSpec {

  test("insertBatch is idempotent across replays (at-least-once → effectively-once)") {
    import spark.implicits._
    val base = Files.createTempDirectory("sink").toString
    val sink = new ColumnarSink(base)
    val id = CollectionId("p", "c")
    val df = Seq((1, "a"), (2, "b")).toDF("n", "s")
    sink.insertBatch(id, df, batchId = 7)
    // replay of the same batch (crash between write and checkpoint commit)
    sink.insertBatch(id, df, batchId = 7)
    assert(sink.read(spark, id).count() == 2)
    // a new batch appends
    sink.insertBatch(id, Seq((3, "c")).toDF("n", "s"), batchId = 8)
    assert(sink.read(spark, id).count() == 3)
  }

  test("compaction rewrites many small batches into one, preserving rows") {
    import spark.implicits._
    val base = Files.createTempDirectory("sink").toString
    val sink = new ColumnarSink(base)
    val id = CollectionId("p", "c")
    (0 until 5).foreach(b =>
      sink.insertBatch(id, Seq((b, s"v$b")).toDF("n", "s"), batchId = b))
    assert(sink.read(spark, id).count() == 5)
    sink.compact(spark, id)
    assert(sink.read(spark, id).count() == 5)
    val dirs = new java.io.File(s"$base/project=p/collection=c").listFiles()
      .filter(_.isDirectory).map(_.getName)
    assert(dirs.length == 1 && dirs.head.startsWith("batch=compact-"))
  }

  test("ndjson sink: replayed batch overwrites its own directory, no duplicates") {
    import spark.implicits._
    val base = Files.createTempDirectory("ndjson").toString
    val sink = new graft.sinks.NdjsonGzipSink(base)
    val id = CollectionId("p", "c")
    sink.insert(id, Seq(("a", 1)).toDF("s", "n"), batchId = 7)
    sink.insert(id, Seq(("a", 1)).toDF("s", "n"), batchId = 7) // replay
    sink.insert(id, Seq(("b", 2)).toDF("s", "n"), batchId = 8)
    val back = spark.read.json(s"$base/p/c/batch=*")
    assert(back.count() == 2)
  }

  test("ndjson locale-exact mode matches the reference's serialization byte-for-byte") {
    import spark.implicits._
    import java.util.zip.GZIPInputStream
    import scala.jdk.CollectionConverters._
    val base = Files.createTempDirectory("ndjson_exact").toString
    val sink = new graft.sinks.NdjsonGzipSink(base, localeExactTimestamps = true)
    val id = CollectionId("p", "c")
    val t = java.time.Instant.parse("2018-03-09T17:45:30.123Z")
    val d = java.time.LocalDate.of(2018, 3, 9)
    sink.insert(id, Seq(
      (java.sql.Timestamp.from(t), java.sql.Date.valueOf(d), "x", 42L, 2.5, true))
      .toDF("_time", "day", "s", "n", "f", "b"))

    val bytes = java.nio.file.Files.walk(java.nio.file.Paths.get(base))
      .iterator().asScala.filter(_.toString.endsWith(".json.gz")).flatMap { p =>
        val in = new GZIPInputStream(java.nio.file.Files.newInputStream(p))
        try Iterator.single(in.readAllBytes()) finally in.close()
      }.toList

    // Hard literal golden — NOT derived by calling the formatter the sink
    // itself uses (a shared bug would cancel out). These are the reference's
    // exact output bytes for this event (S3DatabaseHandler.java:72,241-243:
    // `ofLocalizedDateTime(SHORT)` English@UTC = pattern `M/d/yy, h:mm a`
    // under JDK 17 CLDR, all-ASCII, ordinary U+0020 before AM/PM; BASIC_ISO
    // date). If a future JDK's CLDR drifts (e.g. U+202F before AM/PM), this
    // must FAIL so the drift is a conscious decision, not silent.
    val golden =
      "{\"_time\":\"3/9/18, 5:45 PM\",\"day\":\"20180309\",\"s\":\"x\",\"n\":42,\"f\":2.5,\"b\":true}\n"
    assert(bytes.map(new String(_, java.nio.charset.StandardCharsets.UTF_8)) ==
      List(golden))
    assert(bytes.head.sameElements(golden.getBytes(java.nio.charset.StandardCharsets.US_ASCII)))
  }

  test("ORC format roundtrips with schema evolution (the reference's Raptor format)") {
    import spark.implicits._
    val base = Files.createTempDirectory("sinkorc").toString
    val sink = new ColumnarSink(base, format = "orc")
    val id = CollectionId("p", "c")
    sink.insert(id, Seq((1, "a")).toDF("n", "s"))
    sink.insert(id, Seq((2, "b", true)).toDF("n", "s", "flag")) // evolved
    val back = sink.read(spark, id)
    assert(back.count() == 2)
    assert(back.columns.contains("flag"))
    assert(back.where($"flag").count() == 1)
    sink.compact(spark, id)
    assert(sink.read(spark, id).count() == 2)
  }

  test("mixing root-level and batch-keyed layouts fails loudly, not silently") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("sink_mix").toString
    val sink = new ColumnarSink(base)
    // plain-insert collection rejects a batch-keyed insert (whose batch=
    // dirs would make partition inference DROP the existing root files)
    val idA = CollectionId("p", "roots")
    sink.insert(idA, Seq((1, "a")).toDF("n", "s"))
    val e1 = intercept[IllegalStateException] {
      sink.insertBatch(idA, Seq((2, "b")).toDF("n", "s"), batchId = 0)
    }
    assert(e1.getMessage.contains("root-level"))
    assert(sink.read(spark, idA).count() == 1)

    // batch-keyed collection rejects a plain insert (whose root files
    // would be silently invisible to every read)
    val idB = CollectionId("p", "batches")
    sink.insertBatch(idB, Seq((1, "a")).toDF("n", "s"), batchId = 0)
    val e2 = intercept[IllegalStateException] {
      sink.insert(idB, Seq((2, "b")).toDF("n", "s"))
    }
    assert(e2.getMessage.contains("batch-keyed"))
    assert(sink.read(spark, idB).count() == 1)

    // same-shape appends still work on both
    sink.insert(idA, Seq((3, "c")).toDF("n", "s"))
    sink.insertBatch(idB, Seq((3, "c")).toDF("n", "s"), batchId = 1)
    assert(sink.read(spark, idA).count() == 2)
    assert(sink.read(spark, idB).count() == 2)

    // a compacted plain-insert collection BECOMES batch-keyed (compaction
    // rewrites into batch=compact-*) — further plain appends must now be
    // refused for the same reason
    sink.compact(spark, idA)
    intercept[IllegalStateException] {
      sink.insert(idA, Seq((4, "d")).toDF("n", "s"))
    }
    assert(sink.read(spark, idA).count() == 2)
  }

  test("insertBatch + compaction work through a file: URI (Hadoop FS path)") {
    import spark.implicits._
    // markers and compaction must resolve through the Hadoop FileSystem of
    // basePath, not java.io.File — a scheme-prefixed URI exercises that
    val base = "file:" + Files.createTempDirectory("sinkuri").toString
    val sink = new ColumnarSink(base)
    val id = CollectionId("p", "c")
    val df = Seq((1, "a"), (2, "b")).toDF("n", "s")
    sink.insertBatch(id, df, batchId = 1)
    sink.insertBatch(id, df, batchId = 1) // replay: marker makes it a no-op
    sink.insertBatch(id, Seq((3, "c")).toDF("n", "s"), batchId = 2)
    assert(sink.read(spark, id).count() == 3)
    sink.compact(spark, id)
    assert(sink.read(spark, id).count() == 3)
    val dirs = new java.io.File(s"${base.stripPrefix("file:")}/project=p/collection=c")
      .listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.length == 1 && dirs.head.startsWith("batch=compact-"))
  }

  test("commit markers are unambiguous for names containing underscores") {
    import spark.implicits._
    val base = Files.createTempDirectory("sink").toString
    val sink = new ColumnarSink(base)
    // old flat layout would collide: a_b/c and a/b_c both → "a_b_c_<id>"
    sink.insertBatch(CollectionId("a_b", "c"), Seq((1, "x")).toDF("n", "s"), batchId = 1)
    sink.insertBatch(CollectionId("a", "b_c"), Seq((2, "y")).toDF("n", "s"), batchId = 1)
    assert(sink.read(spark, CollectionId("a_b", "c")).count() == 1)
    assert(sink.read(spark, CollectionId("a", "b_c")).count() == 1)
  }

  test("sink layout prunes partitions on (project, collection) filters") {
    import spark.implicits._
    val base = Files.createTempDirectory("sink").toString
    val sink = new ColumnarSink(base)
    sink.insert(CollectionId("p", "clicks"), Seq((1, "a")).toDF("n", "s"))
    sink.insert(CollectionId("p", "views"), Seq((2, "b")).toDF("n", "s"))

    val filtered = sink.readAll(spark).filter($"collection" === "clicks")
    assert(filtered.count() == 1)
    // the scan must read only the clicks directory (partition pruning)
    val scan = filtered.queryExecution.executedPlan.collectFirst {
      case s: FileSourceScanExec => s
    }.get
    val files = scan.relation.location.listFiles(scan.partitionFilters, Nil)
      .flatMap(_.files.map(_.getPath.toString))
    assert(files.nonEmpty && files.forall(_.contains("collection=clicks")))
  }
}
