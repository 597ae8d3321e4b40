package graft.sinks.v2

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import java.nio.charset.StandardCharsets
import java.util.UUID
import java.util.zip.GZIPOutputStream
import scala.collection.mutable
import scala.jdk.CollectionConverters._

/** K3 "full integration": the event sink as a first-class DataSourceV2
  * table (`format("graft-ndjson")`), batch + streaming.
  *
  * Input contract: rows of `(project string, collection string, value
  * string)` — the serialized event stream (use `to_json(struct(...))` or
  * the raw wire value upstream). Each task writes gzip NDJSON files rolled
  * at `maxBytes` under `_staging/<query>/<task>`, the driver commit renames
  * them into `path/<project>/<collection>/` — the same two-phase commit the
  * reference implements by queueing batches in its s3-writer thread
  * (S3DatabaseHandler.java:389-479), here with Spark's WriterCommitMessage
  * protocol providing the barrier and abort cleanup.
  */
class NdjsonDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-ndjson"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    NdjsonDataSource.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table =
    new NdjsonTable(properties.asScala.toMap)
}

object NdjsonDataSource {
  val Schema: StructType = StructType(Seq(
    StructField("project", StringType, nullable = false),
    StructField("collection", StringType, nullable = false),
    StructField("value", StringType, nullable = false)))
}

final class NdjsonTable(properties: Map[String, String]) extends Table
    with SupportsWrite with org.apache.spark.sql.connector.catalog.SupportsRead {
  private val path = properties.getOrElse("path",
    throw new IllegalArgumentException("graft-ndjson requires a path"))

  override def name(): String = s"graft-ndjson(`$path`)"
  override def schema(): StructType = NdjsonDataSource.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.STREAMING_WRITE,
      TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap) =
    new NdjsonScanBuilder(path)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val maxBytes = info.options.getLong("maxBytes", 256L * 1024 * 1024) // ref 256 MB cap
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite =
          new NdjsonBatchWrite(path, info.queryId(), maxBytes)
        override def toStreaming: StreamingWrite =
          new NdjsonStreamingWrite(path, info.queryId(), maxBytes)
      }
    }
  }
}

// ---------------------------------------------------------------- read path

/** Scan of the sink layout `path/project/collection/part.ndjson.gz`: one
  * input partition per file (gzip is not splittable), routing columns
  * recovered from the directory structure, requested-column pruning, and
  * routing-predicate pushdown — equality/IN filters on `project` /
  * `collection` skip whole directories at planning time (the layout IS the
  * partitioning, so a filtered read must not list-and-open every file; at
  * scale the sink holds thousands of collections and a per-collection
  * consumer reads one of them). Pushed filters are still returned as
  * residuals so Spark re-checks them row-side — pruning is a planning
  * optimization, never a correctness dependency.
  */
class NdjsonScanBuilder(path: String)
    extends org.apache.spark.sql.connector.read.ScanBuilder
    with org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns
    with org.apache.spark.sql.connector.read.SupportsPushDownFilters {
  private var required: StructType = NdjsonDataSource.Schema
  private var routing: Array[sources.Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushFilters(filters: Array[sources.Filter]): Array[sources.Filter] = {
    routing = filters.filter(NdjsonScan.isRoutingFilter)
    filters // all residual: the source prunes files, Spark keeps row checks
  }
  override def pushedFilters(): Array[sources.Filter] = routing

  override def build(): org.apache.spark.sql.connector.read.Scan =
    new NdjsonScan(path, required, routing)
}

final case class NdjsonFilePartition(file: String, project: String, collection: String)
    extends org.apache.spark.sql.connector.read.InputPartition

object NdjsonScan {
  /** Routing predicates the scan can evaluate against directory names. */
  def isRoutingFilter(f: sources.Filter): Boolean = f match {
    case sources.EqualTo("project" | "collection", _: String) => true
    case sources.In("project" | "collection", _) => true
    case sources.IsNotNull("project" | "collection") => true
    case _ => false
  }

  /** Conservative match: unknown shapes keep the dir (residual row-side
    * filters preserve correctness either way). `IsNotNull` always keeps —
    * directory-derived values are never null.
    */
  def keepsProject(f: sources.Filter, project: String): Boolean = f match {
    case sources.EqualTo("project", v: String) => project == v
    case sources.In("project", vs) => vs.exists(v => v != null && v == project)
    case _ => true
  }

  def keepsCollection(f: sources.Filter, collection: String): Boolean = f match {
    case sources.EqualTo("collection", v: String) => collection == v
    case sources.In("collection", vs) => vs.exists(v => v != null && v == collection)
    case _ => true
  }
}

class NdjsonScan(path: String, required: StructType, routing: Array[sources.Filter])
    extends org.apache.spark.sql.connector.read.Scan
    with org.apache.spark.sql.connector.read.Batch {
  override def readSchema(): StructType = required
  override def toBatch: org.apache.spark.sql.connector.read.Batch = this

  override def planInputPartitions(): Array[org.apache.spark.sql.connector.read.InputPartition] = {
    val base = new Path(path)
    val filesystem = base.getFileSystem(NdjsonHadoopConf.driverConf())
    if (!filesystem.exists(base)) return Array.empty
    val out = mutable.Buffer[NdjsonFilePartition]()
    // prune at the directory level: list projects, then collections, and
    // only descend into dirs every routing filter keeps — a one-collection
    // read of an N-collection sink lists one subtree, not N
    filesystem.listStatus(base).foreach { proj =>
      val project = proj.getPath.getName
      if (proj.isDirectory && project != "_staging" && project != "_epochs" &&
          routing.forall(NdjsonScan.keepsProject(_, project))) {
        filesystem.listStatus(proj.getPath).foreach { coll =>
          val collection = coll.getPath.getName
          if (coll.isDirectory &&
              routing.forall(NdjsonScan.keepsCollection(_, collection))) {
            filesystem.listStatus(coll.getPath).foreach { f =>
              // isFile: a stray DIRECTORY named *.ndjson.gz must not plan
              // (the old recursive listFiles returned files only)
              if (f.isFile && f.getPath.getName.endsWith(".ndjson.gz"))
                out += NdjsonFilePartition(f.getPath.toString, project, collection)
            }
          }
        }
      }
    }
    out.toArray
  }

  override def createReaderFactory(): org.apache.spark.sql.connector.read.PartitionReaderFactory =
    new NdjsonReaderFactory(required, NdjsonHadoopConf.snapshot())
}

class NdjsonReaderFactory(required: StructType,
                          confProps: Array[(String, String)])
    extends org.apache.spark.sql.connector.read.PartitionReaderFactory {
  override def createReader(partition: org.apache.spark.sql.connector.read.InputPartition)
      : org.apache.spark.sql.connector.read.PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[NdjsonFilePartition]
    new org.apache.spark.sql.connector.read.PartitionReader[InternalRow] {
      private val stream = {
        val fp = new Path(p.file)
        new java.io.BufferedReader(new java.io.InputStreamReader(
          new java.util.zip.GZIPInputStream(
            fp.getFileSystem(NdjsonHadoopConf.rebuild(confProps)).open(fp)),
          StandardCharsets.UTF_8))
      }
      private var line: String = _
      override def next(): Boolean = { line = stream.readLine(); line != null }
      override def get(): InternalRow = {
        val values = required.fieldNames.map {
          case "project" => org.apache.spark.unsafe.types.UTF8String.fromString(p.project)
          case "collection" => org.apache.spark.unsafe.types.UTF8String.fromString(p.collection)
          case "value" => org.apache.spark.unsafe.types.UTF8String.fromString(line)
          case other => throw new IllegalArgumentException(s"unknown column $other")
        }
        InternalRow.fromSeq(values.toIndexedSeq)
      }
      override def close(): Unit = stream.close()
    }
  }
}

/** Commit message: staged file → final relative path. */
final case class StagedFiles(files: Seq[(String, String)]) extends WriterCommitMessage

/** Session Hadoop conf plumbing: a bare `new Configuration()` drops every
  * `spark.hadoop.*` setting (S3 credentials/endpoints, HDFS nameservices),
  * so driver-side sites read the active session's conf and executor-side
  * sites rebuild it from a shipped snapshot of the non-default entries
  * (the HadoopObjectFetcher pattern in AvroIngest).
  */
object NdjsonHadoopConf {
  def driverConf(): Configuration =
    org.apache.spark.sql.SparkSession.getActiveSession
      .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
      .map(_.sessionState.newHadoopConf())
      .getOrElse(new Configuration())

  def snapshot(): Array[(String, String)] = {
    import scala.jdk.CollectionConverters._
    val conf = driverConf()
    val defaults = new Configuration()
    conf.iterator().asScala.map(e => e.getKey -> e.getValue)
      .filter { case (k, v) => defaults.getRaw(k) != v }.toArray
  }

  def rebuild(props: Array[(String, String)]): Configuration = {
    val c = new Configuration()
    props.foreach { case (k, v) => c.set(k, v) }
    c
  }
}

class NdjsonBatchWrite(path: String, queryId: String, maxBytes: Long) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new NdjsonWriterFactory(path, queryId, maxBytes, epoch = -1L,
      NdjsonHadoopConf.snapshot())

  override def commit(messages: Array[WriterCommitMessage]): Unit =
    NdjsonCommit.rename(path, queryId, messages, streaming = false)

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    NdjsonCommit.cleanup(path, queryId)
}

class NdjsonStreamingWrite(path: String, queryId: String, maxBytes: Long) extends StreamingWrite {
  override def createStreamingWriterFactory(info: PhysicalWriteInfo): StreamingDataWriterFactory =
    new NdjsonWriterFactory(path, queryId, maxBytes, epoch = -1L,
      NdjsonHadoopConf.snapshot())

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    NdjsonCommit.rename(path, queryId, messages, streaming = true,
      epoch = epochId)

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    NdjsonCommit.cleanup(path, queryId)
}

object NdjsonCommit {
  private def fs(base: String): (FileSystem, Path) = {
    val p = new Path(base)
    (p.getFileSystem(NdjsonHadoopConf.driverConf()), p)
  }

  /** Driver-side commit barrier: every staged file renamed into place;
    * only after all tasks succeeded (Spark guarantees message completeness).
    *
    * STREAMING commits are idempotent under epoch replay, guarded by an
    * epoch MANIFEST (`_epochs/<queryId>/e<epoch>`, written after all
    * renames land): a replayed epoch that already committed drops its
    * staged files wholesale — name-based checks alone would miss a replay
    * whose partition split changed (different part numbers → no
    * collisions → silent duplication). Same-name collisions inside an
    * unfinished epoch (crash mid-commit, identical plan) still skip
    * per-file. BATCH commits never skip — batch file names carry the full
    * per-job id (no cross-job collisions by construction), so an existing
    * target there is a real conflict and must fail loudly rather than
    * silently discard data. Cleanup is scoped to this query's staging dir
    * so concurrent queries on the same path keep their in-flight files.
    */
  def rename(base: String, queryId: String, messages: Array[WriterCommitMessage],
             streaming: Boolean, epoch: Long = -1L): Unit = {
    val (filesystem, basePath) = fs(base)
    val manifest = new Path(basePath, s"_epochs/$queryId/e$epoch")
    if (streaming && filesystem.exists(manifest)) {
      // whole epoch already committed: drop every staged duplicate
      messages.foreach {
        case StagedFiles(files) => files.foreach { case (staged, _) =>
          filesystem.delete(new Path(staged), false)
        }
        case _ => ()
      }
      cleanup(base, queryId)
      return
    }
    if (streaming) {
      // Roll back a partial first attempt: a crash mid-commit leaves some
      // files renamed into place with this epoch's token but no manifest.
      // If the replay's partition split changed, its part numbers differ —
      // name collisions alone would let BOTH attempts' files survive
      // (duplicate data). Epoch replay re-reads the same offsets, so the
      // (project, collection) set is identical; sweeping just this
      // replay's target dirs for `-q<queryId>-e<epoch>` files is therefore
      // complete, and bounded (no full-tree listing). The queryId in the
      // suffix confines the sweep to THIS query's files: concurrent
      // streaming queries on one base path share epoch numbering, and an
      // epoch-only sweep would delete a sibling query's committed epoch-N
      // output (the reference isolates writers per project queue,
      // connector/s3/S3DatabaseHandler.java:389-479). Upgrade note: files
      // written by the pre-queryId token format are neither swept nor
      // collided with — stop streams cleanly (no epoch mid-commit) before
      // upgrading, or sweep stale `-e<epoch>` leftovers out of band.
      val suffix = s"-q$queryId-e$epoch.ndjson.gz"
      val targetDirs = messages.flatMap {
        case StagedFiles(files) =>
          files.map { case (_, rel) => rel.substring(0, rel.lastIndexOf('/')) }
        case _ => Nil
      }.toSet
      targetDirs.foreach { d =>
        val dir = new Path(basePath, d)
        if (filesystem.exists(dir)) filesystem.listStatus(dir).foreach { st =>
          if (st.getPath.getName.endsWith(suffix))
            filesystem.delete(st.getPath, false)
        }
      }
    }
    messages.foreach {
      case StagedFiles(files) => files.foreach { case (staged, relative) =>
        val target = new Path(basePath, relative)
        if (streaming && filesystem.exists(target)) {
          filesystem.delete(new Path(staged), false) // partial replay: committed
        } else {
          filesystem.mkdirs(target.getParent)
          if (!filesystem.rename(new Path(staged), target))
            throw new java.io.IOException(s"commit rename failed: $staged -> $target")
        }
      }
      case _ => ()
    }
    if (streaming) {
      filesystem.mkdirs(manifest.getParent)
      filesystem.create(manifest, true).close()
    }
    cleanup(base, queryId)
  }

  def cleanup(base: String, queryId: String): Unit = {
    val (filesystem, basePath) = fs(base)
    val stagingRoot = new Path(basePath, "_staging")
    filesystem.delete(new Path(stagingRoot, queryId), true)
    // drop the now-empty root; non-recursive delete can only race benignly
    // (a concurrent query's mkdir makes it non-empty → the delete fails)
    try {
      if (filesystem.exists(stagingRoot) && filesystem.listStatus(stagingRoot).isEmpty)
        filesystem.delete(stagingRoot, false)
    } catch { case _: java.io.IOException => () }
  }
}

class NdjsonWriterFactory(path: String, queryId: String, maxBytes: Long,
                          epoch: Long, confProps: Array[(String, String)])
    extends DataWriterFactory with StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new NdjsonDataWriter(path, queryId, maxBytes, partitionId, epoch, confProps)
  override def createWriter(partitionId: Int, taskId: Long, epochId: Long): DataWriter[InternalRow] =
    new NdjsonDataWriter(path, queryId, maxBytes, partitionId, epochId, confProps)
}

/** Per-task writer: one rolling gzip stream per (project, collection) seen
  * in this task's partition. Files land in the task's private staging dir;
  * the commit message carries their final destinations.
  */
class NdjsonDataWriter(base: String, queryId: String, maxBytes: Long,
                       partitionId: Int, epoch: Long,
                       confProps: Array[(String, String)] = Array.empty)
    extends DataWriter[InternalRow] {

  private val taskDir = s"$base/_staging/$queryId/task-${UUID.randomUUID()}"
  private val (filesystem, _) = {
    val p = new Path(base)
    (p.getFileSystem(NdjsonHadoopConf.rebuild(confProps)), p)
  }

  private final class Roller(project: String, collection: String) {
    var bytes = 0L
    var n = 0
    var out: java.io.OutputStream = _
    var staged: String = _
    val done = mutable.Buffer[(String, String)]()

    def open(): Unit = {
      // streaming epochs get deterministic PER-QUERY names so a replayed
      // epoch COLLIDES with its first attempt (commit skips the duplicate)
      // while two concurrent queries sharing the base path can never
      // collide or sweep each other (queryId is restart-stable, epoch
      // numbering is not query-unique); batch jobs get the FULL per-job id
      // so two appends to the same path can never collide — batch never
      // replays through commit(), and a truncated token would re-open
      // silent-overwrite collisions on POSIX filesystems where rename
      // replaces existing targets
      val token = if (epoch >= 0) s"q$queryId-e$epoch" else s"q$queryId"
      val name = f"part-$partitionId%05d-$n-$token.ndjson.gz"
      staged = s"$taskDir/$project/$collection/$name"
      done += ((staged, s"$project/$collection/$name"))
      out = new GZIPOutputStream(filesystem.create(new Path(staged), true))
      bytes = 0L; n += 1
    }

    def write(line: Array[Byte]): Unit = {
      if (out == null || bytes > maxBytes) { close(); open() } // size-rolled files
      out.write(line); out.write('\n')
      bytes += line.length + 1
    }

    def close(): Unit = if (out != null) { out.close(); out = null }
  }

  private val rollers = mutable.HashMap.empty[(String, String), Roller]

  override def write(row: InternalRow): Unit = {
    val project = row.getUTF8String(0).toString
    val collection = row.getUTF8String(1).toString
    val value = row.getUTF8String(2).getBytes
    rollers.getOrElseUpdate((project, collection),
      new Roller(project, collection)).write(value)
  }

  override def commit(): WriterCommitMessage = {
    rollers.values.foreach(_.close())
    StagedFiles(rollers.values.flatMap(_.done).toSeq)
  }

  override def abort(): Unit = {
    rollers.values.foreach(_.close())
    filesystem.delete(new Path(taskDir), true)
  }

  override def close(): Unit = rollers.values.foreach(_.close())
}
