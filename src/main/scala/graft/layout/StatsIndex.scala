package graft.layout

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level min/max skipping index — the manifest half of the layout
  * story ([[ZOrder]] is the clustering half).
  *
  * Parquet row-group pruning only happens AFTER a file's footer is opened;
  * at 100 TB a selective query still pays one object-store round-trip per
  * file just to discover there is nothing to read. A tiny per-file
  * min/max manifest (what Delta/Iceberg keep in their transaction logs)
  * lets the DRIVER drop non-matching files from the read plan before any
  * footer is touched. On a z-ordered layout the two compose: tight
  * per-file ranges → most files prune on the manifest alone.
  *
  * The index is one extra parquet table under `_graft_stats_index`
  * (underscore-prefixed, so normal reads of the data directory never see
  * it). Build cost is one scan of the table (run it right after the
  * layout rewrite, while the data is hot); the index itself is one row
  * per file — kilobytes per thousand files, read once per query.
  *
  * Staleness is handled CONSERVATIVELY: [[prunedRead]] lists the data
  * directory (one listing, not per-file footer reads) and any file the
  * index does not know is included unconditionally — new data is never
  * silently missed, it just doesn't prune until the next [[build]].
  */
object StatsIndex {

  val IndexDirName = "_graft_stats_index"

  /** Scheme/authority-free normal form so `input_file_name` URIs
    * (`file:///x`) compare equal to Hadoop listing paths (`file:/x`).
    * Only used as a comparison key — reads use the stored URI verbatim.
    */
  private def normalize(p: String): String =
    new org.apache.hadoop.fs.Path(p).toUri.getPath

  private def statsOf(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))) :+
      count(lit(1)).as("n_rows")
    df.select(input_file_name().as("_file") +: cols.map(col): _*)
      .groupBy(col("_file"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** One pass over `dir`: per-file min/max for `cols` + row count, written
    * to `dir/_graft_stats_index`. Returns the number of indexed files.
    */
  def build(spark: SparkSession, dir: String, cols: Seq[String]): Long = {
    require(cols.nonEmpty, "index needs at least one column")
    statsOf(spark.read.parquet(dir), cols)
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/$IndexDirName")
    spark.read.parquet(s"$dir/$IndexDirName").count()
  }

  /** Incremental manifest maintenance — index ONLY the given just-written
    * files and APPEND their stats rows to `indexDir`. This is the
    * write-time path ([[graft.sinks.ColumnarSink]] calls it after each
    * insert, the way the reference computes shard stats at write —
    * InMemoryOrcStorageManager.java:188-207): one small job over files
    * that are still hot, columns pruned to the indexed set. A column
    * missing from a file's schema (pre-evolution batches) reads as all
    * nulls → null min/max, which [[prunedRead]] correctly prunes: no row
    * in that file can satisfy a range on the column.
    */
  def appendFor(spark: SparkSession, indexDir: String, basePath: String,
                files: Seq[String], cols: Seq[String]): Unit = {
    if (files.isEmpty) return
    val df = spark.read.option("basePath", basePath).parquet(files: _*)
    // a column a pre-evolution batch never had can't be selected — index
    // what exists; the file still gets a row (so it isn't "unknown" and
    // read unconditionally), and a null/absent min/max prunes it under any
    // range on that column, which is exact: it holds no such values
    val present = cols.filter(df.columns.contains)
    statsOf(df, present).coalesce(1).write.mode("append").parquet(indexDir)
  }

  /** Self-compaction for an append-maintained index: when the slice-file
    * count exceeds `maxSlices`, rewrite the whole index (tiny — one row
    * per data file) into ONE file. Append-mode maintenance would otherwise
    * recreate the small-files problem inside the manifest itself: 10k
    * triggers = 10k slice parquets = 10k footer opens per [[prunedRead]]
    * plan. Readers racing the overwrite stay CORRECT, merely less pruned:
    * a missing or partially-listed index makes [[prunedReadWith]] read
    * unmatched files conservatively; it never loses rows.
    *
    * mergeSchema on the rewrite read: slices may carry different stat
    * columns (schema evolution) — the compacted file carries the union.
    */
  def compactIfNeeded(spark: SparkSession, indexDir: String,
                      maxSlices: Int = 256): Boolean = {
    val p = new org.apache.hadoop.fs.Path(indexDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return false
    val slices = fs.listStatus(p).count(st => st.isFile &&
      !st.getPath.getName.startsWith("_") && !st.getPath.getName.startsWith("."))
    if (slices <= maxSlices) return false
    val all = spark.read.option("mergeSchema", "true").parquet(indexDir)
      .localCheckpoint(true) // cut lineage off the dir being overwritten
    all.coalesce(1).write.mode("overwrite").parquet(indexDir)
    true
  }

  /** Closed-interval predicates per column: (name, lo, hi). A file is
    * read iff its [min, max] intersects EVERY given range (and always if
    * the index has no row for it). The returned frame is a SUPERSET of
    * the matching rows — apply the real filter on top; pushed-down
    * row-group pruning still runs inside the surviving files.
    */
  def prunedRead(spark: SparkSession, dir: String,
                 ranges: Seq[(String, Any, Any)]): DataFrame =
    prunedReadWith(spark, dir, s"$dir/$IndexDirName", ranges)

  /** [[prunedRead]] with an explicit index location and reader options —
    * the sink-integration form ([[graft.sinks.ColumnarSink.prunedRead]]
    * keeps one base-level index for its whole layout and scopes reads to
    * one collection directory here). A missing index is the conservative
    * no-op: full read of `dataDir`.
    */
  def prunedReadWith(spark: SparkSession, dataDir: String, indexDir: String,
                     ranges: Seq[(String, Any, Any)],
                     options: Map[String, String] = Map.empty): DataFrame = {
    require(ranges.nonEmpty, "prunedRead needs at least one range")
    def full = spark.read.options(options).option("basePath", dataDir)
      .parquet(dataDir)
    val idxPath = new org.apache.hadoop.fs.Path(indexDir)
    val fsIdx = idxPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fsIdx.exists(idxPath)) return full // no manifest yet: never lose data
    // mergeSchema: appended index slices may carry different stat columns
    // (schema evolution; a column absent from a slice reads as null there)
    val idx = spark.read.option("mergeSchema", "true").parquet(indexDir)
    val dataPrefix = normalize(dataDir).stripSuffix("/") + "/"
    val keep = ranges.map { case (c, lo, hi) =>
      // a range over a never-indexed column must fail LOUDLY — pruning on
      // it would silently drop every indexed file's rows
      require(idx.columns.contains(s"min_$c"),
        s"column $c is not in the stats index at $indexDir")
      col(s"max_$c") >= lit(lo) && col(s"min_$c") <= lit(hi)
    }.reduce(_ && _)
    // driver-side reads of the per-file manifest: one small table, bounded
    // by file count (shard the index itself before this is ever large).
    // Scope to dataDir (a shared index covers sibling collections) and
    // de-dup: a file must never be read twice because two index slices
    // both know it.
    val inScope = idx.filter(col("_file").isNotNull)
      .collect().map(_.getAs[String]("_file"))
      .filter(f => normalize(f).startsWith(dataPrefix)).distinct
    val indexedKeys = inScope.map(normalize).toSet
    val matchSet = idx.filter(keep).select(col("_file")).collect()
      .map(r => normalize(r.getString(0))).toSet
    val matching = inScope.filter(f => matchSet.contains(normalize(f)))

    // conservative two-way staleness sweep against ONE directory listing:
    // files unknown to the index ride along unpruned, and index entries
    // whose file no longer exists (compaction, overwrite) are skipped
    // instead of crashing the read
    val root = new org.apache.hadoop.fs.Path(dataDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(root, true)
    val unknown = scala.collection.mutable.ArrayBuffer.empty[String]
    val present = scala.collection.mutable.HashSet.empty[String]
    while (it.hasNext) {
      val st = it.next()
      val p = st.getPath
      val partOfIndex = normalize(p.toString).contains(s"/$IndexDirName/")
      val hiddenPath = p.toString.split('/')
        .exists(seg => seg.startsWith("_") || seg.startsWith("."))
      if (st.isFile && !partOfIndex && !hiddenPath) {
        present += normalize(p.toString)
        if (!indexedKeys.contains(normalize(p.toString)))
          unknown += p.toString
      }
    }
    val files = matching.filter(p => present.contains(normalize(p))) ++ unknown
    if (files.isEmpty) full.limit(0) // schema-preserving
    // basePath keeps directory-derived (Hive partition) columns in the
    // schema, identical to a whole-directory read
    else spark.read.options(options).option("basePath", dataDir)
      .parquet(files.toIndexedSeq: _*)
  }
}
