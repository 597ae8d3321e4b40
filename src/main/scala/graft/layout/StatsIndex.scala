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

  /** One pass over `dir`: per-file min/max for `cols` + row count, written
    * to `dir/_graft_stats_index`. Returns the number of indexed files.
    */
  def build(spark: SparkSession, dir: String, cols: Seq[String]): Long = {
    require(cols.nonEmpty, "index needs at least one column")
    val df = spark.read.parquet(dir)
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))) :+
      count(lit(1)).as("n_rows")
    df.select(input_file_name().as("_file") +: cols.map(col): _*)
      .groupBy(col("_file"))
      .agg(aggs.head, aggs.tail: _*)
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/$IndexDirName")
    spark.read.parquet(s"$dir/$IndexDirName").count()
  }

  /** Closed-interval predicates per column: (name, lo, hi). A file is
    * read iff its [min, max] intersects EVERY given range (and always if
    * the index has no row for it). The returned frame is a SUPERSET of
    * the matching rows — apply the real filter on top; pushed-down
    * row-group pruning still runs inside the surviving files.
    */
  def prunedRead(spark: SparkSession, dir: String,
                 ranges: Seq[(String, Any, Any)]): DataFrame = {
    require(ranges.nonEmpty, "prunedRead needs at least one range")
    val idx = spark.read.parquet(s"$dir/$IndexDirName")
    val keep = ranges.map { case (c, lo, hi) =>
      col(s"max_$c") >= lit(lo) && col(s"min_$c") <= lit(hi)
    }.reduce(_ && _)
    // driver-side reads of the per-file manifest: one small table, bounded
    // by file count (shard the index itself before this is ever large)
    val indexedKeys = idx.select(col("_file")).collect()
      .map(r => normalize(r.getString(0))).toSet
    val matching = idx.filter(keep).select(col("_file")).collect()
      .map(_.getString(0))

    // conservative two-way staleness sweep against ONE directory listing:
    // files unknown to the index ride along unpruned, and index entries
    // whose file no longer exists (compaction, overwrite) are skipped
    // instead of crashing the read
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(root, true)
    val unknown = scala.collection.mutable.ArrayBuffer.empty[String]
    val present = scala.collection.mutable.HashSet.empty[String]
    while (it.hasNext) {
      val st = it.next()
      val p = st.getPath
      val partOfIndex = normalize(p.toString).contains(s"/$IndexDirName/")
      val hiddenName = p.getName.startsWith("_") || p.getName.startsWith(".")
      if (st.isFile && !partOfIndex && !hiddenName) {
        present += normalize(p.toString)
        if (!indexedKeys.contains(normalize(p.toString)))
          unknown += p.toString
      }
    }
    val files = matching.filter(p => present.contains(normalize(p))) ++ unknown
    if (files.isEmpty) spark.read.parquet(dir).limit(0) // schema-preserving
    // basePath keeps directory-derived (Hive partition) columns in the
    // schema, identical to a whole-directory read
    else spark.read.option("basePath", dir).parquet(files.toIndexedSeq: _*)
  }
}
