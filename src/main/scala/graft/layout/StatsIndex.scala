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
  *
  * Each manifest row records WHICH columns were in the indexed set when
  * its slice was written (`_stat_cols`), so two distinct situations that
  * both surface as a null min/max after a merged-schema read stay
  * distinguishable:
  *   - column in `_stat_cols`, null stats → the file holds NO values of
  *     the column (pre-evolution or all-null) → pruning it is EXACT;
  *   - column NOT in `_stat_cols` (indexed by an earlier writer with a
  *     narrower column set) → UNKNOWN → the file is read conservatively.
  * Without the marker, a later writer widening the indexed set would
  * silently drop earlier files' matching rows from every pruned read.
  *
  * Durability model: every append lands as ONE atomically-renamed slice
  * file staged in a slice-private hidden directory — no two writers (even
  * in different JVMs over the same store) ever share committer staging,
  * so concurrent appends cannot collide. Self-compaction writes the
  * merged slice FIRST and deletes the inputs after: the manifest is never
  * missing mid-rewrite, racing readers at worst see duplicate rows per
  * file (deduplicated in [[prunedReadWith]]), and a reader that loses the
  * race to a slice delete degrades to a full read via the catch-all
  * fallback — never a crash, never a lost row.
  */
object StatsIndex {

  val IndexDirName = "_graft_stats_index"

  /** Scheme/authority-free normal form so `input_file_name` URIs
    * (`file:///x`) compare equal to Hadoop listing paths (`file:/x`).
    * Only used as a comparison key — reads use the stored URI verbatim.
    * String fast paths for the two local-fs spellings: planning calls
    * this once per manifest row, and `new Path(p).toUri` costs ~µs of
    * URI parsing each — a measured fraction of a second at 100k files.
    * (Hadoop `Path(String)` round-trips the path portion byte-exact —
    * including literal `%` from partition escaping — so stripping the
    * scheme prefix is the same result.)
    *
    * The fast path must also COLLAPSE duplicate/trailing slashes the way
    * Hadoop `Path` does: listing/`input_file_name` keys come back
    * slash-collapsed, so a caller-supplied dataDir like `/x//` or `/x/`
    * returned verbatim would make every prefix compare fail — in the
    * trusted steady-state plan that silently reads ZERO rows, not just
    * slower. Any `//` or trailing `/` demotes to the Path fallback.
    */
  private[graft] def normalize(p: String): String = {
    def clean(s: String): String =
      if (!s.contains("//") && (s.length <= 1 || !s.endsWith("/"))) s
      else new org.apache.hadoop.fs.Path(s).toUri.getPath
    if (p.startsWith("/")) clean(p)
    else if (p.startsWith("file:")) {
      val rest = p.substring(5)
      if (!rest.startsWith("//")) clean(rest) // file:/x
      else if (rest.length > 2 && rest.charAt(2) == '/') clean(rest.substring(2)) // file:///x
      else new org.apache.hadoop.fs.Path(p).toUri.getPath // file://host/x
    } else new org.apache.hadoop.fs.Path(p).toUri.getPath
  }

  private def fsOf(p: org.apache.hadoop.fs.Path,
                   spark: SparkSession): org.apache.hadoop.fs.FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Per-file stats rows: min/max for each PRESENT column + row count +
    * the full REQUESTED column set as the `_stat_cols` marker (a column
    * requested but absent from every input file yields no stats columns
    * here, yet is still recorded as indexed — exact: those files hold no
    * such values).
    */
  private def statsOf(df: DataFrame, present: Seq[String],
                      requested: Seq[String]): DataFrame = {
    val aggs = present.flatMap(c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))) :+
      count(lit(1)).as("n_rows")
    df.select(input_file_name().as("_file") +: present.map(col): _*)
      .groupBy(col("_file"))
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("_stat_cols", array(requested.map(lit): _*))
  }

  /** Land `df` as ONE slice file `indexDir/slice-<uuid>.parquet` via a
    * slice-private hidden staging directory + rename. Unlike a Spark
    * append job, two concurrent writers (same or different JVMs) never
    * touch shared `_temporary` staging, so cross-instance appends over
    * one basePath cannot collide or drop each other's slices.
    */
  private def writeSlice(spark: SparkSession, indexDir: String,
                         df: DataFrame): Unit = {
    val uuid = java.util.UUID.randomUUID().toString
    val staging = new org.apache.hadoop.fs.Path(s"$indexDir/.staging-$uuid")
    val fs = fsOf(staging, spark)
    df.coalesce(1).write.mode("overwrite").parquet(staging.toString)
    val part = fs.listStatus(staging).find(st => st.isFile &&
      st.getPath.getName.startsWith("part-"))
    part.foreach { st =>
      fs.rename(st.getPath,
        new org.apache.hadoop.fs.Path(s"$indexDir/slice-$uuid.parquet"))
      ()
    }
    fs.delete(staging, true)
    ()
  }

  /** One pass over `dir`: per-file min/max for `cols` + row count, written
    * to `dir/_graft_stats_index`. Returns the number of indexed files.
    */
  def build(spark: SparkSession, dir: String, cols: Seq[String]): Long = {
    require(cols.nonEmpty, "index needs at least one column")
    statsOf(spark.read.parquet(dir), cols, cols)
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/$IndexDirName")
    spark.read.parquet(s"$dir/$IndexDirName").count()
  }

  /** Incremental manifest maintenance — index ONLY the given just-written
    * files and land their stats rows as one new slice in `indexDir`. This
    * is the write-time path ([[graft.sinks.ColumnarSink]] calls it after
    * each insert, the way the reference computes shard stats at write —
    * InMemoryOrcStorageManager.java:188-207): one small job over files
    * that are still hot, columns pruned to the indexed set. A column
    * missing from a file's schema (pre-evolution batches) reads as all
    * nulls → null min/max WITH the column in `_stat_cols`, which
    * [[prunedRead]] correctly prunes: no row in that file can satisfy a
    * range on the column. Columns outside `cols` are recorded as
    * not-indexed for these rows and read conservatively by later, wider
    * indexes.
    */
  def appendFor(spark: SparkSession, indexDir: String, basePath: String,
                files: Seq[String], cols: Seq[String]): Unit = {
    if (files.isEmpty) return
    val df = spark.read.option("basePath", basePath).parquet(files: _*)
    val present = cols.filter(df.columns.contains)
    writeSlice(spark, indexDir, statsOf(df, present, cols))
  }

  /** Sharded multi-collection append — the consolidated-cohort companion
    * to [[appendFor]]: ONE stats job over every just-written file of a
    * cohort, staged partitioned by the layout's own (project, collection)
    * directory columns, then each staged file renamed into its
    * per-collection shard `indexRoot/project=…/collection=…/slice-….parquet`.
    * Sharding is what keeps pruned-read planning flat at 100 TB file
    * counts: a one-collection [[prunedReadWith]] reads ONLY its own shard
    * and never collects sibling collections' manifest rows. The staging
    * dir is append-private (hidden, uuid-named), so cross-instance cohort
    * appends cannot collide either. Returns the touched shard dirs (for
    * per-shard self-compaction).
    */
  def appendSharded(spark: SparkSession, indexRoot: String, basePath: String,
                    files: Seq[String], cols: Seq[String]): Seq[String] = {
    if (files.isEmpty) return Nil
    val df = spark.read.option("basePath", basePath).parquet(files: _*)
    require(df.columns.contains("project") && df.columns.contains("collection"),
      s"appendSharded needs a project=/collection= partitioned layout under $basePath")
    val present = cols.filter(df.columns.contains)
    val aggs = present.flatMap(c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))) ++
      Seq(count(lit(1)).as("n_rows"),
        first(col("project")).as("project"),
        first(col("collection")).as("collection"))
    val stats = df.select(input_file_name().as("_file") +:
        (present.map(col) ++ Seq(col("project"), col("collection"))): _*)
      .groupBy(col("_file"))
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("_stat_cols", array(cols.map(lit): _*))
    val uuid = java.util.UUID.randomUUID().toString
    val staging = new org.apache.hadoop.fs.Path(s"$indexRoot/.staging-$uuid")
    val fs = fsOf(staging, spark)
    // coalesce(1): the stats frame is one row per data file — a single
    // task writes one file per (project, collection) with no shuffle, and
    // partitionBy applies the SAME path escaping as the data layout, so
    // staged dir names match the shard dirs exactly
    stats.coalesce(1).write.partitionBy("project", "collection")
      .mode("overwrite").parquet(staging.toString)
    val touched = scala.collection.mutable.ArrayBuffer.empty[String]
    for (proj <- fs.listStatus(staging)
         if proj.isDirectory && proj.getPath.getName.startsWith("project="))
      for (coll <- fs.listStatus(proj.getPath)
           if coll.isDirectory && coll.getPath.getName.startsWith("collection=")) {
        val shard = new org.apache.hadoop.fs.Path(
          s"$indexRoot/${proj.getPath.getName}/${coll.getPath.getName}")
        fs.mkdirs(shard)
        fs.listStatus(coll.getPath)
          .filter(st => st.isFile && st.getPath.getName.startsWith("part-"))
          .zipWithIndex.foreach { case (st, i) =>
            fs.rename(st.getPath,
              new org.apache.hadoop.fs.Path(s"$shard/slice-$uuid-$i.parquet"))
          }
        touched += shard.toString
      }
    fs.delete(staging, true)
    touched.toSeq
  }

  /** Self-compaction for an append-maintained index: when the slice-file
    * count exceeds `maxSlices`, merge every CURRENT slice into one new
    * slice and delete the inputs. Append-mode maintenance would otherwise
    * recreate the small-files problem inside the manifest itself: 10k
    * triggers = 10k slice parquets = 10k footer opens per [[prunedRead]]
    * plan. Ordering makes the race window benign: the merged slice lands
    * (rename) BEFORE any input is deleted, so the manifest is never
    * missing — a racing reader at worst sees a file's row twice
    * (deduplicated in [[prunedReadWith]]) or loses a slice mid-scan and
    * falls back to the conservative full read. Slices appended
    * concurrently by another writer are untouched: the merge reads an
    * explicit snapshot file list, not the directory.
    *
    * mergeSchema on the snapshot read: slices may carry different stat
    * columns (schema evolution / widened index sets) — the compacted
    * slice carries the union. Compaction failure (e.g. two instances
    * compacting one shard concurrently) is swallowed: the manifest is
    * advisory and the next append retries.
    */
  def compactIfNeeded(spark: SparkSession, indexDir: String,
                      maxSlices: Int = 256): Boolean = try {
    val p = new org.apache.hadoop.fs.Path(indexDir)
    val fs = fsOf(p, spark)
    if (!fs.exists(p)) return false
    val entries = fs.listStatus(p)
    // a writer that crashed between staging and rename leaves its hidden
    // `.staging-<uuid>` dir behind forever (its slice never landed —
    // degraded pruning only, the data files read conservatively as
    // unknown). Reap ones old enough that no live append can own them;
    // this piggybacks on the listing every append already pays for.
    entries.filter(st => st.isDirectory &&
        st.getPath.getName.startsWith(".staging-") &&
        st.getModificationTime < System.currentTimeMillis() - 3600000L)
      .foreach(st => fs.delete(st.getPath, true))
    val slices = entries.filter(st => st.isFile &&
      !st.getPath.getName.startsWith("_") && !st.getPath.getName.startsWith("."))
    if (slices.length <= maxSlices) return false
    val merged = spark.read.option("mergeSchema", "true")
      .parquet(slices.map(_.getPath.toString).toIndexedSeq: _*)
    writeSlice(spark, indexDir, merged)
    slices.foreach(st => fs.delete(st.getPath, false))
    true
  } catch {
    case scala.util.control.NonFatal(e) =>
      System.err.println(s"[graft] stats-index compaction skipped for $indexDir: $e")
      false
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
    * keeps one per-collection shard for its whole layout and passes the
    * shard dir here). A missing index is the conservative no-op: full
    * read of `dataDir`. Any failure reading the manifest itself (a slice
    * deleted by a racing self-compaction, a torn slice) degrades the SAME
    * way — full read, never a crashed query; only a range over a column
    * the index never carried fails loudly (pruning on it would silently
    * drop every indexed file's rows).
    *
    * `trustedSubdirs`: normalized paths of IMMEDIATE subdirectories of
    * `dataDir` whose manifest coverage the CALLER certifies as complete
    * (the sink passes its commit-marked `batch=N` dirs — the marker is
    * written only after the batch's stats slice lands, so marker presence
    * proves the manifest enumerates every file of the dir). Trusted dirs
    * are never walked: the staleness sweep — which is linear in the
    * TARGET collection's file count, measured 5.9 s at 100k files —
    * shrinks to the UNMARKED dirs only, making planning O(#commits +
    * #manifest rows) instead of O(#files). Two demotions keep this exact
    * rather than optimistic: a trusted dir with ZERO manifest rows is
    * walked anyway (its data predates stats being enabled — trusting
    * would silently drop all its rows), and every kept file under a
    * trusted dir gets one existence probe (O(kept), not O(total)) so
    * entries staled by a racing compaction/overwrite are skipped the
    * same way the full sweep skips them.
    */
  def prunedReadWith(spark: SparkSession, dataDir: String, indexDir: String,
                     ranges: Seq[(String, Any, Any)],
                     options: Map[String, String] = Map.empty,
                     trustedSubdirs: Set[String] = Set.empty): DataFrame = {
    require(ranges.nonEmpty, "prunedRead needs at least one range")
    def full = spark.read.options(options).option("basePath", dataDir)
      .parquet(dataDir)
    val dataPrefix = normalize(dataDir).stripSuffix("/") + "/"
    // (matching (file, normalizedKey) pairs, every indexed file key) —
    // None when the manifest is absent or unreadable (racing compaction):
    // conservative full read
    val planned: Option[(Seq[(String, String)], Set[String])] = try {
      val idxPath = new org.apache.hadoop.fs.Path(indexDir)
      if (!fsOf(idxPath, spark).exists(idxPath)) None
      else {
        // mergeSchema: appended index slices may carry different stat
        // columns (schema evolution; a column absent from a slice reads as
        // null there)
        val idx = spark.read.option("mergeSchema", "true").parquet(indexDir)
        // rows from slices written before `_stat_cols` existed carry null
        // → treated as not-indexed → conservative keep
        val hasMarker = idx.columns.contains("_stat_cols")
        val keep = ranges.map { case (c, lo, hi) =>
          // a range over a never-indexed column must fail LOUDLY — pruning
          // on it would silently drop every indexed file's rows
          require(idx.columns.contains(s"min_$c"),
            s"column $c is not in the stats index at $indexDir")
          val inRange = col(s"max_$c") >= lit(lo) && col(s"min_$c") <= lit(hi)
          if (!hasMarker) inRange
          else {
            // `c` indexed for this row → null stats mean the file holds no
            // `c` values at all (exact prune); `c` NOT indexed (earlier
            // writer, narrower statsColumns) → unknown → keep the file
            val indexedC =
              coalesce(array_contains(col("_stat_cols"), lit(c)), lit(false))
            !indexedC || inRange
          }
        }.reduce(_ && _)
        // STEADY-STATE FAST PATH: when the caller certifies every
        // subdirectory and no root-level files exist, planning needs only
        // the MATCHING manifest rows plus a tiny per-dir coverage
        // aggregate (the zero-coverage demotion check, distributed) —
        // never a driver pass over the full manifest. This is what makes
        // planning independent of the collection's file count: measured
        // 2.9 s for a 10⁶-row manifest through the all-rows collect
        // below, ~0.3 s through this path. Any untrusted dir, root file,
        // or uncovered dir falls through to the general path (a walk is
        // happening there anyway, so the O(manifest) collect is
        // proportionate).
        if (trustedSubdirs.nonEmpty) {
          val rootP = new org.apache.hadoop.fs.Path(dataDir)
          val fsT = fsOf(rootP, spark)
          if (fsT.exists(rootP)) {
            val entries = fsT.listStatus(rootP).filter { st =>
              val n = st.getPath.getName
              !n.startsWith("_") && !n.startsWith(".")
            }
            val dirNorms = entries.filter(_.isDirectory)
              .map(st => normalize(st.getPath.toString))
            if (entries.forall(_.isDirectory) &&
                dirNorms.forall(trustedSubdirs.contains)) {
              // per-dir manifest coverage, computed distributively (the
              // result is one row per batch dir, not per file)
              val covered = idx.filter(col("_file").isNotNull)
                .groupBy(expr("substring(_file, 1, length(_file) - " +
                  "length(substring_index(_file, '/', -1)) - 1)").as("_dir"))
                .count().collect().map(r => normalize(r.getString(0))).toSet
              if (dirNorms.forall(covered.contains)) {
                val seenT = scala.collection.mutable.HashSet.empty[String]
                val files = idx.filter(col("_file").isNotNull).filter(keep)
                  .select(col("_file")).collect().iterator
                  .map(_.getString(0))
                  .filter { f =>
                    val n = normalize(f)
                    // scope + dedup + the O(kept) staleness probe
                    n.startsWith(dataPrefix) && seenT.add(n) &&
                      fsT.exists(new org.apache.hadoop.fs.Path(f))
                  }.toIndexedSeq
                return if (files.isEmpty) full.limit(0)
                else spark.read.options(options).option("basePath", dataDir)
                  .parquet(files: _*)
              }
            }
          }
        }
        // driver-side read of the per-file manifest: ONE job collecting
        // (file, keep) pairs — the table is small, bounded by the SHARD's
        // file count (ColumnarSink shards the index per collection, so
        // sibling collections' rows are never loaded), but planning
        // latency is this loop, so it normalizes each path exactly once.
        // Scope to dataDir (defense for unsharded/legacy indexes) and
        // de-dup: a file must never be read twice because two index
        // slices both know it.
        val rows = idx.filter(col("_file").isNotNull)
          .select(col("_file"), keep.as("_keep")).collect()
        val seen = scala.collection.mutable.HashSet.empty[String]
        val inScope = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
        val matchNorm = scala.collection.mutable.HashSet.empty[String]
        rows.foreach { r =>
          val f = r.getString(0)
          val n = normalize(f)
          if (n.startsWith(dataPrefix)) {
            if (seen.add(n)) inScope += ((f, n))
            // null keep (null stats under a three-valued range) = not kept
            if (!r.isNullAt(1) && r.getBoolean(1)) matchNorm += n
          }
        }
        Some((inScope.filter(t => matchNorm.contains(t._2)).toSeq,
          seen.toSet))
      }
    } catch {
      case e: IllegalArgumentException => throw e // never-indexed column
      case scala.util.control.NonFatal(e) =>
        System.err.println(
          s"[graft] stats index unreadable at $indexDir (racing compaction?): " +
            s"$e — degrading to full read")
        None
    }
    planned match {
      case None => full
      case Some((matching, indexedKeys)) =>
        // conservative two-way staleness sweep against ONE directory
        // walk (per-directory listStatus via FsWalk — Hadoop's recursive
        // listFiles costs 4 ms/file locally, 120 s measured at 30k
        // files; the hidden `_graft_stats_index` subtree prunes at
        // directory level): files unknown to the index ride along
        // unpruned, and index entries whose file no longer exists
        // (compaction, overwrite) are skipped instead of crashing the
        // read. Caller-certified trusted subdirs skip the walk entirely
        // — see the scaladoc above.
        val root = new org.apache.hadoop.fs.Path(dataDir)
        val fs = fsOf(root, spark)
        val unknown = scala.collection.mutable.ArrayBuffer.empty[String]
        val present = scala.collection.mutable.HashSet.empty[String]
        def sweep(p: org.apache.hadoop.fs.Path): Unit =
          graft.util.FsWalk.dataFiles(fs, p).foreach { f =>
            present += normalize(f)
            if (!indexedKeys.contains(normalize(f))) unknown += f
          }
        // dirs with ≥1 manifest row — the zero-coverage demotion check
        // (one pass over the keys, driver-side)
        lazy val coveredDirs: Set[String] =
          indexedKeys.map(k => k.substring(0, math.max(0, k.lastIndexOf('/'))))
        val trusted = scala.collection.mutable.HashSet.empty[String]
        if (trustedSubdirs.isEmpty) sweep(root)
        else if (!fs.exists(root)) ()
        else fs.listStatus(root).foreach { st =>
          val name = st.getPath.getName
          if (!name.startsWith("_") && !name.startsWith(".")) {
            val n = normalize(st.getPath.toString)
            if (st.isFile) {
              present += n
              if (!indexedKeys.contains(n)) unknown += st.getPath.toString
            } else if (trustedSubdirs.contains(n) &&
                coveredDirs.contains(n)) trusted += n
            else sweep(st.getPath)
          }
        }
        def kept(p: String, n: String): Boolean =
          if (present.contains(n)) true
          else {
            val parent = n.substring(0, math.max(0, n.lastIndexOf('/')))
            // per-file existence probe ONLY for trusted-dir entries —
            // bounded by the KEPT set, skips compaction-staled rows
            trusted.contains(parent) &&
              fs.exists(new org.apache.hadoop.fs.Path(p))
          }
        val files = matching.collect { case (p, n) if kept(p, n) => p } ++ unknown
        if (files.isEmpty) full.limit(0) // schema-preserving
        // basePath keeps directory-derived (Hive partition) columns in the
        // schema, identical to a whole-directory read
        else spark.read.options(options).option("basePath", dataDir)
          .parquet(files.toIndexedSeq: _*)
    }
  }
}
