package graft.ingest

import graft.schema.{CollectionId, EventSchema, FieldNames}
import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed two-pass ingest of dynamic-schema JSON events.
  *
  * Spark's streaming model fixes the analyzed schema per query, while the
  * reference evolves schemas mid-batch (FabricJsonDeserializer.java:266-301).
  * The Spark-native resolution (SURVEY.md §7.3) is:
  *
  *   pass 1  INFER  — one distributed sweep: per-partition type inference
  *                    (tiny per-collection schemas cross the wire, never data),
  *                    merged on the driver in partition order → deterministic
  *                    authoritative order (existing-then-new, D9).
  *   pass 2  PARSE  — per collection: filter on the pre-extracted routing
  *                    columns (cheap; no JSON re-parse) then full-parse the
  *                    matching rows against the now-fixed StructType.
  *
  * The raw batch is cached between passes, so the full JSON parse runs at
  * most twice per record regardless of collection count — the same two-phase
  * shape the reference uses (routing pre-pass + full parse, SURVEY §4).
  * Nothing here accumulates data on the driver: only schemas do.
  */
object JsonIngest {

  /** Routing pre-pass: `value` plus extracted `_project`/`_collection`
    * columns (null = malformed / unroutable record, dropped downstream —
    * record-skip semantics F3).
    */
  def withRouting(raw: Dataset[String], dialect: JsonDialect): DataFrame = {
    val spark = raw.sparkSession
    import spark.implicits._
    raw.mapPartitions { it =>
      it.map { json =>
        JsonEventParser.routing(json, dialect) match {
          case Some(id) => (json, id.project, id.collection)
          case None     => (json, null.asInstanceOf[String], null.asInstanceOf[String])
        }
      }
    }.toDF("value", "_project", "_collection")
  }

  /** Pass 1: infer per-collection schemas across the whole dataset.
    * Returns observed schemas in deterministic first-seen order (partition
    * index, then document order within the partition).
    */
  def inferSchemas(raw: Dataset[String], dialect: JsonDialect,
                   names: FieldNames = FieldNames()): Map[CollectionId, StructType] =
    inferSchemasWithCounts(raw, dialect, names)._1

  /** Pass 1 with per-collection row counts folded into the same sweep.
    * The streaming hot path needs both the observed schemas and the
    * batch's per-collection sizes (largest-first flush order + cohort
    * gating); counting inside the inference fold saves one job + one
    * shuffle per micro-batch — measurable against the ~1 s fixed
    * per-trigger overhead that dominates small batches.
    */
  def inferSchemasWithCounts(raw: Dataset[String], dialect: JsonDialect,
                             names: FieldNames = FieldNames())
      : (Map[CollectionId, StructType], Map[CollectionId, Long]) = {
    val spark = raw.sparkSession
    import spark.implicits._
    // Per-partition: merge every event's inferred fields into one schema
    // per collection, then emit (partitionId, project, collection,
    // schemaJson, rows). Only schemas + counts cross the wire, never data.
    val partial: Array[(Int, String, String, String, Long)] = raw.mapPartitions { it =>
      val acc = scala.collection.mutable.LinkedHashMap.empty[CollectionId, (StructType, Long)]
      it.foreach { json =>
        JsonEventParser.inferEvent(json, dialect, names).foreach { case (id, fields) =>
          val observed = StructType(fields.toSeq.map { case (n, ft) =>
            StructField(n, ft.sparkType, nullable = true)
          })
          acc(id) = acc.get(id) match {
            case Some((cur, n)) => (EventSchema.evolve(cur, observed), n + 1)
            case None           => (observed, 1L)
          }
        }
      }
      val pid = org.apache.spark.TaskContext.getPartitionId()
      acc.iterator.map { case (id, (st, n)) =>
        (pid, id.project, id.collection, st.json, n)
      }
    }.collect()

    // Driver-side merge in partition order → deterministic column order.
    val merged = scala.collection.mutable.LinkedHashMap.empty[CollectionId, StructType]
    val counts = scala.collection.mutable.HashMap.empty[CollectionId, Long]
    partial.sortBy(_._1).foreach { case (_, p, c, js, n) =>
      val id = CollectionId(p, c)
      val st = DataType.fromJson(js).asInstanceOf[StructType]
      merged(id) = merged.get(id) match {
        case Some(cur) => EventSchema.evolve(cur, st)
        case None      => st
      }
      counts(id) = counts.getOrElse(id, 0L) + n
    }
    (merged.toMap, counts.toMap)
  }

  /** Pass 2: parse the rows of one collection against its fixed schema.
    * `routed` must be the output of [[withRouting]] (cached by [[ingest]]).
    */
  def parseCollection(routed: DataFrame, id: CollectionId, schema: StructType,
                      dialect: JsonDialect, names: FieldNames = FieldNames()): DataFrame = {
    val spark = routed.sparkSession
    import spark.implicits._
    val subset = routed
      .filter($"_project" === id.project && $"_collection" === id.collection)
      .select($"value").as[String]
    val enc = Encoders.row(schema)
    subset.mapPartitions { it =>
      it.flatMap { json =>
        JsonEventParser.parseEvent(json, dialect, schema, names).map(_._2)
      }
    }(enc)
  }

  /** Pass-2 variant for a same-schema COHORT of collections: parse every
    * member's rows against the shared fixed schema in one distributed pass,
    * tagging each output row with its routing columns so one partitioned
    * write can land the whole cohort (`EventSink.insertConsolidated`).
    * Per-record semantics are exactly [[parseCollection]]'s (the same
    * `JsonEventParser.parseEvent` call against the same authoritative
    * schema) — only the job structure changes: ONE scan of the cached
    * batch for C collections instead of C filtered scans, which is what
    * keeps the driver off the critical path at 10k live collections.
    */
  def parseCohort(routed: DataFrame, members: Set[(String, String)],
                  schema: StructType, dialect: JsonDialect,
                  names: FieldNames = FieldNames()): DataFrame = {
    val spark = routed.sparkSession
    val outSchema = StructType(schema.fields ++ Seq(
      StructField("_project", StringType, nullable = false),
      StructField("_collection", StringType, nullable = false)))
    val enc = Encoders.row(outSchema)
    val membersB = spark.sparkContext.broadcast(members)
    routed.select(col("value"), col("_project"), col("_collection"))
      .mapPartitions { it =>
        val m = membersB.value
        it.flatMap { r =>
          val p = r.getString(1); val c = r.getString(2)
          if (p == null || c == null || !m((p, c))) Iterator.empty
          else JsonEventParser.parseEvent(r.getString(0), dialect, schema, names)
            .map(t => Row.fromSeq(t._2.toSeq :+ p :+ c)).iterator
        }
      }(enc)
  }

  /** [[parseCohort]] over EVERY routed row: when the whole batch shares
    * one fixed schema, the member set is redundant — [[withRouting]] has
    * already validated and normalized each row's collection
    * (JsonEventParser.routing applies CollectionId.isValid + normalize),
    * so filtering the cohort to "all valid collections" is a no-op. One
    * scan, no membership broadcast, no per-collection loop.
    */
  def parseAllRouted(routed: DataFrame, schema: StructType,
                     dialect: JsonDialect,
                     names: FieldNames = FieldNames()): DataFrame = {
    val outSchema = StructType(schema.fields ++ Seq(
      StructField("_project", StringType, nullable = false),
      StructField("_collection", StringType, nullable = false)))
    val enc = Encoders.row(outSchema)
    routed.select(col("value"), col("_project"), col("_collection"))
      .mapPartitions { it =>
        it.flatMap { r =>
          val p = r.getString(1); val c = r.getString(2)
          if (p == null || c == null) Iterator.empty
          else JsonEventParser.parseEvent(r.getString(0), dialect, schema, names)
            .map(t => Row.fromSeq(t._2.toSeq :+ p :+ c)).iterator
        }
      }(enc)
  }

  /** Full batch ingest: route → infer → evolve registry → per-collection
    * parse. Registry order is authoritative (metastore semantics D8/D9):
    * existing columns first in registered order, new columns appended.
    */
  def ingest(raw: Dataset[String], registry: EventSchema.Registry,
             dialect: JsonDialect = JsonDialect.Fabric,
             names: FieldNames = FieldNames()): Map[CollectionId, DataFrame] = {
    val routed = withRouting(raw, dialect)
      .filter(col("_project").isNotNull)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val observed = inferSchemas(routed.select(col("value")).as(Encoders.STRING), dialect, names)
      observed.map { case (id, obs) =>
        registry.getOrCreate(id)
        val authoritative = registry.addColumns(id, obs)
        id -> parseCollection(routed, id, authoritative, dialect, names)
          .localCheckpoint(false) // materialize off the shared cached batch
      }
    } finally {
      // caller-visible DataFrames are checkpointed, safe to unpersist lazily
      routed.unpersist(false)
    }
  }

  /** Ingest a batch whose routing columns are ALREADY extracted (the
    * streaming pipeline's decouple pre-pass produces `value`/`_project`/
    * `_collection` — re-running [[withRouting]] would parse every record a
    * second time for nothing). `routed` must be persisted by the caller.
    */
  def ingestRouted(routed: DataFrame, registry: EventSchema.Registry,
                   dialect: JsonDialect = JsonDialect.Fabric,
                   names: FieldNames = FieldNames())
      : Map[CollectionId, DataFrame] = {
    val observed = inferSchemas(routed.select(col("value")).as(Encoders.STRING), dialect, names)
    observed.map { case (id, obs) =>
      registry.getOrCreate(id)
      val authoritative = registry.addColumns(id, obs)
      id -> parseCollection(routed, id, authoritative, dialect, names)
    }
  }

  /** Schema-fixed fast path (the reference's fixed-schema mode: unknown
    * collections are skipped rather than created,
    * MessageEventTransformer.java:65-93): no inference job, no driver
    * round-trip — one routing pass + one parse pass against the registry's
    * authoritative schemas. Use when the stream's schemas are stable
    * (`IngestConfig.schemaFixed`).
    */
  def ingestFixed(raw: Dataset[String], registry: EventSchema.Registry,
                  dialect: JsonDialect = JsonDialect.Fabric,
                  names: FieldNames = FieldNames())
      : (DataFrame, Map[CollectionId, DataFrame]) = {
    val routed = withRouting(raw, dialect)
      .filter(col("_project").isNotNull)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val parsed = registry.all.map { case (id, schema) =>
      id -> parseCollection(routed, id, schema, dialect, names)
    }
    (routed, parsed)
  }

  /** Convenience for tests + the e2e query: run [[ingest]] but keep lazy
    * plans (no checkpoint), returning also the routed cache handle so the
    * caller controls unpersist timing.
    */
  def ingestLazy(raw: Dataset[String], registry: EventSchema.Registry,
                 dialect: JsonDialect = JsonDialect.Fabric,
                 names: FieldNames = FieldNames())
      : (DataFrame, Map[CollectionId, DataFrame]) = {
    val routed = withRouting(raw, dialect)
      .filter(col("_project").isNotNull)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val observed = inferSchemas(routed.select(col("value")).as(Encoders.STRING), dialect, names)
    val parsed = observed.map { case (id, obs) =>
      registry.getOrCreate(id)
      val authoritative = registry.addColumns(id, obs)
      id -> parseCollection(routed, id, authoritative, dialect, names)
    }
    (routed, parsed)
  }
}
