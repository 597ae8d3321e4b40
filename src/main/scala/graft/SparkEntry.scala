package graft

import graft.ingest.{JsonDialect, JsonIngest}
import graft.schema.{CollectionId, EventSchema}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` keys map to SURVEY.md §2 operator ids (d* = deserialization,
  * f* = filters, b* = buffering, k* = sinks) plus the beyond-reference
  * LLM-pipeline operators (dedup_*, ann_*, text_*).
  */
object SparkEntry {

  /** Rebuild the driver `events` parquet as Fabric-envelope JSON lines —
    * the wire shape the reference ingests (FIXTURES.md §1). Collection =
    * event_type, project = "demo"; props JSON object is inlined so its `k`
    * field exercises dynamic inference.
    */
  def eventsAsFabricJson(spark: SparkSession, sfDir: String): DataFrame = {
    // `ts` arrives as a nanos-long (spark.sql.legacy.parquet.nanosAsLong);
    // the Fabric wire format wants epoch millis.
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
    ev.select(concat(
      lit("""{"id":""""), col("event_id"), lit("""","metadata":{},"data":{"""),
      lit(""""_project":"demo","_collection":""""), col("event_type"), lit("\","),
      lit(""""_time":"""), expr("ts div 1000000"), lit(","),
      lit(""""_user":"u"""), col("user_id"), lit("\","),
      lit(""""value":"""), col("value"), lit(","),
      lit(""""props":"""), col("props"),
      lit("}}")).as("value"))
  }

  /** Flagship query on sf=0.001; driver smoke-checks rows>0.
    * Full dynamic-schema ingest of the events stream: route → infer →
    * evolve → parse, then a per-collection rollup of the result.
    */
  def entry(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val raw = eventsAsFabricJson(spark, "/root/testdata/sf0.001").as[String]
    val registry = new EventSchema.Registry()
    val (_, parsed) = JsonIngest.ingestLazy(raw, registry, JsonDialect.Fabric)
    val counts = parsed.toSeq.sortBy(_._1.collection).map { case (id, df) =>
      df.agg(count(lit(1)).as("n"), sum($"value").as("sum_value"))
        .select(lit(id.project).as("project"), lit(id.collection).as("collection"),
                $"n", $"sum_value")
    }
    counts.reduce(_ unionAll _)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // D1-D7: dynamic-schema JSON ingest end-to-end (routing, inference,
    // evolution, coercion), rolled up per collection.
    "d7_ingest_route" -> ((s, dir) => {
      import s.implicits._
      val raw = eventsAsFabricJson(s, dir).as[String]
      val registry = new EventSchema.Registry()
      val (_, parsed) = JsonIngest.ingestLazy(raw, registry, JsonDialect.Fabric)
      parsed.toSeq.sortBy(_._1.collection).map { case (id, df) =>
        df.agg(
          count(lit(1)).as("n_events"),
          round(sum($"value"), 2).as("sum_value"),
          round(sum(element_at($"props", "k")), 2).as("sum_props_k"),
          count($"_user").as("n_users"))
         .select(lit(id.collection).as("collection"),
                 $"n_events", $"sum_value", $"sum_props_k", $"n_users")
      }.reduce(_ unionAll _)
    }),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "d7_ingest_route" ->
      """SELECT event_type AS collection,
        |       count(*) AS n_events,
        |       round(sum(value), 2) AS sum_value,
        |       round(sum(CAST(json_extract(props, '$.k') AS DOUBLE)), 2) AS sum_props_k,
        |       count(*) AS n_users
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
  )
}
