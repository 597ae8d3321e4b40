package graft.schema

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** Schema contract for the driver-generated testdata tables.
  *
  * Round 7 lost its entire reference-parity query surface to a silent
  * upstream change (the driver regenerated `events.parquet` and switched
  * `ts` from an INT64-nanos long to `timestamp[us]`); every query failed
  * analysis with an opaque `DATATYPE_MISMATCH` deep inside an expression
  * tree. This guard runs at table-read time (schema metadata only — no
  * job) and turns the next such drift into a one-glance diagnosis naming
  * the exact table + column + expected vs found type.
  *
  * A column may list several accepted types where the driver has shipped
  * more than one encoding historically (`ts`), or where precision is
  * irrelevant to the queries (`label`).
  */
object TableContract {

  /** column -> accepted Spark types (any match passes) */
  private val contracts: Map[String, Seq[(String, Seq[DataType])]] = Map(
    "events" -> Seq(
      "event_id"   -> Seq(LongType),
      // nanos-long (rounds 1-6, via spark.sql.legacy.parquet.nanosAsLong)
      // or native timestamp (round 7+); TimestampNTZType is what a
      // timezone-less parquet timestamp[us] reads as.
      "ts"         -> Seq(LongType, TimestampType, TimestampNTZType),
      "user_id"    -> Seq(LongType),
      "event_type" -> Seq(StringType),
      "value"      -> Seq(DoubleType),
      "props"      -> Seq(StringType)),
    "documents" -> Seq(
      "doc_id"  -> Seq(LongType),
      "text"    -> Seq(StringType),
      "lang"    -> Seq(StringType),
      "source"  -> Seq(StringType),
      "n_chars" -> Seq(LongType)),
    "embeddings" -> Seq(
      "vec_id"    -> Seq(LongType),
      "embedding" -> Seq(ArrayType(FloatType), ArrayType(FloatType, containsNull = false)),
      "label"     -> Seq(IntegerType, LongType)))

  /** Validate `df` against the contract for `table`; no-op for tables
    * without one (region/nation/… are plain TPC-H and have never drifted).
    * Throws IllegalStateException naming every drifted/missing column.
    */
  def check(table: String, df: DataFrame): DataFrame = {
    contracts.get(table).foreach { cols =>
      val actual = df.schema.map(f => f.name -> f.dataType).toMap
      val problems = cols.flatMap { case (name, accepted) =>
        actual.get(name) match {
          case None =>
            Some(s"$name: MISSING (expected ${accepted.map(_.simpleString).mkString(" | ")})")
          case Some(t) if !accepted.contains(t) =>
            Some(s"$name: found ${t.simpleString}, expected ${accepted.map(_.simpleString).mkString(" | ")}")
          case _ => None
        }
      }
      if (problems.nonEmpty) {
        throw new IllegalStateException(
          s"testdata schema drift in table '$table' — the driver has " +
          s"regenerated the parquet with a changed contract. Drifted " +
          s"columns: ${problems.mkString("; ")}. Full schema read: " +
          df.schema.map(f => s"${f.name}:${f.dataType.simpleString}").mkString(", ") +
          ". Update the type-dispatch helpers (SparkEntry.tsMillis et al) " +
          "and this contract.")
      }
    }
    df
  }
}
