package graft

import graft.ingest.AvroIngest
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.EncoderFactory
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import java.io.ByteArrayOutputStream

/** Property round-trip for the Avro wire path: random schemas + random
  * (nullable) values → encode with the derived writer schema → decode via
  * the tagged-record path → external Row, field by field. Complements the
  * JSON property spec with the schema-fixed wire format.
  */
class AvroRoundTripPropertySpec extends SparkSpec {

  private def samples[T](gen: Gen[T], n: Int = 100): Seq[T] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(7L + i)))

  // (spark type, avro-side value generator, expected row value)
  private val fieldGen: Gen[(DataType, Any)] = Gen.oneOf(
    Gen.alphaNumStr.map(_.take(50)).map(s => (StringType, s: Any)),
    Gen.chooseNum(Long.MinValue / 2, Long.MaxValue / 2).map(l => (LongType, l: Any)),
    Gen.chooseNum(-1e9, 1e9).map(d => (DoubleType, d: Any)),
    Gen.oneOf(true, false).map(b => (BooleanType, b: Any)),
    Gen.chooseNum(0L, 4102444800000L).map(ms => (TimestampType, ms: Any)),
    Gen.chooseNum(0, 40000).map(days => (DateType, days: Any)),
    Gen.const((StringType, null: Any)), // nullable union exercised
    Gen.nonEmptyListOf(Gen.chooseNum(-1000.0, 1000.0)).map(_.take(5))
      .map(xs => (ArrayType(DoubleType), xs: Any)))

  private val rowGen: Gen[List[(String, (DataType, Any))]] =
    Gen.nonEmptyListOf(Gen.zip(
      Gen.identifier.suchThat(_.nonEmpty).map("f" + _.take(12)),
      fieldGen)).map(_.distinctBy(_._1).take(6))

  test("property: random schemas/values round-trip encode→decode") {
    samples(rowGen).foreach { fields =>
      val schema = StructType(fields.map { case (n, (dt, _)) =>
        StructField(n, dt) })
      val avro = AvroIngest.avroSchema(schema, "ev")
      val rec = new GenericData.Record(avro)
      fields.foreach { case (n, (dt, v)) =>
        val avroVal = (dt, v) match {
          case (_, null) => null
          case (ArrayType(_, _), xs: List[_]) =>
            val l = new java.util.ArrayList[Any](); xs.foreach(l.add); l
          case (_, x) => x
        }
        rec.put(n, avroVal)
      }
      val out = new ByteArrayOutputStream()
      out.write(0) // tag 0: inline, routing from key
      val enc = EncoderFactory.get().directBinaryEncoder(out, null)
      new GenericDatumWriter[GenericRecord](avro).write(rec, enc)
      enc.flush()

      val Some((id, row)) = AvroIngest.decodeTagged("p.c", out.toByteArray, '.',
        _ => Some((avro, schema)))
      assert(id == graft.schema.CollectionId("p", "c"))
      fields.foreach { case (n, (dt, v)) =>
        val i = schema.fieldIndex(n)
        (dt, v) match {
          case (_, null)          => assert(row.isNullAt(i), s"$n not null")
          case (StringType, s)    => assert(row.getString(i) == s, n)
          case (LongType, l)      => assert(row.getLong(i) == l, n)
          case (DoubleType, d)    => assert(row.getDouble(i) == d, n)
          case (BooleanType, b)   => assert(row.getBoolean(i) == b, n)
          case (TimestampType, ms: Long) =>
            assert(row.getTimestamp(i).getTime == ms, n)
          case (DateType, days: Int) =>
            assert(row.getDate(i).toLocalDate.toEpochDay == days.toLong, n)
          case (ArrayType(_, _), xs: List[_]) =>
            assert(row.getSeq[Double](i).toList == xs, n)
          case other => fail(s"unexpected case $other")
        }
      }
    }
  }
}
