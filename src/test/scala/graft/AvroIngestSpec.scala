package graft

import graft.ingest.AvroIngest
import graft.schema.{CollectionId, FieldNames}
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.EncoderFactory
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import java.io.ByteArrayOutputStream

/** Mirrors the reference's TestKinesisAvroDeserializer (GenericData record +
  * binaryEncoder + 1-byte tag prefix) and the bulk framing tests.
  */
class AvroIngestSpec extends AnyFunSuite {
  private val names = FieldNames()
  private val rowSchema = StructType(Seq(
    StructField("_time", TimestampType), StructField("_user", StringType),
    StructField("n", DoubleType), StructField("d", DateType)))
  private val avro = AvroIngest.avroSchema(rowSchema, "testcoll")

  private def encode(schema: org.apache.avro.Schema, set: GenericData.Record => Unit): Array[Byte] = {
    val rec = new GenericData.Record(schema)
    set(rec)
    val out = new ByteArrayOutputStream()
    val enc = EncoderFactory.get().directBinaryEncoder(out, null)
    new GenericDatumWriter[GenericRecord](schema).write(rec, enc)
    enc.flush()
    out.toByteArray
  }

  test("record-kind demux by first payload byte") {
    import AvroIngest.RecordKind._
    assert(AvroIngest.kindOf(Array[Byte](0, 9)) == Inline(false))
    assert(AvroIngest.kindOf(Array[Byte](2, 9)) == Inline(true))
    assert(AvroIngest.kindOf(Array[Byte](1)) == LegacyBulk)
    assert(AvroIngest.kindOf(Array[Byte](3)) == BulkPointer)
    assert(AvroIngest.kindOf(Array[Byte](7)) == Unknown(7))
  }

  test("collection from kafka/kinesis key framing") {
    assert(AvroIngest.collectionFromKey("Proj.Coll", '.') ==
      Some(CollectionId("proj", "coll")))
    assert(AvroIngest.collectionFromKey("proj|coll", '|') ==
      Some(CollectionId("proj", "coll")))
    assert(AvroIngest.collectionFromKey("nodot", '.').isEmpty)
  }

  test("inline decode: type map incl. timestamp-millis and date-days") {
    val payload = encode(avro, { r =>
      r.put("_time", 1700000000000L); r.put("_user", "u1")
      r.put("n", 2.5); r.put("d", 19000)
    })
    val row = AvroIngest.decodeRecord(payload, 0, avro, avro, rowSchema)
    assert(row.getAs[java.sql.Timestamp]("_time").getTime == 1700000000000L)
    assert(row.getAs[String]("_user") == "u1")
    assert(row.getAs[Double]("n") == 2.5)
    assert(row.getAs[java.sql.Date]("d").toLocalDate.toEpochDay == 19000)
  }

  test("writer schema shorter than reader: trailing fields null-fill") {
    val writer = AvroIngest.truncatedSchema(avro, 2) // only _time,_user
    val payload = encode(writer, { r =>
      r.put("_time", 1700000000000L); r.put("_user", "u2")
    })
    val row = AvroIngest.decodeRecord(payload, 0, writer, avro, rowSchema)
    assert(row.getAs[String]("_user") == "u2")
    assert(row.isNullAt(rowSchema.fieldIndex("n")))
    assert(row.isNullAt(rowSchema.fieldIndex("d")))
  }

  test("decodeTagged: key routing (tag 0), payload-prefix routing (tag 2), skip tags") {
    val body = encode(avro, { r => r.put("_time", 1700000000000L); r.put("_user", "u9") })
    val schemaFor = (id: CollectionId) =>
      if (id == CollectionId("proj", "coll")) Some((avro, rowSchema)) else None

    // tag 0: collection from the kafka key `project.collection`
    val tagged0 = Array[Byte](0) ++ body
    val Some((id0, row0)) = AvroIngest.decodeTagged("proj.coll", tagged0, '.', schemaFor)
    assert(id0 == CollectionId("proj", "coll") && row0.getAs[String]("_user") == "u9")

    // tag 2: collection from an avro-string prefix of the payload
    val prefix = {
      val out = new ByteArrayOutputStream()
      val enc = EncoderFactory.get().directBinaryEncoder(out, null)
      enc.writeString("proj|coll"); enc.flush(); out.toByteArray
    }
    val tagged2 = Array[Byte](2) ++ prefix ++ body
    val Some((id2, row2)) = AvroIngest.decodeTagged("ignored", tagged2, '|', schemaFor)
    assert(id2 == CollectionId("proj", "coll") && row2.getAs[String]("_user") == "u9")

    // legacy bulk (1) and unknown tags are skipped; unknown collection skipped
    assert(AvroIngest.decodeTagged("proj.coll", Array[Byte](1) ++ body, '.', schemaFor).isEmpty)
    assert(AvroIngest.decodeTagged("other.coll", tagged0, '.', schemaFor).isEmpty)
  }

  test("bulk object: project prefix, per-collection frames, truncated schema") {
    val out = new ByteArrayOutputStream()
    val enc = EncoderFactory.get().directBinaryEncoder(out, null)
    enc.writeString("proj")
    // frame 1: full-width records
    enc.writeString("c1"); enc.writeInt(4); enc.writeInt(2)
    val w = new GenericDatumWriter[GenericRecord](avro)
    (1 to 2).foreach { i =>
      val r = new GenericData.Record(avro)
      r.put("_time", 1700000000000L + i); r.put("_user", s"u$i"); r.put("n", i.toDouble)
      w.write(r, enc)
    }
    // frame 2: truncated writer (2 cols)
    val trunc = AvroIngest.truncatedSchema(avro, 2)
    enc.writeString("c2"); enc.writeInt(2); enc.writeInt(1)
    val r3 = new GenericData.Record(trunc)
    r3.put("_time", 1700000000500L); r3.put("_user", "u3")
    new GenericDatumWriter[GenericRecord](trunc).write(r3, enc)
    enc.flush()

    val rows = AvroIngest.readBulkObject(out.toByteArray,
      _ => (avro, rowSchema), names)
    assert(rows.map(_._1).distinct ==
      Seq(CollectionId("proj", "c1"), CollectionId("proj", "c2")))
    assert(rows.count(_._1.collection == "c1") == 2)
    val last = rows.last._2
    assert(last.getAs[String]("_user") == "u3" && last.isNullAt(rowSchema.fieldIndex("n")))
  }

  test("bulk object: an invalid collection name drops its rows, not the object") {
    // ["ok", "_tmp", "ok2"] in ONE object: the reserved '_'-prefixed name
    // must skip ONLY its own frame (decoded via the registry schema to
    // keep the stream aligned) — F3 record-skip, not whole-object loss
    val out = new ByteArrayOutputStream()
    val enc = EncoderFactory.get().directBinaryEncoder(out, null)
    enc.writeString("proj")
    val w = new GenericDatumWriter[GenericRecord](avro)
    def frame(coll: String, user: String): Unit = {
      enc.writeString(coll); enc.writeInt(4); enc.writeInt(1)
      val r = new GenericData.Record(avro)
      r.put("_time", 1700000000000L); r.put("_user", user); r.put("n", 1.0)
      w.write(r, enc)
    }
    frame("ok", "u1"); frame("_tmp", "ghost"); frame("ok2", "u2")
    enc.flush()

    val rows = AvroIngest.readBulkObject(out.toByteArray,
      _ => (avro, rowSchema), names)
    assert(rows.map(_._1).distinct ==
      Seq(CollectionId("proj", "ok"), CollectionId("proj", "ok2")))
    assert(rows.map(_._2.getAs[String]("_user")).toSet == Set("u1", "u2"))
  }
}
