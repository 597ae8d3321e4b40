package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with a typed metadata struct, processed in distributed per-partition
  * batches.
  *
  * The Spark-side machinery here — schema convention, batched
  * `mapPartitions` kernels, partition sizing — is real and tested. The
  * pixel/sample decode kernels themselves are STUBS (deterministic fakes
  * derived from the bytes): the heavy media libraries are not in this
  * environment. Swap [[MediaKernels]] for real decoders (JavaCV/ffmpeg…)
  * without touching the dataflow.
  */
object Multimodal {

  /** Column convention: media = struct(data BINARY, meta STRUCT<…>). */
  val MetaType: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType),
    StructField("sample_rate", IntegerType)))

  val MediaType: StructType = StructType(Seq(
    StructField("data", BinaryType),
    StructField("meta", MetaType)))

  /** Wrap a raw binary column into the media convention. */
  def asMedia(data: Column, format: Column): Column =
    struct(
      data.as("data"),
      struct(format.as("format"),
        lit(null).cast(IntegerType).as("width"),
        lit(null).cast(IntegerType).as("height"),
        lit(null).cast(LongType).as("duration_ms"),
        lit(null).cast(IntegerType).as("sample_rate")).as("meta"))

  /** Distributed feature extraction: id + media → id + Array[Float].
    *
    * Runs as `mapPartitions` so a real decoder can amortize model/codec
    * init per partition (the Scala analogue of `mapInPandas` batching); the
    * output schema is fixed so downstream ANN/dedup operators compose
    * directly ([[graft.functions.SimilarityFunctions]]).
    */
  def extractFeatures(df: DataFrame, idCol: String, mediaCol: String,
                      dim: Int = 64): DataFrame = {
    val outSchema = StructType(Seq(
      df.schema(idCol),
      StructField("features", ArrayType(FloatType, containsNull = false))))
    val idIdx = df.schema.fieldIndex(idCol)
    val mIdx = df.schema.fieldIndex(mediaCol)
    df.mapPartitions { rows =>
      // per-partition init happens HERE in a real decoder (codec, model…)
      rows.map { r =>
        val media = r.getStruct(mIdx)
        val bytes = media.getAs[Array[Byte]]("data")
        new GenericRowWithSchema(
          Array[Any](r.get(idIdx), MediaKernels.fakeDecodeFeatures(bytes, dim).toSeq),
          outSchema): Row
      }
    }(Encoders.row(outSchema))
  }

  /** Image resize over the media column (stub kernel, real plumbing):
    * returns the media struct with kernel-produced bytes and updated
    * width/height metadata.
    */
  def resize(df: DataFrame, mediaCol: String, w: Int, h: Int): DataFrame = {
    val schema = df.schema
    val mIdx = schema.fieldIndex(mediaCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val media = r.getStruct(mIdx)
        val bytes = media.getAs[Array[Byte]]("data")
        val meta = media.getStruct(media.fieldIndex("meta"))
        val newMeta = new GenericRowWithSchema(
          Array[Any](meta.get(0), w, h, meta.get(3), meta.get(4)), MetaType)
        val newMedia = new GenericRowWithSchema(
          Array[Any](MediaKernels.fakeResize(bytes, w, h), newMeta), MediaType)
        Row.fromSeq(r.toSeq.updated(mIdx, newMedia))
      }
    }(Encoders.row(schema))
  }

  /** Video frame sampling: one row per sampled frame with a frame index —
    * the explode-shaped transform a frame-level pipeline needs.
    */
  def sampleFrames(df: DataFrame, idCol: String, mediaCol: String,
                   everyN: Int): DataFrame = {
    val outSchema = StructType(Seq(
      df.schema(idCol),
      StructField("frame_idx", IntegerType),
      StructField("frame", BinaryType)))
    val idIdx = df.schema.fieldIndex(idCol)
    val mIdx = df.schema.fieldIndex(mediaCol)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val bytes = r.getStruct(mIdx).getAs[Array[Byte]]("data")
        MediaKernels.fakeFrames(bytes, everyN).zipWithIndex.map { case (f, i) =>
          new GenericRowWithSchema(Array[Any](r.get(idIdx), i, f), outSchema): Row
        }
      }
    }(Encoders.row(outSchema))
  }
}

/** STUB kernels — deterministic fakes standing in for real codecs.
  * Each is pure on the input bytes so tests and oracles are reproducible.
  */
object MediaKernels {

  /** ??? real impl: decode image/audio → model features. Fake: normalized
    * 256-bucket byte histogram folded to `dim`.
    */
  def fakeDecodeFeatures(bytes: Array[Byte], dim: Int): Array[Float] = {
    val hist = new Array[Float](dim)
    if (bytes == null || bytes.isEmpty) return hist
    var i = 0
    while (i < bytes.length) {
      hist((bytes(i) & 0xff) % dim) += 1f
      i += 1
    }
    val n = bytes.length.toFloat
    hist.map(_ / n)
  }

  /** ??? real impl: decode + bilinear resize + re-encode. Fake: resample
    * the byte stream to w*h bytes.
    */
  def fakeResize(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val out = new Array[Byte](w * h)
    if (bytes == null || bytes.isEmpty) return out
    var i = 0
    while (i < out.length) {
      out(i) = bytes((i.toLong * bytes.length / out.length).toInt)
      i += 1
    }
    out
  }

  /** ??? real impl: demux container, decode every Nth frame. Fake: fixed
    * 64-byte windows, every Nth.
    */
  def fakeFrames(bytes: Array[Byte], everyN: Int): Seq[Array[Byte]] = {
    if (bytes == null || bytes.isEmpty) return Seq.empty
    val frameSize = 64
    val nFrames = math.max(1, bytes.length / frameSize)
    (0 until nFrames by math.max(1, everyN)).map { f =>
      val start = f * frameSize
      bytes.slice(start, math.min(start + frameSize, bytes.length))
    }
  }
}
