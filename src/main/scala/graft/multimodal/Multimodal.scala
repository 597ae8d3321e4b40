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
  * `mapPartitions` kernels, partition sizing — is real and tested. Image
  * kernels (decode → features, resize) are REAL via `javax.imageio`,
  * audio features are REAL via `javax.sound.sampled` (both in the JDK),
  * and video demux/decode is REAL for Motion-JPEG streams (byte-exact
  * SOI/EOI frame split + the ImageIO image kernel per frame —
  * [[MediaKernels.mjpegFrames]]). Compressed video codecs (H.264…) are
  * not in the JDK; those bytes fall back to a deterministic stub split —
  * swap the [[MediaKernels]] entry for a real decoder (JavaCV/ffmpeg…)
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
    *
    * Dispatches on `meta.format`: image-typed media (an `image/` MIME
    * prefix) decodes for real via `javax.imageio` (luminance/color
    * histogram features), audio-typed media via `javax.sound.sampled`
    * (amplitude histogram), video-typed media via the MJPEG demux (mean
    * of per-frame image histograms); undecodable bytes fall back to the
    * deterministic stub kernel.
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
        val format = media.getStruct(media.fieldIndex("meta")).getAs[String]("format")
        new GenericRowWithSchema(
          Array[Any](r.get(idIdx), MediaKernels.decodeFeatures(bytes, format, dim).toSeq),
          outSchema): Row
      }
    }(Encoders.row(outSchema))
  }

  /** Perceptual hashes over the media column: id + media → id + 64-bit
    * dHash ([[MediaKernels.dHash]]); null for media that doesn't decode
    * as an image (caller-visible, and
    * [[graft.functions.DedupFunctions.hammingNearDups]] skips nulls).
    * Compose the two for image near-dup pairs at corpus scale — the
    * binary column never shuffles, only (id, long).
    */
  def imageHashes(df: DataFrame, idCol: String, mediaCol: String): DataFrame =
    perceptualHashes(df, idCol, mediaCol, "dhash", MediaKernels.dHash)

  /** Shared body of [[imageHashes]]/[[audioHashes]]: id + media (struct OR
    * raw binary column, e.g. the `frame` output of [[sampleFrames]]) →
    * id + nullable 64-bit hash. Null media/bytes hash to null, same as
    * undecodable bytes — never an executor NPE.
    */
  private def perceptualHashes(df: DataFrame, idCol: String, mediaCol: String,
                               outName: String,
                               kernel: Array[Byte] => Option[Long]): DataFrame = {
    val outSchema = StructType(Seq(
      df.schema(idCol), StructField(outName, LongType, nullable = true)))
    val idIdx = df.schema.fieldIndex(idCol)
    val mIdx = df.schema.fieldIndex(mediaCol)
    val isBinary = df.schema(mediaCol).dataType == BinaryType
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes =
          if (r.isNullAt(mIdx)) null
          else if (isBinary) r.getAs[Array[Byte]](mIdx)
          else r.getStruct(mIdx).getAs[Array[Byte]]("data")
        new GenericRowWithSchema(
          Array[Any](r.get(idIdx),
            (if (bytes == null) None else kernel(bytes)).orNull),
          outSchema): Row
      }
    }(Encoders.row(outSchema))
  }

  /** Audio perceptual hashes over the media column (or a raw binary
    * column): the audio counterpart of [[imageHashes]], feeding the same
    * [[graft.functions.DedupFunctions.hammingNearDups]].
    */
  def audioHashes(df: DataFrame, idCol: String, mediaCol: String): DataFrame =
    perceptualHashes(df, idCol, mediaCol, "ahash", MediaKernels.audioHash)

  /** Image resize over the media column: image-typed media resizes for
    * real (ImageIO decode → Graphics2D scale → PNG re-encode, format
    * promoted to image/png); other modalities keep the stub byte-resample
    * kernel.
    * Either way width/height metadata is updated.
    */
  def resize(df: DataFrame, mediaCol: String, w: Int, h: Int): DataFrame = {
    val schema = df.schema
    val mIdx = schema.fieldIndex(mediaCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val media = r.getStruct(mIdx)
        val bytes = media.getAs[Array[Byte]]("data")
        val meta = media.getStruct(media.fieldIndex("meta"))
        val format = meta.getAs[String]("format")
        val resized = MediaKernels.resizeImage(bytes, format, w, h)
        val outFormat = if (resized.isDefined) "image/png" else meta.get(0)
        val newMeta = new GenericRowWithSchema(
          Array[Any](outFormat, w, h, meta.get(3), meta.get(4)), MetaType)
        val newMedia = new GenericRowWithSchema(
          Array[Any](resized.getOrElse(MediaKernels.fakeResize(bytes, w, h)),
                     newMeta), MediaType)
        Row.fromSeq(r.toSeq.updated(mIdx, newMedia))
      }
    }(Encoders.row(schema))
  }

  /** Video frame sampling: one row per sampled frame with a frame index —
    * the explode-shaped transform a frame-level pipeline needs. `video/`
    * media demuxes for REAL when the bytes are a Motion-JPEG stream
    * ([[MediaKernels.mjpegFrames]] — each output frame is a decodable
    * JPEG, byte-identical to the original); other bytes fall back to the
    * deterministic stub windows.
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
        val media = r.getStruct(mIdx)
        val bytes = media.getAs[Array[Byte]]("data")
        val format = media.getStruct(media.fieldIndex("meta")).getAs[String]("format")
        MediaKernels.videoFrames(bytes, format, everyN).zipWithIndex.map { case (f, i) =>
          new GenericRowWithSchema(Array[Any](r.get(idIdx), i, f), outSchema): Row
        }
      }
    }(Encoders.row(outSchema))
  }
}

/** Media kernels. Images decode for REAL via `javax.imageio`, audio via
  * `javax.sound.sampled` (both in the JDK — no extra jars), and video via
  * the pure-JVM MJPEG demux ([[mjpegFrames]]) + the image kernel per
  * frame. Compressed codecs the JDK doesn't ship fall back to
  * deterministic stubs. Every kernel is pure on its input bytes so tests
  * and oracles are reproducible.
  */
object MediaKernels {

  /** Modality dispatch: an `image/` MIME prefix → real ImageIO decode, an
    * `audio/` prefix → real `javax.sound.sampled` decode, a `video/`
    * prefix → real MJPEG demux + per-frame image decode (each falling back
    * to the stub when the bytes don't decode); everything else → stub.
    */
  def decodeFeatures(bytes: Array[Byte], format: String, dim: Int): Array[Float] =
    if (format != null && format.startsWith("image/"))
      imageFeatures(bytes, dim).getOrElse(fakeDecodeFeatures(bytes, dim))
    else if (format != null && format.startsWith("audio/"))
      audioFeatures(bytes, dim).getOrElse(fakeDecodeFeatures(bytes, dim))
    else if (format != null && format.startsWith("video/"))
      videoFeatures(bytes, dim).getOrElse(fakeDecodeFeatures(bytes, dim))
    else fakeDecodeFeatures(bytes, dim)

  /** Real audio features via `javax.sound.sampled` (in the JDK — no extra
    * jars): decode the container (WAV/AIFF/AU), convert to 16-bit signed
    * little-endian PCM, mean-mix channels per frame, and histogram the
    * amplitudes — `dim` buckets spanning the signed 16-bit range,
    * normalized per frame. Deterministic: PCM decode is bit-exact. None
    * when the bytes aren't a decodable audio stream (caller falls back to
    * the stub, same contract as [[imageFeatures]]).
    */
  def audioFeatures(bytes: Array[Byte], dim: Int): Option[Array[Float]] = {
    if (bytes == null || bytes.isEmpty) return None
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val src = in.getFormat
        val ch = src.getChannels
        val target = new javax.sound.sampled.AudioFormat(
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
          src.getSampleRate, 16, ch, 2 * ch, src.getSampleRate, false)
        val pcm = javax.sound.sampled.AudioSystem.getAudioInputStream(target, in)
        try {
          val hist = new Array[Float](dim)
          val frameBytes = 2 * ch
          val buf = new Array[Byte](4096 * frameBytes)
          var frames = 0L
          var n = pcm.read(buf)
          while (n > 0) {
            var i = 0
            while (i + frameBytes <= n) {
              var mix = 0
              var c = 0
              while (c < ch) {
                mix += ((buf(i + 2 * c) & 0xff) | (buf(i + 2 * c + 1) << 8))
                c += 1
              }
              val s = mix / ch // mean over channels, still signed 16-bit
              hist(((s + 32768).toLong * dim / 65536).toInt) += 1f
              frames += 1
              i += frameBytes
            }
            n = pcm.read(buf)
          }
          if (frames == 0) None
          else {
            var i = 0
            while (i < dim) { hist(i) /= frames; i += 1 }
            Some(hist)
          }
        } finally pcm.close()
      } finally in.close()
    } catch { case _: Exception => None }
  }

  /** Real image features: 4 interleaved normalized histograms over the
    * decoded pixels — luminance, R, G, B — each `dim/4` buckets (so
    * `features(4k+c)` is channel c's bucket k). Deterministic: PNG/JPEG
    * decode is bit-exact for a given file.
    */
  def imageFeatures(bytes: Array[Byte], dim: Int): Option[Array[Float]] = {
    val img = decodeImage(bytes)
    img.map { im =>
      val buckets = math.max(1, dim / 4)
      val hist = new Array[Float](dim)
      val w = im.getWidth; val h = im.getHeight
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = im.getRGB(x, y)
          val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
          val lum = (299 * r + 587 * g + 114 * b) / 1000
          hist(4 * (lum * buckets / 256)) += 1f
          if (dim >= 2) hist(4 * (r * buckets / 256) + 1) += 1f
          if (dim >= 3) hist(4 * (g * buckets / 256) + 2) += 1f
          if (dim >= 4) hist(4 * (b * buckets / 256) + 3) += 1f
          x += 1
        }
        y += 1
      }
      val n = (w.toLong * h).toFloat
      var i = 0
      while (i < dim) { hist(i) /= n; i += 1 }
      hist
    }
  }

  /** Real image resize: ImageIO decode → Graphics2D bilinear scale → PNG
    * re-encode. None when the bytes aren't a decodable image or the format
    * isn't image-typed.
    */
  def resizeImage(bytes: Array[Byte], format: String, w: Int, h: Int): Option[Array[Byte]] = {
    if (format == null || !format.startsWith("image/")) return None
    decodeImage(bytes).map { im =>
      val out = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = out.createGraphics()
      try {
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(im, 0, 0, w, h, null)
      } finally g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "png", bos)
      bos.toByteArray
    }
  }

  /** 64-bit perceptual hash of an audio stream: the adjacent-bucket
    * difference pattern of the 65-bin amplitude histogram
    * ([[audioFeatures]]) — the audio analogue of the image [[dHash]].
    * Amplitude-histogram shape survives re-encode and low-level noise
    * (per-bin mass moves a little, orderings mostly don't), and the
    * histogram is normalized so gain changes that don't clip are muted.
    * None when the bytes aren't decodable audio.
    */
  def audioHash(bytes: Array[Byte]): Option[Long] =
    audioFeatures(bytes, 65).map { hist =>
      // radius-1 box blur first: sharp histogram edges (e.g. a pure
      // tone's arcsine peaks) otherwise flip several adjacent orderings
      // under mild noise
      val s = Array.tabulate(65) { i =>
        hist(math.max(0, i - 1)) + hist(i) + hist(math.min(64, i + 1))
      }
      var h = 0L
      var i = 0
      while (i < 64) {
        if (s(i) < s(i + 1)) h |= (1L << i)
        i += 1
      }
      h
    }

  /** 64-bit difference hash (dHash) of an image: decode, scale to 9×8
    * luminance, set one bit per adjacent-pixel comparison per row. The
    * standard perceptual near-dup key for image corpora — robust to
    * re-encode/resize/small noise, and two visually-near images differ in
    * a few bits, so Hamming-radius blocking
    * ([[graft.functions.DedupFunctions.hammingNearDups]]) finds dup pairs
    * with one equi-join. Deterministic: fixed bilinear scale, integer
    * luminance. None when the bytes don't decode as an image.
    */
  def dHash(bytes: Array[Byte]): Option[Long] = decodeImage(bytes).map { img =>
    val scaled = new java.awt.image.BufferedImage(9, 8,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = scaled.createGraphics()
    g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
      java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
    g.drawImage(img, 0, 0, 9, 8, null)
    g.dispose()
    def lum(x: Int, y: Int): Int = {
      val c = scaled.getRGB(x, y)
      ((c >> 16) & 0xff) * 299 + ((c >> 8) & 0xff) * 587 + (c & 0xff) * 114
    }
    var h = 0L
    var bit = 0
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if (lum(x, y) < lum(x + 1, y)) h |= (1L << bit)
        bit += 1
        x += 1
      }
      y += 1
    }
    h
  }

  private def decodeImage(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] =
    if (bytes == null || bytes.isEmpty) None
    else
      try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
      catch { case _: Exception => None }

  /** Stub for undecodable media and the video modality (no video codec in
    * this environment): normalized 256-bucket byte histogram folded to
    * `dim`.
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

  /** Stub resize for non-image modalities: resample the byte stream to
    * w*h bytes.
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

  /** Fallback frame split for video bytes that are NOT a decodable MJPEG
    * stream (compressed codecs this environment doesn't ship): fixed
    * 64-byte windows, every Nth. Deterministic so tests/oracles stay
    * reproducible.
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

  /** REAL video demux for Motion-JPEG streams — the classic MJPEG wire
    * format is literally concatenated JPEG images, so a pure-JVM demux is
    * a byte-level SEGMENT WALK of each JPEG in turn: after SOI (FFD8),
    * every marker segment is skipped by its declared 2-byte length
    * (metadata payloads — EXIF thumbnails, ICC profiles, XMP, comments —
    * are NOT entropy-escaped and may legally contain FFD8/FFD9 bytes, so
    * a naive marker scan would split frames early; the length walk never
    * looks inside a payload). After an SOS header the entropy-coded data
    * IS escaped (0xFF00 stuffing, FFD0-D7 restarts), so scanning it for
    * the next true marker is exact. Each returned frame is the original
    * JPEG byte-for-byte (decodable by the `javax.imageio` image kernel);
    * a malformed frame resyncs to the next SOI instead of desyncing the
    * rest of the stream. Empty result = the bytes are not an MJPEG stream.
    */
  def mjpegFrames(bytes: Array[Byte]): Seq[Array[Byte]] = {
    if (bytes == null || bytes.length < 4) return Seq.empty
    val n = bytes.length
    @inline def u(i: Int): Int = bytes(i) & 0xff
    val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var i = 0
    while (i + 1 < n) {
      if (u(i) == 0xff && u(i + 1) == 0xd8) {
        val start = i
        var p = i + 2
        var end = -1
        var bad = false
        while (end < 0 && !bad) {
          if (p + 1 >= n) bad = true // truncated frame
          else if (u(p) != 0xff) bad = true // marker expected at segment level
          else {
            while (p + 1 < n && u(p + 1) == 0xff) p += 1 // fill bytes
            if (p + 1 >= n) bad = true
            else u(p + 1) match {
              case 0xd9 => end = p + 2 // EOI — frame complete
              case 0x01 => p += 2 // TEM: no payload
              case m if m >= 0xd0 && m <= 0xd7 => p += 2 // RSTn: no payload
              case 0xd8 | 0x00 => bad = true // SOI/stuffing illegal here
              case m =>
                if (p + 3 >= n) bad = true
                else {
                  val len = (u(p + 2) << 8) | u(p + 3) // includes its own 2 bytes
                  val next = p + 2 + len
                  if (len < 2 || next > n) bad = true
                  else if (m != 0xda) p = next // skip payload by length
                  else {
                    // SOS: entropy-coded data until the next true marker
                    // (FF00 = stuffed data byte, FFD0-D7 = restart)
                    var q = next
                    var found = -1
                    while (found < 0 && q + 1 < n) {
                      if (u(q) != 0xff) q += 1
                      else {
                        val mm = u(q + 1)
                        if (mm == 0x00 || (mm >= 0xd0 && mm <= 0xd7)) q += 2
                        else found = q
                      }
                    }
                    if (found < 0) bad = true else p = found
                  }
                }
            }
          }
        }
        if (end > 0) {
          frames += java.util.Arrays.copyOfRange(bytes, start, end)
          i = end
        } else i = start + 2 // malformed: resync at the next SOI
      } else i += 1
    }
    frames.toSeq
  }

  /** Frame split dispatch: `video/` media tries the REAL MJPEG demux
    * first; anything that isn't a JPEG stream falls back to the
    * deterministic stub windows.
    */
  def videoFrames(bytes: Array[Byte], format: String, everyN: Int): Seq[Array[Byte]] = {
    val real =
      if (format != null && format.startsWith("video/")) mjpegFrames(bytes)
      else Seq.empty
    if (real.nonEmpty) {
      val step = math.max(1, everyN)
      real.indices.collect { case f if f % step == 0 => real(f) }
    } else fakeFrames(bytes, everyN)
  }

  /** Real video features: mean of the per-frame image histograms over the
    * demuxed MJPEG frames (each frame through [[imageFeatures]]). None when
    * the bytes aren't MJPEG or no frame decodes — caller falls back to the
    * stub, the same contract as the image/audio kernels.
    */
  def videoFeatures(bytes: Array[Byte], dim: Int): Option[Array[Float]] = {
    val decoded = mjpegFrames(bytes).flatMap(f => imageFeatures(f, dim))
    if (decoded.isEmpty) None
    else {
      val mean = new Array[Float](dim)
      decoded.foreach { f =>
        var i = 0
        while (i < dim) { mean(i) += f(i); i += 1 }
      }
      var i = 0
      while (i < dim) { mean(i) /= decoded.length; i += 1 }
      Some(mean)
    }
  }
}
