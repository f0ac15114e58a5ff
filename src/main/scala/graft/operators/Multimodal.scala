package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: image/audio/video as opaque `binary`
  * payloads + a typed metadata struct, processed per-partition in
  * batches (the Spark-side plumbing a real decoder plugs into).
  *
  * Container-level decode is REAL: `parseContainerMeta` parses PNG
  * (signature + IHDR, chunk CRC32 verified) and WAV (RIFF chunk walk,
  * fmt/data) headers from raw bytes — pure JVM, no codec libraries —
  * and `encodePng`/`encodeWav` build valid minimal containers for
  * round-trip tests. Only PIXEL/SAMPLE-level work (feature extraction,
  * resampling) is stubbed (`fakeFeatures` — deterministic byte stats),
  * because pixel codecs aren't in this container. Swapping the stub for
  * a JNI/ONNX decoder changes one function; the batch shape stays.
  */
object Multimodal {

  val MediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType),
      StructField("n_bytes", LongType),
      StructField("source", StringType))))))

  /** Wrap a text table as fake media rows: payload = UTF-8 bytes.
    * Stands in for `spark.read.format("binaryFile")` over an object
    * store, which yields the same (path, length, content) shape.
    */
  def asMedia(df: DataFrame, idCol: String, textCol: String, sourceCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      encode(col(textCol), "UTF-8").as("payload"),
      struct(
        lit("text/plain").as("mime"),
        length(col(textCol)).cast("long").as("n_bytes"),
        col(sourceCol).as("source")).as("meta"))

  val FeatureDim = 8

  /** STUB decoder: a real implementation would decode the image/audio
    * payload and run feature extraction here, batch-at-a-time per
    * partition. The fake is deterministic — mean/spread stats over byte
    * windows — so tests and oracles are stable.
    */
  private def fakeFeatures(payload: Array[Byte]): Array[Float] = {
    val out = new Array[Float](FeatureDim)
    if (payload == null || payload.isEmpty) return out
    val window = math.max(1, payload.length / FeatureDim)
    var i = 0
    while (i < FeatureDim) {
      var sum = 0L; var n = 0
      var j = i * window
      while (j < math.min(payload.length, (i + 1) * window)) { sum += payload(j) & 0xff; n += 1; j += 1 }
      out(i) = if (n == 0) 0f else sum.toFloat / n
      i += 1
    }
    out
  }

  /** Per-partition batched "decode": binary payload → feature vector.
    * mapPartitions (not per-row map) so a real decoder can amortize
    * model/codec init across the whole batch — the same shape
    * mapInPandas gives Python decoders.
    */
  def decodeFeatures(media: DataFrame): DataFrame = {
    val outSchema = StructType(media.schema.fields :+ StructField("features", ArrayType(FloatType)))
    val enc = ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    val payloadIdx = media.schema.fieldIndex("payload")
    media.mapPartitions { rows =>
      // real decoder init would happen once per partition, here
      rows.map { r =>
        val feats = fakeFeatures(r.getAs[Array[Byte]](payloadIdx))
        Row.fromSeq(r.toSeq :+ feats.toSeq)
      }
    }(enc)
  }

  /** STUB resize: a real implementation would decode, spatially resample
    * to the target resolution, and re-encode; the deterministic fake
    * stride-samples every ⌈len/target⌉-th byte so the output is ≤target
    * bytes and starts at byte 0. Same mapPartitions batch shape as
    * decodeFeatures (codec init amortizes per partition).
    */
  def resize(media: DataFrame, targetBytes: Int = 64): DataFrame = {
    val outSchema = StructType(media.schema.fields :+ StructField("resized", BinaryType))
    val enc = ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    val payloadIdx = media.schema.fieldIndex("payload")
    media.mapPartitions { rows =>
      rows.map { r =>
        val p = r.getAs[Array[Byte]](payloadIdx)
        val resized =
          if (p == null || p.isEmpty) Array.emptyByteArray
          else {
            val stride = math.max(1, (p.length + targetBytes - 1) / targetBytes)
            val out = new Array[Byte]((p.length + stride - 1) / stride)
            var i = 0
            while (i < out.length) { out(i) = p(i * stride); i += 1 }
            out
          }
        Row.fromSeq(r.toSeq :+ resized)
      }
    }(enc)
  }

  // ---- REAL container codecs (pure JVM, no codec libraries) ---- //

  /** Wrap a doc table as REAL container media: odd ids become PNGs
    * whose dimensions derive from the char count, even ids become 8-bit
    * PCM WAVs whose layout derives from (id, UTF-8 byte length) and
    * whose sample data is the text bytes. Every decoded field is pure
    * integer arithmetic on table columns, so an external engine can
    * predict the full decode without parsing a byte — which is what
    * makes `decodeContainerMeta` differential-testable end to end.
    */
  def asContainerMedia(df: DataFrame, idCol: String, textCol: String,
      sourceCol: String): DataFrame = {
    val in = df.select(
      col(idCol).cast("long").as("media_id"),
      encode(col(textCol), "UTF-8").as("bytes"),
      length(col(textCol)).cast("long").as("n_chars"),
      col(sourceCol).as("source"))
    val enc = ExpressionEncoder(RowEncoder.encoderFor(MediaSchema))
    in.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val nChars = r.getLong(2)
        val source = r.getString(3)
        val (payload, mime) =
          if (id % 2 == 1) {
            val w = 1 + (nChars % 509).toInt
            val h = 1 + (nChars * 7 % 293).toInt
            (encodePng(w, h), "image/png")
          } else {
            val channels = 1 + ((id / 2) % 2).toInt
            val rate = 8000 * (1 + (id % 3).toInt)
            (encodeWav(channels, rate, bytes), "audio/wav")
          }
        Row(id, payload, Row(mime, payload.length.toLong, source))
      }
    }(enc)
  }

  /** Minimal VALID PNG: signature, IHDR (8-bit truecolor) with proper
    * CRC32, empty IDAT, IEND. Enough container for any header-level
    * tool (identify, sniffers, this object's own parser) to read
    * dimensions; there is deliberately no pixel data to fake.
    */
  def encodePng(width: Int, height: Int): Array[Byte] = {
    require(width > 0 && height > 0, s"PNG dims must be positive: ${width}x$height")
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.write(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    def chunk(typ: String, data: Array[Byte]): Unit = {
      out.writeInt(data.length)
      val typed = typ.getBytes("US-ASCII") ++ data
      out.write(typed)
      val crc = new java.util.zip.CRC32()
      crc.update(typed)
      out.writeInt(crc.getValue.toInt)
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
    ihdr.putInt(width).putInt(height)
      .put(8.toByte)  // bit depth
      .put(2.toByte)  // color type: truecolor
      .put(0.toByte).put(0.toByte).put(0.toByte) // deflate, adaptive, no interlace
    chunk("IHDR", ihdr.array())
    chunk("IDAT", Array.emptyByteArray)
    chunk("IEND", Array.emptyByteArray)
    out.flush()
    bos.toByteArray
  }

  /** Minimal valid WAV: RIFF header, PCM fmt chunk, data chunk holding
    * the given samples (8-bit PCM; blockAlign = channels).
    */
  def encodeWav(channels: Int, sampleRate: Int, pcm: Array[Byte]): Array[Byte] = {
    require(channels > 0 && sampleRate > 0, s"bad WAV params: ch=$channels rate=$sampleRate")
    val dataLen = pcm.length - pcm.length % channels // whole frames only
    val pad = dataLen & 1 // RIFF chunks are 2-byte aligned: odd data gets a pad byte
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen + pad)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen + pad)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1)                     // PCM
      .putShort(channels.toShort)
      .putInt(sampleRate)
      .putInt(sampleRate * channels)   // byte rate (8-bit samples)
      .putShort(channels.toShort)      // block align
      .putShort(8)                     // bits per sample
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
      .put(pcm, 0, dataLen)
    // pad byte (if any) is already zero from allocate
    buf.array()
  }

  /** Decoded container header: `format` is "png" / "wav" / "unknown";
    * image fields are null for audio and vice versa. All-null fields
    * (format "unknown") mean the bytes failed validation — wrong magic,
    * truncated header, or a PNG IHDR whose CRC doesn't check out.
    */
  val ContainerMetaSchema: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", LongType),
    StructField("height", LongType),
    StructField("channels", LongType),
    StructField("sample_rate", LongType),
    StructField("n_samples", LongType),
    StructField("duration_us", LongType)))

  /** REAL header decode, pure JVM: sniff the magic, then parse PNG
    * IHDR (verifying the chunk CRC32 — a corrupted header must not
    * yield plausible-looking dimensions) or walk RIFF chunks to fmt +
    * data. Returns (format, width, height, channels, sample_rate,
    * n_samples, duration_us) with nulls where not applicable.
    */
  def parseContainerMeta(bytes: Array[Byte]): Row = {
    val unknown = Row("unknown", null, null, null, null, null, null)
    if (bytes == null || bytes.length < 12) return unknown
    val pngSig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    if (bytes.take(8).sameElements(pngSig)) {
      if (bytes.length < 33) return unknown
      val buf = java.nio.ByteBuffer.wrap(bytes, 8, 25)
      val len = buf.getInt
      val typ = new Array[Byte](4); buf.get(typ)
      if (len != 13 || new String(typ, "US-ASCII") != "IHDR") return unknown
      val crc = new java.util.zip.CRC32()
      crc.update(bytes, 12, 4 + 13)
      val stored = java.nio.ByteBuffer.wrap(bytes, 29, 4).getInt
      if (crc.getValue.toInt != stored) return unknown
      val w = buf.getInt.toLong & 0xffffffffL
      val h = buf.getInt.toLong & 0xffffffffL
      Row("png", w, h, null, null, null, null)
    } else if (new String(bytes, 0, 4, "US-ASCII") == "RIFF"
        && new String(bytes, 8, 4, "US-ASCII") == "WAVE") {
      val buf = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      var pos = 12
      var channels = -1; var rate = -1; var blockAlign = -1; var dataLen = -1L
      while (pos + 8 <= bytes.length && (channels < 0 || dataLen < 0)) {
        val id = new String(bytes, pos, 4, "US-ASCII")
        val size = buf.getInt(pos + 4)
        if (size < 0) { pos = bytes.length } // corrupt size: stop the walk
        else {
          if (id == "fmt " && size >= 16 && pos + 8 + 16 <= bytes.length) {
            channels = buf.getShort(pos + 10).toInt
            rate = buf.getInt(pos + 12)
            blockAlign = buf.getShort(pos + 20).toInt
          } else if (id == "data") {
            // a data chunk extending past the file is truncation, not a
            // shorter recording — reject rather than report plausible
            // n_samples/duration from the claimed size
            if (pos + 8L + size > bytes.length) return unknown
            dataLen = size.toLong
          }
          pos += 8 + size + (size & 1) // RIFF chunks are 2-byte aligned
        }
      }
      if (channels <= 0 || rate <= 0 || blockAlign <= 0 || dataLen < 0) unknown
      else {
        val nSamples = dataLen / blockAlign
        Row("wav", null, null, channels.toLong, rate.toLong, nSamples,
          nSamples * 1000000L / rate)
      }
    } else unknown
  }

  /** mapPartitions batch decode: adds the ContainerMetaSchema fields to
    * each media row by PARSING the payload bytes (the real-decode twin
    * of `decodeFeatures`; same per-partition batch shape).
    */
  def decodeContainerMeta(media: DataFrame): DataFrame = {
    val outSchema = StructType(media.schema.fields ++ ContainerMetaSchema.fields)
    val enc = ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    val payloadIdx = media.schema.fieldIndex("payload")
    media.mapPartitions { rows =>
      rows.map { r =>
        val meta = parseContainerMeta(r.getAs[Array[Byte]](payloadIdx))
        Row.fromSeq(r.toSeq ++ meta.toSeq)
      }
    }(enc)
  }

  /** Deterministic frame-sampling stub: pick every `stride`-th byte
    * window as a "frame" (real impl: video frame extraction). Returns
    * exploded (media_id, frame_no, frame_bytes).
    */
  def sampleFrames(media: DataFrame, stride: Int = 64, maxFrames: Int = 8): DataFrame = {
    // integral floor-div: sequence() rejects fractional bounds
    val lastWindow = greatest(expr(s"(length(payload) - 1) div $stride"), lit(0))
    media.select(
      col("media_id"),
      posexplode(
        slice(
          transform(
            sequence(lit(0), lastWindow.cast("int")),
            i => col("payload").substr(i * stride + 1, lit(stride))),
          1, maxFrames)).as(Seq("frame_no", "frame_bytes")))
  }
}
