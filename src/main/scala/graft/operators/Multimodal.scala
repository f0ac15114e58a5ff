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
  * (signature + IHDR, chunk CRC32 verified), WAV (RIFF chunk walk,
  * fmt/data), MP3 (ISO 11172-3 frame-header walk: sync, version/
  * layer/bitrate/samplerate indices, exact per-frame lengths → frame
  * count, n_samples, duration) and MP4 (ISO 14496-12 box walk: ftyp,
  * moov/mvhd timescale+duration, trak count, tkhd 16.16 presentation
  * size) headers from raw bytes — pure JVM, no codec libraries — and
  * `encodePng`/`encodeWav`/`encodeMp3`/`encodeMp4` build valid minimal
  * containers for round-trip tests.
  *
  * PIXEL/SAMPLE-level decode is ALSO real, pure JVM: `decodePng`
  * inflates IDAT (`java.util.zip.Inflater`) and reverses all five PNG
  * scanline filters (None/Sub/Up/Average/Paeth, spec §9) for 8-bit
  * gray / gray+alpha / RGB / RGBA; `Jpeg.decode` implements baseline
  * sequential JPEG (T.81: Huffman, dequantize, IDCT, YCbCr→RGB);
  * `decodeWav` extracts 8-bit unsigned and 16-bit signed-LE PCM sample
  * values. `decodeFeatures` feeds real pixels/samples into the feature
  * windows when the payload parses as a PNG/JPEG/WAV and falls back to
  * raw-byte stats otherwise (text payloads, unknown codecs). MP3
  * SAMPLE-level decode and video frame decode remain the documented
  * JNI/ONNX boundary — swapping one arm of `realFeatures`.
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

  /** FeatureDim windowed means over an integer value sequence — the
    * shared featurizer for decoded pixels, decoded samples, and raw
    * bytes. Window = ⌊n/FeatureDim⌋ values; integer accumulation so the
    * result is exact and cross-engine reproducible.
    */
  private def windowMeans(n: Int, valueAt: Int => Int): Array[Float] = {
    val out = new Array[Float](FeatureDim)
    if (n <= 0) return out
    val window = math.max(1, n / FeatureDim)
    var i = 0
    while (i < FeatureDim) {
      var sum = 0L; var cnt = 0
      var j = i * window
      while (j < math.min(n, (i + 1) * window)) { sum += valueAt(j); cnt += 1; j += 1 }
      out(i) = if (cnt == 0) 0f else sum.toFloat / cnt
      i += 1
    }
    out
  }

  /** Feature extraction with REAL decode where the payload is one of the
    * repo's containers: PNG → windowed means over decoded pixel samples,
    * WAV → windowed means over decoded PCM sample values, anything else
    * (text, unknown codecs, header-only containers) → windowed means
    * over the raw bytes. Deterministic in every arm, so oracles stay
    * stable across engines.
    */
  private def realFeatures(payload: Array[Byte]): Array[Float] = {
    if (payload == null || payload.isEmpty) return new Array[Float](FeatureDim)
    decodeImage(payload) match {
      case Some(img) => windowMeans(img.pixels.length, i => img.pixels(i) & 0xff)
      case None => decodeWav(payload) match {
        case Some(a) => windowMeans(a.samples.length, a.samples)
        case None => windowMeans(payload.length, i => payload(i) & 0xff)
      }
    }
  }

  /** Image decode across the supported still-image codecs: PNG
    * (`decodePng`) or baseline JPEG (`Jpeg.decode`, as of round 11 —
    * the formerly-documented swap point), normalized to the same
    * row-major interleaved-8-bit `PngImage` shape. Both decoders
    * magic-sniff first, so the wrong-format probe is two byte reads.
    */
  private[graft] def decodeImage(bytes: Array[Byte]): Option[PngImage] =
    decodePng(bytes).orElse(
      Jpeg.decode(bytes).map(j => PngImage(j.width, j.height, j.channels, j.pixels)))

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
      // a heavier decoder (JNI/ONNX) would init once per partition, here
      rows.map { r =>
        val feats = realFeatures(r.getAs[Array[Byte]](payloadIdx))
        Row.fromSeq(r.toSeq :+ feats.toSeq)
      }
    }(enc)
  }

  /** Byte-level downsample: stride-samples every ⌈len/target⌉-th byte so
    * the output is ≤target bytes and starts at byte 0. This is the
    * codec-agnostic path (works on any payload); PIXEL-level image
    * resampling is `resizeImage` below. Same mapPartitions batch shape
    * as decodeFeatures (codec init amortizes per partition).
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

  /** Wrap a doc table as deterministic MP3 streams (MPEG1 Layer III,
    * every parameter pure integer arithmetic on the char count, so an
    * external engine predicts the parsed meta without decoding bytes):
    * frames = 1 + n%5, bitrate index = 1 + n%14, samplerate index =
    * n%3, stereo iff n odd.
    */
  def asMp3Media(df: DataFrame, idCol: String, textCol: String,
      sourceCol: String): DataFrame = {
    val in = df.select(
      col(idCol).cast("long").as("media_id"),
      length(col(textCol)).cast("long").as("n_chars"),
      col(sourceCol).as("source"))
    val enc = ExpressionEncoder(RowEncoder.encoderFor(MediaSchema))
    in.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val n = r.getLong(1)
        val payload = encodeMp3(
          nFrames = 1 + (n % 5).toInt,
          bitrateIdx = 1 + (n % 14).toInt,
          srIdx = (n % 3).toInt,
          stereo = n % 2 == 1)
        Row(id, payload, Row("audio/mpeg", payload.length.toLong, r.getString(2)))
      }
    }(enc)
  }

  // ---- MPEG audio (MP3) frame-header codec, ISO/IEC 11172-3 §2.4.1.3 ----
  // Header-level only (like the PNG IHDR / RIFF walks): sync + version/
  // layer/bitrate/samplerate indices give exact frame lengths, so the
  // frame count — and with it n_samples and duration — parses without
  // touching a single Huffman bit. Sample-level MP3 decode stays out of
  // scope (the documented JNI/ONNX boundary).

  /** bits/s by [versionRow][layerIndex][bitrateIndex]; row 0 = MPEG1,
    * row 1 = MPEG2/2.5. Index 0 ("free format") and 15 are unusable for
    * frame-length arithmetic → parse returns unknown.
    */
  private val Mp3Bitrates: Array[Array[Array[Int]]] = {
    def k(xs: Int*) = (0 +: xs :+ 0).map(_ * 1000).toArray
    Array(
      Array( // MPEG1: layer idx 3=I, 2=II, 1=III
        null,
        k(32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320),
        k(32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384),
        k(32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448)),
      Array( // MPEG2 / MPEG2.5
        null,
        k(8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
        k(8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
        k(32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256)))
  }

  /** Hz by [versionBits][samplerateIndex]; versionBits 0=MPEG2.5,
    * 2=MPEG2, 3=MPEG1 (1 is reserved).
    */
  private val Mp3SampleRates: Array[Array[Int]] = Array(
    Array(11025, 12000, 8000), null, Array(22050, 24000, 16000),
    Array(44100, 48000, 32000))

  /** Build a valid fixed-header MPEG1 Layer III stream: `nFrames`
    * frames of silence-shaped zero payload. For round-trip tests and
    * the deterministic fake-media builders.
    */
  def encodeMp3(nFrames: Int, bitrateIdx: Int, srIdx: Int,
      stereo: Boolean = false): Array[Byte] = {
    require(nFrames > 0, "need at least one frame")
    require(bitrateIdx >= 1 && bitrateIdx <= 14, s"bad bitrate index $bitrateIdx")
    require(srIdx >= 0 && srIdx <= 2, s"bad samplerate index $srIdx")
    val bitrate = Mp3Bitrates(0)(1)(bitrateIdx)
    val rate = Mp3SampleRates(3)(srIdx)
    val frameLen = 144 * bitrate / rate // padding bit 0
    val out = new Array[Byte](frameLen * nFrames)
    var f = 0
    while (f < nFrames) {
      val off = f * frameLen
      out(off) = 0xff.toByte
      out(off + 1) = 0xfb.toByte // sync|MPEG1|Layer III|no CRC
      out(off + 2) = ((bitrateIdx << 4) | (srIdx << 2)).toByte
      out(off + 3) = (if (stereo) 0x00 else 0xc0).toByte // mode: stereo/mono
      f += 1
    }
    out
  }

  /** MPEG audio parse: optional ID3v2 skip, then a full frame walk —
    * each frame's length computed from its own header (VBR-safe), with
    * version/layer/samplerate pinned to the first frame's. Returns
    * (channels, sampleRate, nSamples) or None when no complete valid
    * frame exists (free-format bitrate included: frame length unknowable).
    */
  private[graft] def parseMp3(bytes: Array[Byte]): Option[(Int, Int, Long)] = {
    var pos = 0
    // ID3v2: "ID3" ver(2) flags(1) size(4 syncsafe 7-bit bytes)
    if (bytes.length >= 10 && bytes(0) == 'I' && bytes(1) == 'D' && bytes(2) == '3') {
      val sz = ((bytes(6) & 0x7f) << 21) | ((bytes(7) & 0x7f) << 14) |
        ((bytes(8) & 0x7f) << 7) | (bytes(9) & 0x7f)
      pos = 10 + sz
    }
    if (pos < 0 || pos + 4 > bytes.length) return None
    var frames = 0L
    var firstVer = -1; var firstLayer = -1; var firstSr = -1; var channels = -1
    var done = false
    while (!done && pos + 4 <= bytes.length) {
      val b1 = bytes(pos) & 0xff; val b2 = bytes(pos + 1) & 0xff
      val b3 = bytes(pos + 2) & 0xff; val b4 = bytes(pos + 3) & 0xff
      if (b1 != 0xff || (b2 & 0xe0) != 0xe0) done = true
      else {
        val ver = (b2 >> 3) & 3      // 0=2.5, 2=2, 3=1
        val layer = (b2 >> 1) & 3    // 3=I, 2=II, 1=III
        val brIdx = (b3 >> 4) & 0xf
        val srIdx = (b3 >> 2) & 3
        val padding = (b3 >> 1) & 1
        if (ver == 1 || layer == 0 || brIdx == 0 || brIdx == 15 || srIdx == 3) done = true
        else if (firstVer >= 0 && (ver != firstVer || layer != firstLayer || srIdx != firstSr))
          done = true
        else {
          val vRow = if (ver == 3) 0 else 1
          val bitrate = Mp3Bitrates(vRow)(layer)(brIdx)
          val rate = Mp3SampleRates(ver)(srIdx)
          val frameLen =
            if (layer == 3) (12 * bitrate / rate + padding) * 4
            else {
              val spf = if (layer == 2 || ver == 3) 1152 else 576
              spf / 8 * bitrate / rate + padding
            }
          if (frameLen < 4 || pos + frameLen > bytes.length) done = true
          else {
            if (firstVer < 0) {
              firstVer = ver; firstLayer = layer; firstSr = srIdx
              channels = if (((b4 >> 6) & 3) == 3) 1 else 2
            }
            frames += 1
            pos += frameLen
          }
        }
      }
    }
    if (frames == 0) None
    else {
      val spf =
        if (firstLayer == 3) 384L
        else if (firstLayer == 2) 1152L
        else if (firstVer == 3) 1152L else 576L
      Some((channels, Mp3SampleRates(firstVer)(firstSr), frames * spf))
    }
  }

  // ---- ISO base-media (MP4) box walk, ISO/IEC 14496-12 §4.2/§8.2/§8.3 ----
  // Header-level only, like the MP3/WAV arms: the box tree gives movie
  // timescale + duration (mvhd), track count (trak) and presentation
  // dimensions (tkhd 16.16 fixed point) without touching a sample.
  // FRAME decode (codec payloads inside mdat) stays out of scope — the
  // documented JNI/ONNX boundary.

  /** Wrap a doc table as deterministic minimal MP4s (ftyp + moov with
    * mvhd and `tracks` traks), every parameter pure integer arithmetic
    * on the char count so an external engine predicts the parsed meta
    * without reading a byte: timescale ∈ {600, 1000, 90000} by n%3,
    * duration ticks = 1 + n%997, width = 16·(1 + n%80),
    * height = 16·(1 + n%45), tracks = 1 + n%2.
    */
  def asMp4Media(df: DataFrame, idCol: String, textCol: String,
      sourceCol: String): DataFrame = {
    val in = df.select(
      col(idCol).cast("long").as("media_id"),
      length(col(textCol)).cast("long").as("n_chars"),
      col(sourceCol).as("source"))
    val enc = ExpressionEncoder(RowEncoder.encoderFor(MediaSchema))
    in.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val n = r.getLong(1)
        val payload = encodeMp4(
          timescale = Seq(600, 1000, 90000)((n % 3).toInt),
          durationTicks = 1 + (n % 997),
          width = 16 * (1 + (n % 80).toInt),
          height = 16 * (1 + (n % 45).toInt),
          tracks = 1 + (n % 2).toInt)
        Row(id, payload, Row("video/mp4", payload.length.toLong, r.getString(2)))
      }
    }(enc)
  }

  /** Wrap a doc table as deterministic FLAC streams (STREAMINFO-only,
    * every parameter pure integer arithmetic on the char count, so an
    * external engine predicts the parsed meta without decoding bytes):
    * rate from n%3 ∈ {44100, 48000, 96000}, channels = 1 + n%2,
    * bits = 16 + 8·(n%2), total samples = 1 + n%9973.
    */
  def asFlacMedia(df: DataFrame, idCol: String, textCol: String,
      sourceCol: String): DataFrame = {
    val in = df.select(
      col(idCol).cast("long").as("media_id"),
      length(col(textCol)).cast("long").as("n_chars"),
      col(sourceCol).as("source"))
    val enc = ExpressionEncoder(RowEncoder.encoderFor(MediaSchema))
    in.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val n = r.getLong(1)
        val payload = encodeFlac(
          sampleRate = Seq(44100, 48000, 96000)((n % 3).toInt),
          channels = 1 + (n % 2).toInt,
          bitsPerSample = 16 + 8 * (n % 2).toInt,
          totalSamples = 1 + n % 9973)
        Row(id, payload, Row("audio/flac", payload.length.toLong, r.getString(2)))
      }
    }(enc)
  }

  // ---- FLAC STREAMINFO codec (xiph.org FLAC format §METADATA_BLOCK) --
  // Header-level only, like the MP3/MP4 walks: the 34-byte STREAMINFO
  // block carries sample rate (20 bits), channels−1 (3), bits−1 (5) and
  // total samples (36) in one packed 64-bit field. Subset/frame decode
  // (Rice-coded subframes) stays at the documented JNI/ONNX boundary.

  /** Build a minimal valid FLAC stream: `fLaC` magic + one STREAMINFO
    * metadata block (flagged last). No audio frames — the header-parse
    * round-trip twin, not a playable file.
    */
  def encodeFlac(sampleRate: Int, channels: Int, bitsPerSample: Int,
      totalSamples: Long): Array[Byte] = {
    require(sampleRate > 0 && sampleRate < (1 << 20), s"bad sample rate $sampleRate")
    require(channels >= 1 && channels <= 8, s"bad channel count $channels")
    require(bitsPerSample >= 4 && bitsPerSample <= 32, s"bad bit depth $bitsPerSample")
    require(totalSamples >= 0 && totalSamples < (1L << 36),
      s"totalSamples $totalSamples exceeds the 36-bit STREAMINFO field")
    val out = new Array[Byte](4 + 4 + 34)
    out(0) = 'f'; out(1) = 'L'; out(2) = 'a'; out(3) = 'C'
    out(4) = 0x80.toByte // last-block flag | type 0 (STREAMINFO)
    out(5) = 0; out(6) = 0; out(7) = 34 // 24-bit block length
    val b = java.nio.ByteBuffer.wrap(out, 8, 34)
    b.putShort(4096.toShort); b.putShort(4096.toShort) // min/max block size
    b.put(0.toByte); b.put(0.toByte); b.put(0.toByte)  // min frame size (unknown)
    b.put(0.toByte); b.put(0.toByte); b.put(0.toByte)  // max frame size (unknown)
    val packed = (sampleRate.toLong << 44) |
      ((channels - 1).toLong << 41) |
      ((bitsPerSample - 1).toLong << 36) |
      totalSamples
    b.putLong(packed)
    // 16-byte MD5 of the (absent) audio stream stays zero
    out
  }

  /** FLAC parse: magic + metadata-block walk to STREAMINFO, unpacking
    * the 64-bit rate/channels/bits/samples field. Returns
    * (channels, sampleRate, totalSamples) or None when malformed — a
    * block that runs past the payload is truncation, not a shorter
    * stream (the WAV/MP4 stance); rate 0 is invalid per spec.
    */
  private[graft] def parseFlac(bytes: Array[Byte]): Option[(Int, Int, Long)] = {
    if (bytes.length < 8 || bytes(0) != 'f' || bytes(1) != 'L' ||
      bytes(2) != 'a' || bytes(3) != 'C') return None
    var pos = 4
    while (pos + 4 <= bytes.length) {
      val header = bytes(pos) & 0xff
      val last = (header & 0x80) != 0
      val typ = header & 0x7f
      val len = ((bytes(pos + 1) & 0xff) << 16) | ((bytes(pos + 2) & 0xff) << 8) |
        (bytes(pos + 3) & 0xff)
      if (pos + 4L + len > bytes.length) return None // truncated block
      if (typ == 0) {
        if (len != 34) return None
        val packed = java.nio.ByteBuffer.wrap(bytes, pos + 4 + 10, 8).getLong
        val rate = (packed >>> 44).toInt
        val channels = ((packed >>> 41) & 0x7).toInt + 1
        val totalSamples = packed & ((1L << 36) - 1)
        if (rate == 0) return None
        return Some((channels, rate, totalSamples))
      }
      if (last) return None // stream ended without STREAMINFO
      pos += 4 + len
    }
    None
  }

  // ---- GIF (GIF89a, W3C/CompuServe spec) --------------------------
  // Block-structure walk only, like MP4/FLAC: logical screen
  // descriptor, graphic-control extensions (frame delays), image
  // descriptors (frame count), sub-block chains. LZW pixel decode
  // stays at the documented JNI/ONNX boundary.

  /** Build a minimal valid GIF89a: header + logical screen descriptor
    * (with a 2-entry global color table), then per frame a graphic
    * control extension carrying `delayCs` and an image descriptor with
    * a 1-byte LZW-data sub-block. Structure-complete for the metadata
    * walk — not a decodable animation.
    */
  def encodeGif(width: Int, height: Int, frames: Int, delayCs: Int): Array[Byte] = {
    require(width > 0 && width <= 0xffff && height > 0 && height <= 0xffff,
      s"bad GIF dims ${width}x$height")
    require(frames >= 1 && delayCs >= 0 && delayCs <= 0xffff,
      s"bad GIF frames=$frames delayCs=$delayCs")
    val bos = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = bos.write(v & 0xff)
    def u16le(v: Int): Unit = { u8(v); u8(v >>> 8) }
    "GIF89a".foreach(c => u8(c))
    u16le(width); u16le(height)
    u8(0x80)            // GCT present, size field 0 -> 2 entries
    u8(0); u8(0)        // background color index, aspect ratio
    (0 until 6).foreach(_ => u8(0)) // the 2-entry GCT (black, black)
    var f = 0
    while (f < frames) {
      u8(0x21); u8(0xf9); u8(4) // extension, graphic-control label, size
      u8(0)                     // packed (no disposal, no transparency)
      u16le(delayCs); u8(0); u8(0) // delay, transparent idx, terminator
      u8(0x2c)                  // image descriptor
      u16le(0); u16le(0); u16le(width); u16le(height)
      u8(0)                     // packed: no local color table
      u8(2)                     // LZW minimum code size
      u8(1); u8(f & 0xff)       // one 1-byte data sub-block
      u8(0)                     // sub-block terminator
      f += 1
    }
    u8(0x3b) // trailer
    bos.toByteArray
  }

  /** GIF parse: header + LSD, then the block walk — extensions
    * (accumulating graphic-control delays), image descriptors (frame
    * count, skipping optional local color tables and the LZW sub-block
    * chain) — to the trailer. Returns (width, height, nFrames,
    * totalDelayCs) or None when malformed; a sub-block chain that runs
    * past the payload is truncation, not a shorter image (the
    * WAV/MP4/FLAC stance).
    */
  private[graft] def parseGif(bytes: Array[Byte]): Option[(Int, Int, Int, Long)] = {
    if (bytes.length < 13) return None
    val hdr = new String(bytes, 0, 6, "US-ASCII")
    if (hdr != "GIF89a" && hdr != "GIF87a") return None
    def u16le(p: Int): Int = (bytes(p) & 0xff) | ((bytes(p + 1) & 0xff) << 8)
    val w = u16le(6); val h = u16le(8)
    if (w == 0 || h == 0) return None
    val packed = bytes(10) & 0xff
    var pos = 13 + (if ((packed & 0x80) != 0) 3 * (1 << ((packed & 7) + 1)) else 0)
    var frames = 0
    var delayCs = 0L
    // skip a length-prefixed sub-block chain starting at p; -1 on truncation
    def skipSubBlocks(p0: Int): Int = {
      var p = p0
      while (p < bytes.length && bytes(p) != 0) p += 1 + (bytes(p) & 0xff)
      if (p >= bytes.length) -1 else p + 1
    }
    while (pos < bytes.length) {
      (bytes(pos) & 0xff) match {
        case 0x3b => // trailer
          return if (frames >= 1) Some((w, h, frames, delayCs)) else None
        case 0x21 => // extension: label + sub-blocks
          if (pos + 2 >= bytes.length) return None
          val label = bytes(pos + 1) & 0xff
          // GCE data block: packed(+3), delay u16le(+4..+5), tidx(+6)
          if (label == 0xf9 && (bytes(pos + 2) & 0xff) >= 4 && pos + 6 <= bytes.length - 1)
            delayCs += u16le(pos + 4)
          pos = skipSubBlocks(pos + 2) match { case -1 => return None; case p => p }
        case 0x2c => // image descriptor
          if (pos + 10 >= bytes.length) return None
          val ipacked = bytes(pos + 9) & 0xff
          var p = pos + 10 + (if ((ipacked & 0x80) != 0) 3 * (1 << ((ipacked & 7) + 1)) else 0)
          if (p >= bytes.length) return None
          p += 1 // LZW minimum code size
          pos = skipSubBlocks(p) match { case -1 => return None; case q => q }
          frames += 1
        case _ => return None
      }
    }
    None // ran out of bytes without a trailer: truncated
  }

  /** Wrap a doc table as deterministic GIF89a animations (every
    * parameter integer arithmetic on the char count, the asFlacMedia
    * pattern): w = 1 + n%640, h = 1 + n%480, frames = 1 + n%5,
    * per-frame delay = (1 + n%100) centiseconds.
    */
  def asGifMedia(df: DataFrame, idCol: String, textCol: String,
      sourceCol: String): DataFrame = {
    val in = df.select(
      col(idCol).cast("long").as("media_id"),
      length(col(textCol)).cast("long").as("n_chars"),
      col(sourceCol).as("source"))
    val enc = ExpressionEncoder(RowEncoder.encoderFor(MediaSchema))
    in.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val n = r.getLong(1)
        val payload = encodeGif(
          width = 1 + (n % 640).toInt,
          height = 1 + (n % 480).toInt,
          frames = 1 + (n % 5).toInt,
          delayCs = 1 + (n % 100).toInt)
        Row(id, payload, Row("image/gif", payload.length.toLong, r.getString(2)))
      }
    }(enc)
  }

  // ---- WebP (RIFF container, Google WebP spec) --------------------
  // Chunk walk only: VP8X canvas size, ANIM/ANMF animation frames.
  // VP8/VP8L bitstream decode stays at the JNI/ONNX boundary.

  /** Build a minimal valid animated WebP: RIFF/WEBP wrapping a VP8X
    * chunk (animation flag, canvas size), an ANIM chunk, and `frames`
    * ANMF chunk headers each carrying `durationMs` and a 2-byte stub
    * payload.
    */
  def encodeWebp(width: Int, height: Int, frames: Int, durationMs: Int): Array[Byte] = {
    require(width >= 1 && width <= (1 << 24) && height >= 1 && height <= (1 << 24),
      s"bad WebP canvas ${width}x$height")
    require(frames >= 1 && durationMs >= 0 && durationMs < (1 << 24),
      s"bad WebP frames=$frames durationMs=$durationMs")
    val bos = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = bos.write(v & 0xff)
    def u16le(v: Int): Unit = { u8(v); u8(v >>> 8) }
    def u24le(v: Int): Unit = { u8(v); u8(v >>> 8); u8(v >>> 16) }
    def u32le(v: Int): Unit = { u16le(v); u16le(v >>> 16) }
    def fourcc(s: String): Unit = s.foreach(c => u8(c))
    val anmfSize = 16 + 2 // header + stub payload (even: no pad byte)
    val riffPayload = 4 /*WEBP*/ + (8 + 10) /*VP8X*/ + (8 + 6) /*ANIM*/ +
      frames * (8 + anmfSize)
    fourcc("RIFF"); u32le(riffPayload); fourcc("WEBP")
    fourcc("VP8X"); u32le(10)
    u8(0x02)                  // flags: Animation (bit 1)
    u24le(0)                  // reserved
    u24le(width - 1); u24le(height - 1)
    fourcc("ANIM"); u32le(6)
    u32le(0)                  // background color
    u16le(0)                  // loop count (0 = infinite)
    var f = 0
    while (f < frames) {
      fourcc("ANMF"); u32le(anmfSize)
      u24le(0); u24le(0)      // frame x/2, y/2
      u24le(width - 1); u24le(height - 1)
      u24le(durationMs)
      u8(0)                   // flags: no blend/dispose bits set
      u8(0); u8(0)            // stub frame payload
      f += 1
    }
    bos.toByteArray
  }

  /** WebP parse: RIFF/WEBP chunk walk — VP8X canvas size (u24le
    * minus-one fields), ANMF count + summed durations; falls back to
    * the VP8L lossless header (0x2f signature, 14-bit packed dims) for
    * still images without a VP8X. Returns (width, height, nFrames,
    * totalDurationMs) with nFrames = 1 and duration 0 for stills, or
    * None when malformed (a chunk running past the payload is
    * truncation).
    */
  private[graft] def parseWebp(bytes: Array[Byte]): Option[(Long, Long, Int, Long)] = {
    if (bytes.length < 12) return None
    if (new String(bytes, 0, 4, "US-ASCII") != "RIFF" ||
      new String(bytes, 8, 4, "US-ASCII") != "WEBP") return None
    def u24le(p: Int): Int =
      (bytes(p) & 0xff) | ((bytes(p + 1) & 0xff) << 8) | ((bytes(p + 2) & 0xff) << 16)
    def u32le(p: Int): Long =
      (u24le(p).toLong) | ((bytes(p + 3) & 0xff).toLong << 24)
    val riffEnd = math.min(8L + u32le(4), bytes.length.toLong)
    var pos = 12L
    var w = -1L; var h = -1L
    var frames = 0
    var durMs = 0L
    while (pos + 8 <= riffEnd) {
      val typ = new String(bytes, pos.toInt, 4, "US-ASCII")
      val size = u32le(pos.toInt + 4)
      if (pos + 8 + size > riffEnd) return None // truncated chunk
      val p = pos.toInt + 8
      typ match {
        case "VP8X" =>
          if (size < 10) return None
          w = u24le(p + 4) + 1L; h = u24le(p + 7) + 1L
        case "ANMF" =>
          if (size < 16) return None
          frames += 1
          durMs += u24le(p + 12)
        case "VP8L" =>
          // lossless header: 0x2f then 14-bit w-1 / h-1, LSB-first
          if (w < 0 && size >= 5 && (bytes(p) & 0xff) == 0x2f) {
            val b = u32le(p + 1)
            w = (b & 0x3fff) + 1L; h = ((b >> 14) & 0x3fff) + 1L
          }
        case _ => () // VP8 (lossy still), ICCP, EXIF, XMP: skip
      }
      pos += 8 + size + (size & 1) // chunks are even-aligned
    }
    if (w <= 0 || h <= 0) return None
    if (frames == 0) Some((w, h, 1, 0L)) else Some((w, h, frames, durMs))
  }

  /** Wrap a doc table as deterministic animated WebPs (integer
    * arithmetic on the char count): w = 1 + n%1024, h = 1 + n%768,
    * frames = 1 + n%4, per-frame duration = (10 + n%90) ms.
    */
  def asWebpMedia(df: DataFrame, idCol: String, textCol: String,
      sourceCol: String): DataFrame = {
    val in = df.select(
      col(idCol).cast("long").as("media_id"),
      length(col(textCol)).cast("long").as("n_chars"),
      col(sourceCol).as("source"))
    val enc = ExpressionEncoder(RowEncoder.encoderFor(MediaSchema))
    in.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val n = r.getLong(1)
        val payload = encodeWebp(
          width = 1 + (n % 1024).toInt,
          height = 1 + (n % 768).toInt,
          frames = 1 + (n % 4).toInt,
          durationMs = 10 + (n % 90).toInt)
        Row(id, payload, Row("image/webp", payload.length.toLong, r.getString(2)))
      }
    }(enc)
  }

  /** Build a minimal valid ISO-BMFF stream: `ftyp` (isom) then `moov`
    * holding an mvhd (v0) and `tracks` trak/tkhd (v0) boxes carrying
    * the given presentation size. Sample tables and mdat are omitted —
    * this is the header-parse round-trip twin, not a playable file.
    */
  def encodeMp4(timescale: Int, durationTicks: Long, width: Int, height: Int,
      tracks: Int = 1): Array[Byte] = {
    require(timescale > 0 && durationTicks >= 0 && tracks >= 1, "bad mp4 params")
    // v0 mvhd/tkhd carry 32-bit durations (parser reads them back via
    // & 0xffffffffL); a larger tick count would silently truncate on
    // the round trip, so reject it instead (a v1 box would be the fix)
    require(durationTicks <= 0xffffffffL,
      s"durationTicks $durationTicks exceeds v0 32-bit mvhd/tkhd field")
    require(width > 0 && width < (1 << 15) && height > 0 && height < (1 << 15),
      "dimensions must fit 16.16 fixed point")
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    // ftyp: major 'isom', minor 0, one compatible brand
    out.writeInt(20); out.writeBytes("ftyp"); out.writeBytes("isom")
    out.writeInt(0); out.writeBytes("isom")
    val mvhdSize = 108; val tkhdSize = 92; val trakSize = 8 + tkhdSize
    out.writeInt(8 + mvhdSize + tracks * trakSize); out.writeBytes("moov")
    // mvhd v0
    out.writeInt(mvhdSize); out.writeBytes("mvhd"); out.writeInt(0) // version+flags
    out.writeInt(0); out.writeInt(0)                    // creation/modification
    out.writeInt(timescale); out.writeInt(durationTicks.toInt)
    out.writeInt(0x00010000); out.writeShort(0x0100)    // rate 1.0, volume 1.0
    out.writeShort(0); out.writeLong(0)                 // reserved
    Seq(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000) // unity matrix
      .foreach(out.writeInt)
    (0 until 6).foreach(_ => out.writeInt(0))           // pre_defined
    out.writeInt(tracks + 1)                            // next_track_ID
    for (t <- 1 to tracks) {
      out.writeInt(trakSize); out.writeBytes("trak")
      out.writeInt(tkhdSize); out.writeBytes("tkhd"); out.writeInt(0)
      out.writeInt(0); out.writeInt(0)                  // creation/modification
      out.writeInt(t); out.writeInt(0)                  // track_ID, reserved
      out.writeInt(durationTicks.toInt)
      out.writeLong(0)                                  // reserved
      out.writeShort(0); out.writeShort(0)              // layer, alternate_group
      out.writeShort(0); out.writeShort(0)              // volume, reserved
      Seq(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
        .foreach(out.writeInt)
      out.writeInt(width << 16); out.writeInt(height << 16) // 16.16 fixed
    }
    out.flush()
    bos.toByteArray
  }

  /** ISO-BMFF parse: top-level box walk to `moov`, then a child walk
    * collecting mvhd (v0/v1: timescale + duration) and trak/tkhd
    * (count + first nonzero presentation size). Returns
    * (width, height, nTracks, timescale, durationTicks) or None when
    * the tree is malformed — a moov that runs past the payload is
    * truncation, not a shorter movie (same stance as the WAV arm).
    */
  private[graft] def parseMp4(
      bytes: Array[Byte]): Option[(Long, Long, Int, Long, Long)] = {
    // box header at `pos` within [pos, end): returns (payloadStart,
    // boxEnd, type) or None on truncation/corrupt size
    def box(pos: Long, end: Long): Option[(Long, Long, String)] = {
      if (pos + 8 > end) return None
      val size = java.nio.ByteBuffer.wrap(bytes, pos.toInt, 4).getInt.toLong & 0xffffffffL
      val typ = new String(bytes, pos.toInt + 4, 4, "US-ASCII")
      val (hdr, boxEnd) =
        if (size == 0) (8L, end) // to end of enclosing scope
        else if (size == 1) {    // 64-bit largesize
          if (pos + 16 > end) return None
          (16L, pos + java.nio.ByteBuffer.wrap(bytes, pos.toInt + 8, 8).getLong)
        } else (8L, pos + size)
      if (boxEnd > end || boxEnd < pos + hdr) None
      else Some((pos + hdr, boxEnd, typ))
    }
    val fileEnd = bytes.length.toLong
    var pos = 0L
    var moov: Option[(Long, Long)] = None
    var sawFtyp = false
    while (moov.isEmpty && pos < fileEnd) {
      box(pos, fileEnd) match {
        case Some((payload, end, typ)) =>
          if (typ == "ftyp") sawFtyp = true
          if (typ == "moov") moov = Some((payload, end))
          pos = end
        case None => return None
      }
    }
    if (!sawFtyp || moov.isEmpty) return None
    val (mStart, mEnd) = moov.get
    var p = mStart
    var timescale = -1L; var duration = -1L
    var nTracks = 0; var w = 0L; var h = 0L
    while (p < mEnd) {
      box(p, mEnd) match {
        case Some((payload, end, typ)) =>
          if (typ == "mvhd" && payload + 4 <= end) {
            val buf = java.nio.ByteBuffer.wrap(bytes, payload.toInt,
              (end - payload).toInt)
            val version = buf.get() & 0xff
            buf.position(buf.position() + 3) // flags
            if (version == 1 && end - payload >= 32) {
              buf.position(buf.position() + 16) // 64-bit times
              timescale = buf.getInt.toLong & 0xffffffffL
              duration = buf.getLong
            } else if (version == 0 && end - payload >= 20) {
              buf.position(buf.position() + 8)
              timescale = buf.getInt.toLong & 0xffffffffL
              duration = buf.getInt.toLong & 0xffffffffL
            } else return None
          } else if (typ == "trak") {
            nTracks += 1
            // child walk for tkhd (dims sit at the box tail: the spec
            // fixes the field layout per version, so width/height are
            // always the last 8 payload bytes)
            var c = payload
            while (c < end) {
              box(c, end) match {
                case Some((cp, ce, ct)) =>
                  if (ct == "tkhd" && w == 0L && ce - cp >= 84) {
                    val tw = (java.nio.ByteBuffer.wrap(bytes, (ce - 8).toInt, 4)
                      .getInt.toLong & 0xffffffffL) >> 16
                    val th = (java.nio.ByteBuffer.wrap(bytes, (ce - 4).toInt, 4)
                      .getInt.toLong & 0xffffffffL) >> 16
                    if (tw > 0 && th > 0) { w = tw; h = th }
                  }
                  c = ce
                case None => return None
              }
            }
          }
          p = end
        case None => return None
      }
    }
    if (timescale <= 0 || duration < 0 || nTracks == 0) None
    else Some((w, h, nTracks, timescale, duration))
  }

  private val PngSignature: Array[Byte] =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def writePngChunk(out: java.io.DataOutputStream, typ: String,
      data: Array[Byte]): Unit = {
    out.writeInt(data.length)
    val typed = typ.getBytes("US-ASCII") ++ data
    out.write(typed)
    val crc = new java.util.zip.CRC32()
    crc.update(typed)
    out.writeInt(crc.getValue.toInt)
  }

  private def pngIhdr(width: Int, height: Int, colorType: Int): Array[Byte] = {
    val ihdr = java.nio.ByteBuffer.allocate(13)
    ihdr.putInt(width).putInt(height)
      .put(8.toByte)          // bit depth
      .put(colorType.toByte)  // 0 gray, 2 RGB, 4 gray+alpha, 6 RGBA
      .put(0.toByte).put(0.toByte).put(0.toByte) // deflate, adaptive, no interlace
    ihdr.array()
  }

  /** Minimal VALID header-only PNG: signature, IHDR (8-bit truecolor)
    * with proper CRC32, empty IDAT, IEND. Enough container for any
    * header-level tool (identify, sniffers, this object's own parser)
    * to read dimensions; `decodePng` rejects it (no pixel data), which
    * is exactly right — the pixel-bearing overload is below.
    */
  def encodePng(width: Int, height: Int): Array[Byte] = {
    require(width > 0 && height > 0, s"PNG dims must be positive: ${width}x$height")
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.write(PngSignature)
    writePngChunk(out, "IHDR", pngIhdr(width, height, colorType = 2))
    writePngChunk(out, "IDAT", Array.emptyByteArray)
    writePngChunk(out, "IEND", Array.emptyByteArray)
    out.flush()
    bos.toByteArray
  }

  // ---- REAL pixel-level PNG codec (PNG spec §9 filters + zlib) ---- //

  /** Decoded 8-bit PNG: `pixels` is row-major, `channels` interleaved
    * samples per pixel (1 gray, 2 gray+alpha, 3 RGB, 4 RGBA).
    */
  final case class PngImage(width: Int, height: Int, channels: Int, pixels: Array[Byte])

  private def colorTypeFor(channels: Int): Int = channels match {
    case 1 => 0; case 2 => 4; case 3 => 2; case 4 => 6
    case c => throw new IllegalArgumentException(s"unsupported channel count $c")
  }

  private def channelsFor(colorType: Int): Int = colorType match {
    case 0 => 1; case 4 => 2; case 2 => 3; case 6 => 4
    case _ => -1
  }

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Full pixel-bearing PNG encode: filter each scanline (filter type
    * chosen by `filterFor(rowIndex)` — default cycles through all five
    * so every decoder path gets exercised), deflate the filtered bytes,
    * emit signature/IHDR/IDAT/IEND with proper CRCs.
    */
  def encodePng(width: Int, height: Int, channels: Int, pixels: Array[Byte],
      filterFor: Int => Int = _ % 5): Array[Byte] = {
    require(width > 0 && height > 0, s"PNG dims must be positive: ${width}x$height")
    val stride = width * channels
    require(pixels.length == stride * height,
      s"pixel buffer ${pixels.length} != $stride x $height")
    val bpp = channels // 8-bit: bytes per pixel == channels
    val raw = new Array[Byte](height * (1 + stride))
    var y = 0
    while (y < height) {
      val ft = filterFor(y)
      require(ft >= 0 && ft <= 4, s"bad PNG filter type $ft")
      val off = y * (1 + stride)
      raw(off) = ft.toByte
      var x = 0
      while (x < stride) {
        val cur = pixels(y * stride + x) & 0xff
        val a = if (x >= bpp) pixels(y * stride + x - bpp) & 0xff else 0
        val b = if (y > 0) pixels((y - 1) * stride + x) & 0xff else 0
        val c = if (x >= bpp && y > 0) pixels((y - 1) * stride + x - bpp) & 0xff else 0
        val filt = ft match {
          case 0 => cur
          case 1 => cur - a
          case 2 => cur - b
          case 3 => cur - ((a + b) >> 1)
          case 4 => cur - paeth(a, b, c)
        }
        raw(off + 1 + x) = filt.toByte
        x += 1
      }
      y += 1
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw); deflater.finish()
    val zbuf = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
    val tmp = new Array[Byte](8192)
    while (!deflater.finished()) zbuf.write(tmp, 0, deflater.deflate(tmp))
    deflater.end()
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.write(PngSignature)
    writePngChunk(out, "IHDR", pngIhdr(width, height, colorTypeFor(channels)))
    writePngChunk(out, "IDAT", zbuf.toByteArray)
    writePngChunk(out, "IEND", Array.emptyByteArray)
    out.flush()
    bos.toByteArray
  }

  /** Raw-pixel cap: reject headers claiming > 256 MiB of decoded pixel
    * data before allocating — a hostile/corrupt IHDR must not OOM an
    * executor that is batch-decoding millions of payloads.
    */
  private val MaxDecodedBytes = 256L << 20

  /** REAL pixel decode, pure JVM: verify signature + per-chunk CRC32,
    * parse IHDR (8-bit, non-interlaced, gray/gray+alpha/RGB/RGBA only),
    * inflate the concatenated IDAT stream, reverse the scanline filter
    * (None/Sub/Up/Average/Paeth) per row. Returns None — never garbage
    * pixels — on anything corrupt: bad magic, CRC mismatch, truncation,
    * wrong inflated size, unknown filter type, oversized dims.
    */
  def decodePng(bytes: Array[Byte]): Option[PngImage] = {
    if (bytes == null || bytes.length < 45) return None // sig + IHDR + empty IDAT + IEND
    if (!bytes.take(8).sameElements(PngSignature)) return None
    var pos = 8
    var width = -1; var height = -1; var channels = -1
    val idat = new java.io.ByteArrayOutputStream()
    var sawEnd = false
    while (!sawEnd && pos + 12 <= bytes.length) {
      val buf = java.nio.ByteBuffer.wrap(bytes, pos, 8)
      val len = buf.getInt
      if (len < 0 || pos + 12L + len > bytes.length) return None
      val typ = new String(bytes, pos + 4, 4, "US-ASCII")
      val crc = new java.util.zip.CRC32()
      crc.update(bytes, pos + 4, 4 + len)
      val stored = java.nio.ByteBuffer.wrap(bytes, pos + 8 + len, 4).getInt
      if (crc.getValue.toInt != stored) return None
      typ match {
        case "IHDR" =>
          if (len != 13) return None
          val h = java.nio.ByteBuffer.wrap(bytes, pos + 8, 13)
          width = h.getInt; height = h.getInt
          val bitDepth = h.get() & 0xff
          channels = channelsFor(h.get() & 0xff)
          val compression = h.get() & 0xff
          val filterMethod = h.get() & 0xff
          val interlace = h.get() & 0xff
          if (bitDepth != 8 || channels < 0 || compression != 0 ||
              filterMethod != 0 || interlace != 0) return None
          if (width <= 0 || height <= 0) return None
          val rawLen = (1L + width.toLong * channels) * height
          if (rawLen > MaxDecodedBytes) return None
        case "IDAT" => idat.write(bytes, pos + 8, len)
        case "IEND" => sawEnd = true
        case _ => () // ancillary chunk: CRC-checked above, content skipped
      }
      pos += 12 + len
    }
    if (!sawEnd || width <= 0) return None
    val stride = width * channels
    val expected = height * (1 + stride)
    val raw = new Array[Byte](expected)
    val inflater = new java.util.zip.Inflater()
    inflater.setInput(idat.toByteArray)
    val n = try {
      var got = 0
      while (got < expected && !inflater.finished()) {
        val k = inflater.inflate(raw, got, expected - got)
        if (k == 0 && inflater.needsInput()) return None // truncated stream
        got += k
      }
      got
    } catch { case _: java.util.zip.DataFormatException => return None }
    finally inflater.end()
    if (n != expected) return None
    // un-filter in place into the pixel buffer
    val bpp = channels
    val pixels = new Array[Byte](stride * height)
    var y = 0
    while (y < height) {
      val ft = raw(y * (1 + stride)) & 0xff
      if (ft > 4) return None
      val off = y * (1 + stride) + 1
      var x = 0
      while (x < stride) {
        val filt = raw(off + x) & 0xff
        val a = if (x >= bpp) pixels(y * stride + x - bpp) & 0xff else 0
        val b = if (y > 0) pixels((y - 1) * stride + x) & 0xff else 0
        val c = if (x >= bpp && y > 0) pixels((y - 1) * stride + x - bpp) & 0xff else 0
        val recon = ft match {
          case 0 => filt
          case 1 => filt + a
          case 2 => filt + b
          case 3 => filt + ((a + b) >> 1)
          case 4 => filt + paeth(a, b, c)
        }
        pixels(y * stride + x) = recon.toByte
        x += 1
      }
      y += 1
    }
    Some(PngImage(width, height, channels, pixels))
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

  /** Minimal valid 16-bit PCM WAV (signed little-endian samples,
    * blockAlign = 2·channels) — the fixture encoder for real sample
    * decode tests (e.g. a synthesized sine).
    */
  def encodeWav16(channels: Int, sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    require(channels > 0 && sampleRate > 0, s"bad WAV params: ch=$channels rate=$sampleRate")
    val frames = samples.length / channels // whole frames only
    val dataLen = frames * channels * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1)                             // PCM
      .putShort(channels.toShort)
      .putInt(sampleRate)
      .putInt(sampleRate * channels * 2)       // byte rate
      .putShort((channels * 2).toShort)        // block align
      .putShort(16)                            // bits per sample
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < frames * channels) { buf.putShort(samples(i)); i += 1 }
    buf.array()
  }

  /** Decoded PCM audio: `samples` holds EVERY interleaved sample value
    * (channels × frames entries) — 8-bit as unsigned 0..255, 16-bit as
    * signed −32768..32767.
    */
  final case class WavAudio(channels: Int, sampleRate: Int, bitsPerSample: Int,
      samples: Array[Int])

  /** REAL sample decode: walk RIFF chunks to fmt + data and extract the
    * PCM sample values (8-bit unsigned / 16-bit signed-LE). Returns
    * None — never garbage samples — on bad magic, non-PCM, unsupported
    * bit depth, inconsistent blockAlign, or a data chunk that claims
    * more bytes than the file holds (truncation).
    */
  def decodeWav(bytes: Array[Byte]): Option[WavAudio] = {
    if (bytes == null || bytes.length < 12) return None
    if (new String(bytes, 0, 4, "US-ASCII") != "RIFF" ||
        new String(bytes, 8, 4, "US-ASCII") != "WAVE") return None
    val buf = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var pos = 12
    var channels = -1; var rate = -1; var blockAlign = -1; var bits = -1
    var dataOff = -1; var dataLen = -1
    while (pos + 8 <= bytes.length && (channels < 0 || dataLen < 0)) {
      val id = new String(bytes, pos, 4, "US-ASCII")
      val size = buf.getInt(pos + 4)
      if (size < 0) return None
      if (id == "fmt " && size >= 16 && pos + 8 + 16 <= bytes.length) {
        val fmtTag = buf.getShort(pos + 8).toInt
        if (fmtTag != 1) return None // PCM only
        channels = buf.getShort(pos + 10).toInt
        rate = buf.getInt(pos + 12)
        blockAlign = buf.getShort(pos + 20).toInt
        bits = buf.getShort(pos + 22).toInt
      } else if (id == "data") {
        if (pos + 8L + size > bytes.length) return None // truncated
        dataOff = pos + 8; dataLen = size
      }
      // long arithmetic: a crafted size near Int.MaxValue must end the
      // walk, not wrap pos negative and crash the `new String` above
      val next = pos.toLong + 8L + size + (size & 1)
      pos = if (next > bytes.length) bytes.length else next.toInt
    }
    if (channels <= 0 || rate <= 0 || dataLen < 0) return None
    if (bits != 8 && bits != 16) return None
    if (blockAlign != channels * (bits / 8)) return None
    val nVals = dataLen / (bits / 8)
    val samples = new Array[Int](nVals)
    var i = 0
    if (bits == 8) while (i < nVals) { samples(i) = bytes(dataOff + i) & 0xff; i += 1 }
    else while (i < nVals) { samples(i) = buf.getShort(dataOff + 2 * i).toInt; i += 1 }
    Some(WavAudio(channels, rate, bits, samples))
  }

  /** Decoded container header: `format` is "png" / "jpeg" / "wav" /
    * "mp3" / "mp4" / "flac" / "unknown";
    * image fields are null for audio and vice versa. All-null fields
    * (format "unknown") mean the bytes failed validation — wrong magic,
    * truncated header, a PNG IHDR whose CRC doesn't check out, or an
    * MP3 stream without one complete valid frame.
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
    * yield plausible-looking dimensions), walk RIFF chunks to fmt +
    * data, or walk MPEG audio frames (`parseMp3`). Returns (format,
    * width, height, channels, sample_rate, n_samples, duration_us)
    * with nulls where not applicable.
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
    } else if ((bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8) {
      Jpeg.parseMeta(bytes) match {
        case Some((w, h, nc)) => Row("jpeg", w.toLong, h.toLong, nc.toLong, null, null, null)
        case None => unknown
      }
    } else if (((bytes(0) & 0xff) == 0xff && (bytes(1) & 0xe0) == 0xe0) ||
        (bytes(0) == 'I' && bytes(1) == 'D' && bytes(2) == '3')) {
      parseMp3(bytes) match {
        case Some((channels, rate, nSamples)) =>
          Row("mp3", null, null, channels.toLong, rate.toLong, nSamples,
            nSamples * 1000000L / rate)
        case None => unknown
      }
    } else if (new String(bytes, 4, 4, "US-ASCII") == "ftyp") {
      parseMp4(bytes) match {
        case Some((w, h, nTracks, timescale, durTicks)) =>
          // timescale/ticks land in the rate/sample slots: n_samples =
          // duration in timescale units, sample_rate = units per second
          // — the same (count, rate, µs) triple the audio arms emit
          Row("mp4", if (w > 0) w else null, if (h > 0) h else null,
            nTracks.toLong, timescale, durTicks,
            durTicks * 1000000L / timescale)
        case None => unknown
      }
    } else if (new String(bytes, 0, 4, "US-ASCII") == "fLaC") {
      parseFlac(bytes) match {
        case Some((channels, rate, nSamples)) =>
          Row("flac", null, null, channels.toLong, rate.toLong, nSamples,
            nSamples * 1000000L / rate)
        case None => unknown
      }
    } else if (new String(bytes, 0, 3, "US-ASCII") == "GIF") {
      parseGif(bytes) match {
        // frame count and total delay land in the count/µs slots — the
        // same (count, duration) pairing the audio and MP4 arms emit
        case Some((w, h, frames, delayCs)) =>
          Row("gif", w.toLong, h.toLong, null, null, frames.toLong,
            delayCs * 10000L)
        case None => unknown
      }
    } else if (new String(bytes, 0, 4, "US-ASCII") == "RIFF"
        && new String(bytes, 8, 4, "US-ASCII") == "WEBP") {
      parseWebp(bytes) match {
        case Some((w, h, frames, durMs)) =>
          Row("webp", w, h, null, null, frames.toLong, durMs * 1000L)
        case None => unknown
      }
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
          // RIFF chunks are 2-byte aligned; long arithmetic so a crafted
          // size near Int.MaxValue ends the walk instead of wrapping pos
          val next = pos.toLong + 8L + size + (size & 1)
          pos = if (next > bytes.length) bytes.length else next.toInt
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

  // ---- pixel/sample-level DataFrame operators ---- //

  /** Wrap a doc table as REAL pixel-bearing PNGs: 8-bit grayscale, dims
    * from the char count (w = 1 + n % 127, h = 1 + 7n % 89 — small
    * enough that deflate stays cheap at bench scale), pixels = the
    * UTF-8 text bytes cycled row-major to fill w×h. Every pixel is pure
    * integer arithmetic on the text column, so an external engine can
    * predict full-image statistics without decoding a byte — which is
    * what makes the PIXEL-level decode differential-testable end to end
    * (the header-only twin is `asContainerMedia`).
    */
  def asPixelMedia(df: DataFrame, idCol: String, textCol: String,
      sourceCol: String): DataFrame = {
    val in = df.select(
      col(idCol).cast("long").as("media_id"),
      encode(col(textCol), "UTF-8").as("bytes"),
      col(sourceCol).as("source"))
    val enc = ExpressionEncoder(RowEncoder.encoderFor(MediaSchema))
    in.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val source = r.getString(2)
        val n = bytes.length
        val w = 1 + n % 127
        val h = 1 + (n.toLong * 7 % 89).toInt
        val pixels = new Array[Byte](w * h)
        if (n > 0) { var i = 0; while (i < pixels.length) { pixels(i) = bytes(i % n); i += 1 } }
        val payload = encodePng(w, h, 1, pixels)
        Row(id, payload, Row("image/png", payload.length.toLong, source))
      }
    }(enc)
  }

  /** Wrap a doc table as pixel-bearing grayscale JPEGs: block grid
    * (1 + n%5) × (1 + 3n%4), block k constant at text-byte (k mod n) —
    * constant blocks + all-ones quantizer make the lossy codec exact
    * (see [[Jpeg.encodeGrayBlocks]]), so every decoded pixel stat is
    * predictable by the same cyclic-byte arithmetic as the PNG path.
    */
  def asJpegMedia(df: DataFrame, idCol: String, textCol: String,
      sourceCol: String): DataFrame = {
    val in = df.select(
      col(idCol).cast("long").as("media_id"),
      encode(col(textCol), "UTF-8").as("bytes"),
      col(sourceCol).as("source"))
    val enc = ExpressionEncoder(RowEncoder.encoderFor(MediaSchema))
    in.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val source = r.getString(2)
        val n = bytes.length
        val wB = 1 + n % 5
        val hB = 1 + (n.toLong * 3 % 4).toInt
        val payload = Jpeg.encodeGrayBlocks(wB, hB,
          k => if (n == 0) 0 else bytes(k % n) & 0xff)
        Row(id, payload, Row("image/jpeg", payload.length.toLong, source))
      }
    }(enc)
  }

  private val PixelStatsSchema: StructType = StructType(Seq(
    StructField("width", LongType),
    StructField("height", LongType),
    StructField("n_px", LongType),
    StructField("px_sum", LongType),
    StructField("px_min", LongType),
    StructField("px_max", LongType)))

  /** Decode each image payload (PNG inflate + un-filter, or baseline
    * JPEG Huffman + IDCT) and emit global pixel statistics over every
    * sample value; all-null stats for payloads that don't decode.
    * mapPartitions batch shape, like decodeContainerMeta.
    */
  def pixelStats(media: DataFrame): DataFrame = {
    val outSchema = StructType(media.schema.fields ++ PixelStatsSchema.fields)
    val enc = ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    val payloadIdx = media.schema.fieldIndex("payload")
    media.mapPartitions { rows =>
      rows.map { r =>
        val stats = decodeImage(r.getAs[Array[Byte]](payloadIdx)) match {
          case Some(img) =>
            var sum = 0L; var min = 255L; var max = 0L
            var i = 0
            while (i < img.pixels.length) {
              val v = img.pixels(i) & 0xff
              sum += v; if (v < min) min = v; if (v > max) max = v
              i += 1
            }
            val npx = img.width.toLong * img.height
            Seq(img.width.toLong, img.height.toLong, npx, sum,
              if (img.pixels.isEmpty) null else min,
              if (img.pixels.isEmpty) null else max)
          case None => Seq(null, null, null, null, null, null)
        }
        Row.fromSeq(r.toSeq ++ stats)
      }
    }(enc)
  }

  /** REAL image resize: decode the image (PNG or baseline JPEG),
    * nearest-neighbor resample to tw×th (srcY = ⌊y·h/th⌋,
    * srcX = ⌊x·w/tw⌋ — the standard NN mapping), re-encode as PNG
    * (the lossless interchange choice: resizing must not add a second
    * lossy pass). Adds a `resized` binary column; null when the
    * payload doesn't decode. The byte-level codec-agnostic path is
    * `resize` above.
    */
  def resizeImage(media: DataFrame, tw: Int, th: Int): DataFrame = {
    require(tw > 0 && th > 0, s"bad target dims ${tw}x$th")
    val outSchema = StructType(media.schema.fields :+ StructField("resized", BinaryType))
    val enc = ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    val payloadIdx = media.schema.fieldIndex("payload")
    media.mapPartitions { rows =>
      rows.map { r =>
        val resized = decodeImage(r.getAs[Array[Byte]](payloadIdx)) match {
          case Some(img) =>
            val ch = img.channels
            val out = new Array[Byte](tw * th * ch)
            var y = 0
            while (y < th) {
              val sy = y.toLong * img.height / th
              var x = 0
              while (x < tw) {
                val sx = x.toLong * img.width / tw
                val src = (sy * img.width + sx).toInt * ch
                var k = 0
                while (k < ch) { out((y * tw + x) * ch + k) = img.pixels(src + k); k += 1 }
                x += 1
              }
              y += 1
            }
            encodePng(tw, th, ch, out)
          case None => null
        }
        Row.fromSeq(r.toSeq :+ resized)
      }
    }(enc)
  }

  private val SampleStatsSchema: StructType = StructType(Seq(
    StructField("channels", LongType),
    StructField("sample_rate", LongType),
    StructField("bits", LongType),
    StructField("n_vals", LongType),
    StructField("s_sum", LongType),
    StructField("s_min", LongType),
    StructField("s_max", LongType)))

  /** Decode each WAV payload (real PCM sample extraction) and emit
    * global statistics over every interleaved sample value; all-null
    * stats for payloads that don't decode.
    */
  def sampleStats(media: DataFrame): DataFrame = {
    val outSchema = StructType(media.schema.fields ++ SampleStatsSchema.fields)
    val enc = ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    val payloadIdx = media.schema.fieldIndex("payload")
    media.mapPartitions { rows =>
      rows.map { r =>
        val stats = decodeWav(r.getAs[Array[Byte]](payloadIdx)) match {
          case Some(a) =>
            var sum = 0L; var min = Long.MaxValue; var max = Long.MinValue
            var i = 0
            while (i < a.samples.length) {
              val v = a.samples(i)
              sum += v; if (v < min) min = v; if (v > max) max = v
              i += 1
            }
            Seq(a.channels.toLong, a.sampleRate.toLong, a.bitsPerSample.toLong,
              a.samples.length.toLong, sum,
              if (a.samples.isEmpty) null else min,
              if (a.samples.isEmpty) null else max)
          case None => Seq(null, null, null, null, null, null, null)
        }
        Row.fromSeq(r.toSeq ++ stats)
      }
    }(enc)
  }
}
