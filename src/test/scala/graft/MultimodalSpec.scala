package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

/** The REAL container codecs: PNG/WAV encode must round-trip through
  * the byte-level parser, and the parser must REJECT (all-null, format
  * "unknown") anything corrupt rather than return plausible garbage.
  */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("PNG round-trip: encoded dims come back out of the IHDR parse") {
    for ((w, h) <- Seq((1, 1), (640, 480), (509, 293), (1 << 20, 3))) {
      val m = Multimodal.parseContainerMeta(Multimodal.encodePng(w, h))
      assert(m.getString(0) == "png")
      assert(m.getLong(1) == w && m.getLong(2) == h)
      assert(m.isNullAt(3) && m.isNullAt(4) && m.isNullAt(5) && m.isNullAt(6))
    }
  }

  test("PNG: a corrupted IHDR fails the CRC check and parses as unknown") {
    val good = Multimodal.encodePng(640, 480)
    val bad = good.clone()
    bad(17) = (bad(17) ^ 0x01).toByte // flip a width bit, CRC now stale
    assert(Multimodal.parseContainerMeta(bad).getString(0) == "unknown")
  }

  test("WAV round-trip: fmt/data chunk walk recovers layout and duration") {
    val pcm = Array.tabulate(1001)(i => (i % 251).toByte)
    val m = Multimodal.parseContainerMeta(Multimodal.encodeWav(2, 16000, pcm))
    assert(m.getString(0) == "wav")
    assert(m.isNullAt(1) && m.isNullAt(2))
    assert(m.getLong(3) == 2L)
    assert(m.getLong(4) == 16000L)
    assert(m.getLong(5) == 500L) // 1001 bytes → 1000 whole 2-byte frames → 500 samples
    assert(m.getLong(6) == 500L * 1000000L / 16000L)
  }

  test("WAV: empty PCM yields zero samples, zero duration") {
    val m = Multimodal.parseContainerMeta(
      Multimodal.encodeWav(1, 8000, Array.emptyByteArray))
    assert(m.getString(0) == "wav" && m.getLong(5) == 0L && m.getLong(6) == 0L)
  }

  test("garbage, truncation, and corrupt RIFF sizes parse as unknown (no hang)") {
    val cases = Seq[Array[Byte]](
      null,
      Array.emptyByteArray,
      "not a media file".getBytes("US-ASCII"),
      Multimodal.encodePng(10, 10).take(20),      // truncated mid-IHDR
      {                                            // negative chunk size
        val b = Multimodal.encodeWav(1, 8000, new Array[Byte](8))
        val buf = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        buf.putInt(16, -8)
        b
      },
      // data chunk claiming more bytes than the file holds: truncation
      // must NOT report plausible n_samples from the claimed size
      Multimodal.encodeWav(1, 8000, new Array[Byte](64)).dropRight(32))
    cases.foreach(b =>
      assert(Multimodal.parseContainerMeta(b).getString(0) == "unknown"))
  }

  test("WAV: chunk size near Int.MaxValue must not wrap pos negative") {
    // a crafted (non-"data") chunk whose size would overflow Int when
    // advancing the walk: both decoders must return None/unknown, not
    // throw StringIndexOutOfBoundsException from a negative pos
    def crafted(): Array[Byte] = {
      val b = Multimodal.encodeWav(1, 8000, new Array[Byte](8))
      val buf = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.putInt(12, 0x4b4e554a) // rename "fmt " chunk to junk id
      buf.putInt(16, Int.MaxValue - 4) // size that overflows pos + 8 + size
      b
    }
    assert(Multimodal.decodeWav(crafted()).isEmpty)
    assert(Multimodal.parseContainerMeta(crafted()).getString(0) == "unknown")
  }

  test("WAV: odd-length data chunk gets a RIFF pad byte and still round-trips") {
    val b = Multimodal.encodeWav(1, 8000, new Array[Byte](7)) // 7 bytes, 1ch → odd data
    assert(b.length == 44 + 7 + 1) // pad byte present
    val riffSize = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt(4)
    assert(riffSize == b.length - 8) // RIFF size covers the pad
    val m = Multimodal.parseContainerMeta(b)
    assert(m.getString(0) == "wav" && m.getLong(5) == 7L)
  }

  // ---- REAL pixel-level codec ---- //

  test("PNG pixel round-trip: every filter type, every color mode, exact bytes") {
    // ≥5 rows so the default row%5 chooser exercises all five filters
    val rnd = new scala.util.Random(42)
    for (ch <- Seq(1, 2, 3, 4); (w, h) <- Seq((1, 1), (3, 7), (17, 6), (7, 5))) {
      val px = Array.fill(w * h * ch)(rnd.nextInt(256).toByte)
      val img = Multimodal.decodePng(Multimodal.encodePng(w, h, ch, px))
        .getOrElse(fail(s"decode failed for ch=$ch ${w}x$h"))
      assert(img.width == w && img.height == h && img.channels == ch)
      assert(img.pixels.sameElements(px), s"pixel mismatch ch=$ch ${w}x$h")
    }
  }

  test("PNG pixel round-trip: each single filter type in isolation") {
    val rnd = new scala.util.Random(7)
    val (w, h, ch) = (13, 9, 3)
    val px = Array.fill(w * h * ch)(rnd.nextInt(256).toByte)
    for (ft <- 0 to 4) {
      val img = Multimodal.decodePng(Multimodal.encodePng(w, h, ch, px, _ => ft))
        .getOrElse(fail(s"decode failed for filter $ft"))
      assert(img.pixels.sameElements(px), s"pixel mismatch under filter $ft")
    }
  }

  test("PNG decode: known hand-computed fixture (Sub filter, gray)") {
    // 3x2 gray, rows filtered with Sub: recon(x) = filt(x) + recon(x-1).
    // pixels row0 = [10, 20, 30], row1 = [5, 5, 250]
    val px = Array[Byte](10, 20, 30, 5, 5, 250.toByte)
    val encoded = Multimodal.encodePng(3, 2, 1, px, _ => 1)
    val img = Multimodal.decodePng(encoded).get
    assert(img.pixels.map(_ & 0xff).toSeq == Seq(10, 20, 30, 5, 5, 250))
  }

  test("PNG decode rejects corruption: IDAT bit-flip, truncation, header-only") {
    val px = Array.tabulate(64)(i => (i * 3).toByte)
    val good = Multimodal.encodePng(8, 8, 1, px)
    assert(Multimodal.decodePng(good).isDefined)
    // flip a byte inside IDAT data: chunk CRC now stale → None, not garbage
    val bad = good.clone()
    bad(8 + 25 + 8 + 4) = (bad(8 + 25 + 8 + 4) ^ 0x40).toByte
    assert(Multimodal.decodePng(bad).isEmpty)
    assert(Multimodal.decodePng(good.dropRight(20)).isEmpty)   // truncated
    assert(Multimodal.decodePng(Multimodal.encodePng(8, 8)).isEmpty) // no pixels
    assert(Multimodal.decodePng(null).isEmpty)
  }

  test("WAV 16-bit sine round-trip: exact signed samples back out") {
    val sine = Array.tabulate(800)(i =>
      (math.sin(2 * math.Pi * i / 100) * 30000).toShort)
    val a = Multimodal.decodeWav(Multimodal.encodeWav16(2, 16000, sine)).get
    assert(a.channels == 2 && a.sampleRate == 16000 && a.bitsPerSample == 16)
    assert(a.samples.length == 800)
    assert(a.samples.sameElements(sine.map(_.toInt)))
  }

  test("WAV 8-bit decode: unsigned sample values, truncation rejected") {
    val pcm = Array.tabulate(100)(i => (i * 17).toByte) // wraps past 127
    val a = Multimodal.decodeWav(Multimodal.encodeWav(1, 8000, pcm)).get
    assert(a.bitsPerSample == 8)
    assert(a.samples.sameElements(pcm.map(_ & 0xff))) // unsigned, not sign-extended
    assert(Multimodal.decodeWav(
      Multimodal.encodeWav(1, 8000, new Array[Byte](64)).dropRight(32)).isEmpty)
  }

  test("decodeFeatures uses REAL pixels for PNG payloads, bytes otherwise") {
    import spark.implicits._
    // constant-gray image: every pixel 100 → every feature window mean 100
    val px = Array.fill(40 * 5)(100.toByte)
    val png = Multimodal.encodePng(40, 5, 1, px)
    val media = Seq((1L, png), (2L, "plain text payload, no container".getBytes("UTF-8")))
      .toDF("media_id", "payload")
      .select(col("media_id"), col("payload"),
        org.apache.spark.sql.functions.struct(
          org.apache.spark.sql.functions.lit("x").as("mime"),
          org.apache.spark.sql.functions.lit(0L).as("n_bytes"),
          org.apache.spark.sql.functions.lit("s").as("source")).as("meta"))
    val out = Multimodal.decodeFeatures(media).orderBy("media_id")
      .select("features").as[Seq[Float]].collect()
    assert(out(0).forall(_ == 100f)) // pixel stats, NOT compressed-byte stats
    assert(out(1).exists(_ != 100f)) // text fell back to raw bytes
  }

  test("pixelStats + resizeImage: cyclic-fill arithmetic matches the decode") {
    import spark.implicits._
    val text = "abcdefghij" * 9 // n=90 → w = 1+90%127 = 91, h = 1+630%89 = 8
    val docs = Seq((5L, text, "s1")).toDF("doc_id", "text", "source")
    val media = Multimodal.asPixelMedia(docs, "doc_id", "text", "source")
    val st = Multimodal.pixelStats(media)
      .select("width", "height", "n_px", "px_sum", "px_min", "px_max").head()
    val n = text.length; val w = 1 + n % 127; val h = 1 + (n * 7) % 89
    val bytes = text.getBytes("UTF-8").map(_ & 0xff)
    val npx = w * h
    val expSum = (0 until npx).map(i => bytes(i % n).toLong).sum
    assert(st.getLong(0) == w && st.getLong(1) == h && st.getLong(2) == npx)
    assert(st.getLong(3) == expSum)
    assert(st.getLong(4) == bytes.slice(0, math.min(npx, n)).min)
    assert(st.getLong(5) == bytes.slice(0, math.min(npx, n)).max)
    // resize to 4x4 then re-decode: nearest-neighbor source arithmetic
    val rs = Multimodal.pixelStats(
        Multimodal.resizeImage(media, 4, 4).select(col("media_id"), col("resized").as("payload")))
      .select("n_px", "px_sum").head()
    val expRs = (for (y <- 0 until 4; x <- 0 until 4) yield {
      val sy = y * h / 4; val sx = x * w / 4
      bytes((sy * w + sx) % n).toLong
    }).sum
    assert(rs.getLong(0) == 16 && rs.getLong(1) == expRs)
  }

  test("sampleStats: container WAVs yield real sample statistics") {
    import spark.implicits._
    val docs = Seq((2L, "wav payload bytes!", "s2")).toDF("doc_id", "text", "source")
    val st = Multimodal.sampleStats(
        Multimodal.asContainerMedia(docs, "doc_id", "text", "source"))
      .select("channels", "sample_rate", "bits", "n_vals", "s_sum", "s_min", "s_max").head()
    val bytes = "wav payload bytes!".getBytes("UTF-8").map(_ & 0xff)
    val ch = 2 // id 2: 1 + (2/2) % 2
    val dl = bytes.length - bytes.length % ch
    assert(st.getLong(0) == ch && st.getLong(1) == 8000L * 3 && st.getLong(2) == 8L)
    assert(st.getLong(3) == dl)
    assert(st.getLong(4) == bytes.take(dl).map(_.toLong).sum)
    assert(st.getLong(5) == bytes.take(dl).min && st.getLong(6) == bytes.take(dl).max)
  }

  test("decodeContainerMeta runs the parse in the partition-batch path") {
    import spark.implicits._
    val docs = Seq((1L, "hello png world", "s1"), (2L, "wav payload bytes!", "s2"))
      .toDF("doc_id", "text", "source")
    val out = Multimodal.decodeContainerMeta(
        Multimodal.asContainerMedia(docs, "doc_id", "text", "source"))
      .select("media_id", "format", "width", "height", "channels", "sample_rate",
        "n_samples", "duration_us")
      .orderBy("media_id")
      .collect()
    val png = out(0)
    assert(png.getString(1) == "png")
    assert(png.getLong(2) == 1 + 15 % 509 && png.getLong(3) == 1 + 15 * 7 % 293)
    val wav = out(1)
    assert(wav.getString(1) == "wav")
    assert(wav.getLong(4) == 2L)           // id 2: channels = 1 + (2/2) % 2 = 2
    assert(wav.getLong(5) == 8000L * 3)    // rate = 8000 * (1 + 2 % 3)
    assert(wav.getLong(6) == 18L / 2)      // 18 bytes → 9 two-byte frames
  }

  test("MP3 round-trip: frame count, rate, channels and duration from the header walk") {
    for {
      frames <- Seq(1, 3, 7)
      brIdx <- Seq(1, 9, 14) // 32, 160, 320 kbps
      srIdx <- 0 to 2
      stereo <- Seq(false, true)
    } {
      val bytes = Multimodal.encodeMp3(frames, brIdx, srIdx, stereo)
      val m = Multimodal.parseContainerMeta(bytes)
      val rate = Seq(44100L, 48000L, 32000L)(srIdx)
      assert(m.getString(0) == "mp3", s"f=$frames br=$brIdx sr=$srIdx")
      assert(m.getLong(3) == (if (stereo) 2L else 1L))
      assert(m.getLong(4) == rate)
      assert(m.getLong(5) == frames * 1152L)
      assert(m.getLong(6) == frames * 1152L * 1000000L / rate)
    }
  }

  test("MP3: ID3v2 tag (syncsafe size) is skipped before the frame walk") {
    val audio = Multimodal.encodeMp3(nFrames = 2, bitrateIdx = 9, srIdx = 0)
    // 300-byte tag body: syncsafe 300 = (2, 44): 2<<7 | 44
    val tag = Array[Byte]('I', 'D', '3', 3, 0, 0, 0, 0, 2, 44) ++ new Array[Byte](300)
    val m = Multimodal.parseContainerMeta(tag ++ audio)
    assert(m.getString(0) == "mp3" && m.getLong(5) == 2 * 1152L)
    // a tag whose claimed size runs past the payload is unknown, not a crash
    val truncated = Array[Byte]('I', 'D', '3', 3, 0, 0, 0x7f, 0x7f, 0x7f, 0x7f) ++ audio
    assert(Multimodal.parseContainerMeta(truncated).getString(0) == "unknown")
  }

  test("MP3: truncation, free-format bitrate, and mid-stream junk handled soundly") {
    val one = Multimodal.encodeMp3(nFrames = 1, bitrateIdx = 5, srIdx = 1)
    // a frame cut short is not a frame
    assert(Multimodal.parseContainerMeta(one.dropRight(1)).getString(0) == "unknown")
    // free-format (bitrate index 0): frame length unknowable → unknown
    val free = one.clone(); free(2) = (free(2) & 0x0f).toByte
    assert(Multimodal.parseContainerMeta(free).getString(0) == "unknown")
    // trailing garbage after complete frames: count stops, meta stands
    val junk = one ++ Array[Byte](0x00, 0x42)
    val m = Multimodal.parseContainerMeta(junk)
    assert(m.getString(0) == "mp3" && m.getLong(5) == 1152L)
    // reserved version bits (0xff 0xea) must not parse
    val reserved = one.clone(); reserved(1) = 0xea.toByte
    assert(Multimodal.parseContainerMeta(reserved).getString(0) == "unknown")
  }

  test("MP4 round-trip: dims, track count, timescale and duration from the box walk") {
    for {
      ts <- Seq(600, 1000, 90000)
      ticks <- Seq(0L, 1L, 997L, 86400L)
      tracks <- Seq(1, 2, 3)
    } {
      val bytes = Multimodal.encodeMp4(ts, ticks, width = 640, height = 360, tracks)
      val m = Multimodal.parseContainerMeta(bytes)
      assert(m.getString(0) == "mp4", s"ts=$ts ticks=$ticks tracks=$tracks")
      assert(m.getLong(1) == 640L && m.getLong(2) == 360L)
      assert(m.getLong(3) == tracks.toLong)
      assert(m.getLong(4) == ts.toLong && m.getLong(5) == ticks)
      assert(m.getLong(6) == ticks * 1000000L / ts)
    }
  }

  test("MP4: malformed trees are unknown, not plausible meta") {
    val good = Multimodal.encodeMp4(1000, 500L, 320, 240)
    // moov truncated mid-box: truncation, not a shorter movie
    assert(Multimodal.parseContainerMeta(good.dropRight(5)).getString(0) == "unknown")
    // no ftyp leader (moov alone): not sniffed as mp4
    assert(Multimodal.parseContainerMeta(good.drop(20)).getString(0) == "unknown")
    // corrupt box size (runs past the payload)
    val bad = good.clone()
    val moovOff = 20
    bad(moovOff) = 0x7f.toByte // moov size becomes huge
    assert(Multimodal.parseContainerMeta(bad).getString(0) == "unknown")
    // trailing bytes after a complete tree don't break the walk — the
    // top-level scan just keeps walking boxes; junk shorter than a
    // header fails the final box read, so append a full free box
    val free = Array[Byte](0, 0, 0, 8, 'f', 'r', 'e', 'e')
    val m = Multimodal.parseContainerMeta(good ++ free)
    assert(m.getString(0) == "mp4" && m.getLong(5) == 500L)
  }

  test("FLAC round-trip: rate, channels and total samples from the packed STREAMINFO field") {
    for {
      rate <- Seq(8000, 44100, 48000, 96000, 655350)
      ch <- Seq(1, 2, 8)
      bits <- Seq(8, 16, 24)
      ns <- Seq(0L, 1L, 9973L, (1L << 36) - 1)
    } {
      val bytes = Multimodal.encodeFlac(rate, ch, bits, ns)
      val m = Multimodal.parseContainerMeta(bytes)
      assert(m.getString(0) == "flac", s"rate=$rate ch=$ch bits=$bits ns=$ns")
      assert(m.getLong(3) == ch.toLong && m.getLong(4) == rate.toLong)
      assert(m.getLong(5) == ns && m.getLong(6) == ns * 1000000L / rate)
    }
  }

  test("FLAC: malformed streams are unknown, not plausible meta") {
    val good = Multimodal.encodeFlac(44100, 2, 16, 1234L)
    // STREAMINFO truncated mid-block: truncation, not a shorter stream
    assert(Multimodal.parseContainerMeta(good.dropRight(5)).getString(0) == "unknown")
    // wrong STREAMINFO length (the spec fixes it at 34)
    val badLen = good.clone(); badLen(7) = 20
    assert(Multimodal.parseContainerMeta(badLen).getString(0) == "unknown")
    // a zero sample rate is invalid per spec
    val zeroRate = Multimodal.encodeFlac(1, 2, 16, 10L)
    java.util.Arrays.fill(zeroRate, 18, 21, 0.toByte) // clear the 20-bit rate field
    assert(Multimodal.parseContainerMeta(zeroRate).getString(0) == "unknown")
    // a non-STREAMINFO leading block flagged last: no STREAMINFO at all
    val noInfo = good.clone(); noInfo(4) = (0x80 | 4).toByte // VORBIS_COMMENT
    assert(Multimodal.parseContainerMeta(noInfo).getString(0) == "unknown")
    // a padding block BEFORE STREAMINFO still reaches it (walk, not peek)
    val pad = Array[Byte](4, 0, 0, 2, 0, 0) // type 4, len 2, two zero bytes
    val walked = good.take(4) ++ pad ++ good.drop(4)
    val m = Multimodal.parseContainerMeta(walked)
    assert(m.getString(0) == "flac" && m.getLong(5) == 1234L)
  }

  test("GIF round-trip: dims, frame count and accumulated delays from the block walk") {
    for {
      (w, h) <- Seq((1, 1), (640, 480), (65535, 65535))
      frames <- Seq(1, 2, 5)
      delay <- Seq(0, 7, 65535)
    } {
      val bytes = Multimodal.encodeGif(w, h, frames, delay)
      val m = Multimodal.parseContainerMeta(bytes)
      assert(m.getString(0) == "gif", s"w=$w h=$h frames=$frames delay=$delay")
      assert(m.getLong(1) == w.toLong && m.getLong(2) == h.toLong)
      assert(m.getLong(5) == frames.toLong)
      assert(m.getLong(6) == frames.toLong * delay * 10000L)
    }
  }

  test("GIF: malformed streams are unknown, not plausible meta") {
    val good = Multimodal.encodeGif(10, 20, 3, 4)
    // truncated mid sub-block chain: truncation, not fewer frames
    assert(Multimodal.parseContainerMeta(good.dropRight(3)).getString(0) == "unknown")
    // missing trailer: the walk must not report a complete animation
    assert(Multimodal.parseContainerMeta(good.dropRight(1)).getString(0) == "unknown")
    // an unknown block introducer aborts the walk
    val junk = good.clone(); junk(19) = 0x55 // first frame's GCE intro byte
    assert(Multimodal.parseContainerMeta(junk).getString(0) == "unknown")
    // GIF87a (no extensions) parses too: strip the GCEs
    val bytes = Multimodal.encodeGif(10, 20, 1, 4)
    val gce = 8 // GCE block length: 0x21 0xf9 0x04 packed delay*2 tidx 0x00
    val lsdEnd = 13 + 6 // header+LSD + 2-entry GCT
    val no89 = ("GIF87a".getBytes("US-ASCII") ++ bytes.slice(6, lsdEnd)
      ++ bytes.slice(lsdEnd + gce, bytes.length))
    val m = Multimodal.parseContainerMeta(no89)
    assert(m.getString(0) == "gif" && m.getLong(5) == 1L && m.getLong(6) == 0L)
  }

  test("WebP round-trip: VP8X canvas, ANMF count and summed durations") {
    for {
      (w, h) <- Seq((1, 1), (1024, 768), (1 << 24, 1 << 24))
      frames <- Seq(1, 3, 4)
      dur <- Seq(0, 33, 99)
    } {
      val bytes = Multimodal.encodeWebp(w, h, frames, dur)
      val m = Multimodal.parseContainerMeta(bytes)
      assert(m.getString(0) == "webp", s"w=$w h=$h frames=$frames dur=$dur")
      assert(m.getLong(1) == w.toLong && m.getLong(2) == h.toLong)
      assert(m.getLong(5) == frames.toLong)
      assert(m.getLong(6) == frames.toLong * dur * 1000L)
    }
  }

  test("WebP: malformed and still-image streams") {
    val good = Multimodal.encodeWebp(100, 50, 2, 40)
    // truncated chunk: unknown, not fewer frames
    assert(Multimodal.parseContainerMeta(good.dropRight(4)).getString(0) == "unknown")
    // no VP8X and no VP8L: no dims -> unknown
    val bare = good.take(12)
    assert(Multimodal.parseContainerMeta(bare).getString(0) == "unknown")
    // VP8L still image: dims from the 14-bit packed lossless header
    val vp8l = {
      val bos = new java.io.ByteArrayOutputStream()
      def u32le(v: Int): Unit = (0 to 3).foreach(i => bos.write((v >>> (8 * i)) & 0xff))
      "RIFF".foreach(bos.write(_)); u32le(4 + 8 + 6); "WEBP".foreach(bos.write(_))
      "VP8L".foreach(bos.write(_)); u32le(6)
      bos.write(0x2f)
      // w-1 = 99 (14 bits), h-1 = 49 (14 bits), LSB-first packed
      val packed = 99 | (49 << 14)
      u32le(packed); bos.write(0)
      bos.toByteArray
    }
    val m = Multimodal.parseContainerMeta(vp8l)
    assert(m.getString(0) == "webp" && m.getLong(1) == 100L && m.getLong(2) == 50L)
    assert(m.getLong(5) == 1L && m.getLong(6) == 0L)
  }
}
