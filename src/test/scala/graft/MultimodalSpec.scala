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

  test("WAV: odd-length data chunk gets a RIFF pad byte and still round-trips") {
    val b = Multimodal.encodeWav(1, 8000, new Array[Byte](7)) // 7 bytes, 1ch → odd data
    assert(b.length == 44 + 7 + 1) // pad byte present
    val riffSize = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt(4)
    assert(riffSize == b.length - 8) // RIFF size covers the pad
    val m = Multimodal.parseContainerMeta(b)
    assert(m.getString(0) == "wav" && m.getLong(5) == 7L)
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
}
