package graft

import java.io.ByteArrayInputStream

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Jpeg, Multimodal}

/** Baseline-JPEG codec tests. The decoder is cross-validated against
  * `javax.imageio` (an independent libjpeg-derived implementation that
  * ships with the JDK) in BOTH directions: our encoder's bytes must
  * decode identically under ImageIO, and ImageIO-written JPEGs must
  * decode under our decoder within the spec's IDCT tolerance.
  */
class JpegSpec extends AnyFunSuite {

  private def imageIoGray(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(bytes))
    assert(img != null, "ImageIO failed to decode")
    val w = img.getWidth; val h = img.getHeight
    val px = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { px(y * w + x) = img.getRaster.getSample(x, y, 0); x += 1 }
      y += 1
    }
    (w, h, px)
  }

  test("constant-block encode -> own decode: bit-exact pixels") {
    val rnd = new scala.util.Random(11)
    for (_ <- 1 to 5) {
      val wB = 1 + rnd.nextInt(5); val hB = 1 + rnd.nextInt(4)
      val vals = Array.fill(wB * hB)(rnd.nextInt(256))
      val img = Jpeg.decode(Jpeg.encodeGrayBlocks(wB, hB, vals)).get
      assert(img.width == wB * 8 && img.height == hB * 8 && img.channels == 1)
      for (y <- 0 until img.height; x <- 0 until img.width) {
        val expected = vals((y / 8) * wB + x / 8)
        assert((img.pixels(y * img.width + x) & 0xff) == expected,
          s"pixel ($x,$y) block value mismatch")
      }
    }
  }

  test("constant-block encode -> ImageIO decode: independent decoder agrees") {
    val vals = Array.tabulate(4 * 3)(k => (k * 37 + 5) % 256)
    val bytes = Jpeg.encodeGrayBlocks(4, 3, vals)
    val (w, h, px) = imageIoGray(bytes)
    assert(w == 32 && h == 24)
    for (y <- 0 until h; x <- 0 until w)
      assert(px(y * w + x) == vals((y / 8) * 4 + x / 8),
        s"ImageIO pixel ($x,$y) mismatch")
  }

  test("ImageIO-encoded gray noise -> own decode matches ImageIO decode (IDCT tolerance)") {
    val rnd = new scala.util.Random(23)
    val w = 40; val h = 24
    val src = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      src.getRaster.setSample(x, y, 0, rnd.nextInt(256))
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(src, "jpg", bos))
    val bytes = bos.toByteArray
    val mine = Jpeg.decode(bytes).get
    assert(mine.width == w && mine.height == h && mine.channels == 1)
    val (_, _, ref) = imageIoGray(bytes)
    var maxDiff = 0; var sumDiff = 0L
    for (i <- 0 until w * h) {
      val d = math.abs((mine.pixels(i) & 0xff) - ref(i))
      maxDiff = math.max(maxDiff, d); sumDiff += d
    }
    // different conforming IDCTs may differ by ±1 the odd pixel (T.81
    // Annex A accuracy); anything larger is a real decode bug
    assert(maxDiff <= 2, s"max pixel diff $maxDiff vs independent decoder")
    assert(sumDiff.toDouble / (w * h) < 0.5, s"mean abs diff ${sumDiff.toDouble / (w * h)}")
  }

  test("ImageIO-encoded RGB constant color -> own decode: 3-component + subsampling path") {
    // constant chroma makes the upsampling filter choice irrelevant, so
    // this pins the YCbCr MCU walk + conversion without filter skew
    for ((r, g, b) <- Seq((200, 40, 90), (10, 200, 30), (128, 128, 128))) {
      val w = 48; val h = 32
      val src = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      for (y <- 0 until h; x <- 0 until w) src.setRGB(x, y, (r << 16) | (g << 8) | b)
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(src, "jpg", bos))
      val mine = Jpeg.decode(bos.toByteArray).get
      assert(mine.width == w && mine.height == h && mine.channels == 3)
      for (i <- 0 until w * h) {
        assert(math.abs((mine.pixels(3 * i) & 0xff) - r) <= 3, s"R at $i for ($r,$g,$b)")
        assert(math.abs((mine.pixels(3 * i + 1) & 0xff) - g) <= 3, s"G at $i for ($r,$g,$b)")
        assert(math.abs((mine.pixels(3 * i + 2) & 0xff) - b) <= 3, s"B at $i for ($r,$g,$b)")
      }
    }
  }

  test("parseMeta reads dims/components; container meta reports jpeg") {
    val bytes = Jpeg.encodeGrayBlocks(3, 2, _ => 7)
    assert(Jpeg.parseMeta(bytes).contains((24, 16, 1)))
    val m = Multimodal.parseContainerMeta(bytes)
    assert(m.getString(0) == "jpeg" && m.getLong(1) == 24L && m.getLong(2) == 16L
      && m.getLong(3) == 1L)
    // an ImageIO RGB jpeg reports 3 components
    val src = new java.awt.image.BufferedImage(16, 8,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(src, "jpg", bos))
    assert(Jpeg.parseMeta(bos.toByteArray).contains((16, 8, 3)))
  }

  test("malformed inputs return None, never garbage") {
    val good = Jpeg.encodeGrayBlocks(2, 2, _ => 100)
    assert(Jpeg.decode(null).isEmpty)
    assert(Jpeg.decode(Array[Byte](1, 2, 3)).isEmpty)
    assert(Jpeg.decode("not a jpeg at all".getBytes("UTF-8")).isEmpty)
    assert(Jpeg.decode(good.dropRight(20)).isEmpty) // truncated mid-scan
    val noSof = good.take(2) ++ good.drop(2).filterNot(_ => false) // sanity: full copy decodes
    assert(Jpeg.decode(noSof).nonEmpty)
    // corrupt a Huffman table length byte -> structural failure, None
    val bad = good.clone()
    val dhtAt = {
      var p = 2
      while (!((bad(p) & 0xff) == 0xff && (bad(p + 1) & 0xff) == 0xc4)) p += 1
      p
    }
    bad(dhtAt + 5) = 99 // bits[0] = 99 codes of length 1: invalid
    assert(Jpeg.decode(bad).isEmpty)
  }
}
