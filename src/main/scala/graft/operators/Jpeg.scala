package graft.operators

import scala.util.control.NonFatal

/** Pure-JVM baseline JPEG codec, written from the public ITU T.81 spec
  * (no codec libraries): the real-decode arm for the most common web
  * image format, filling the documented swap point in
  * `Multimodal.realFeatures` (reference behavior: LightLane treats
  * media as opaque payloads; pixel decode is this engine's extension
  * surface, same as the PNG/WAV codecs).
  *
  * Decoder scope — baseline sequential DCT, 8-bit (SOF0): grayscale
  * and 3-component YCbCr with sampling factors 1–2 (4:4:4, 4:2:2,
  * 4:2:0), multiple DQT/DHT segments, restart intervals (DRI/RSTn),
  * 16-bit quantizer entries, FF00 byte stuffing. Progressive (SOF2),
  * arithmetic coding, 12-bit, and hierarchical modes return None, as
  * does anything malformed — never garbage pixels.
  *
  * Encoder scope — `encodeGrayBlocks` emits a spec-conformant
  * grayscale baseline JPEG whose 8×8 blocks are CONSTANT values with
  * an all-ones quantization table: the DCT of a constant block is
  * DC-only and quantizes losslessly, so the encode→decode round trip
  * is bit-exact under ANY conforming decoder (this one, or libjpeg
  * derivatives — pinned against `javax.imageio` in JpegSpec). That
  * exactness is what lets a DuckDB oracle predict every decoded pixel
  * from cyclic-byte arithmetic, the same contract as the PNG path.
  */
object Jpeg {

  /** Decoded 8-bit JPEG: row-major, `channels` interleaved samples per
    * pixel (1 = gray, 3 = RGB after JFIF YCbCr conversion).
    */
  final case class JpegImage(width: Int, height: Int, channels: Int, pixels: Array[Byte])

  /** JPEG header probe: (width, height, nComponents) from the first
    * frame header (SOF0–SOF15, minus the DHT/DAC/JPG gaps), or None if
    * the bytes are not a well-formed JPEG stream prefix.
    */
  def parseMeta(bytes: Array[Byte]): Option[(Int, Int, Int)] = try {
    if (bytes == null || bytes.length < 4) return None
    if ((bytes(0) & 0xff) != 0xff || (bytes(1) & 0xff) != 0xd8) return None
    var pos = 2
    while (pos + 4 <= bytes.length) {
      if ((bytes(pos) & 0xff) != 0xff) return None
      val marker = bytes(pos + 1) & 0xff
      if (marker == 0xff) { pos += 1 } // fill byte
      else if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd8)) { pos += 2 }
      else {
        val len = ((bytes(pos + 2) & 0xff) << 8) | (bytes(pos + 3) & 0xff)
        if (len < 2 || pos + 2 + len > bytes.length) return None
        if (isSof(marker)) {
          if (len < 8) return None
          val h = ((bytes(pos + 5) & 0xff) << 8) | (bytes(pos + 6) & 0xff)
          val w = ((bytes(pos + 7) & 0xff) << 8) | (bytes(pos + 8) & 0xff)
          val nc = bytes(pos + 9) & 0xff
          if (w <= 0 || h <= 0 || nc <= 0) return None
          return Some((w, h, nc))
        }
        if (marker == 0xd9 || marker == 0xda) return None // EOI/SOS before any SOF
        pos += 2 + len
      }
    }
    None
  } catch { case NonFatal(_) => None }

  private def isSof(m: Int): Boolean =
    m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc

  // zigzag index -> natural (row-major) index, T.81 figure A.6
  private val ZigZag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  // IDCT basis: cosTab(u)(x) = C(u)·cos((2x+1)uπ/16) with C(0)=1/√2
  private val CosTab: Array[Array[Double]] = Array.tabulate(8, 8) { (u, x) =>
    val c = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
    c * math.cos((2 * x + 1) * u * math.Pi / 16.0)
  }

  /** Separable 2-D inverse DCT (T.81 A.3.3) of one dequantized block
    * (natural order), level-shifted (+128) and clamped into `out`.
    */
  private def idctBlock(coef: Array[Int], out: Array[Int]): Unit = {
    val tmp = new Array[Double](64)
    var u = 0
    while (u < 8) { // rows of coef -> tmp(u)(y) = Σv C(v) S(u,v) cos_y(v)
      var y = 0
      while (y < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) { s += CosTab(v)(y) * coef(u * 8 + v); v += 1 }
        tmp(u * 8 + y) = s
        y += 1
      }
      u += 1
    }
    var x = 0
    while (x < 8) {
      var y = 0
      while (y < 8) {
        var s = 0.0
        var uu = 0
        while (uu < 8) { s += CosTab(uu)(x) * tmp(uu * 8 + y); uu += 1 }
        val v = math.round(s / 4.0 + 128.0).toInt
        out(x * 8 + y) = if (v < 0) 0 else if (v > 255) 255 else v
        y += 1
      }
      x += 1
    }
  }

  /** Canonical Huffman table in the T.81 F.2.2.3 decode form. */
  private final class HuffTable(bits: Array[Int], vals: Array[Int]) {
    val minCode = new Array[Int](17)
    val maxCode = Array.fill(17)(-1)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0; var k = 0
      var l = 1
      while (l <= 16) {
        if (bits(l - 1) > 0) {
          valPtr(l) = k
          minCode(l) = code
          code += bits(l - 1); k += bits(l - 1)
          maxCode(l) = code - 1
        }
        code <<= 1
        l += 1
      }
    }
    def value(len: Int, code: Int): Int = vals(valPtr(len) + code - minCode(len))
  }

  /** Entropy-segment bit reader with FF00 stuffing; a non-RST marker
    * mid-scan raises (malformed for our sequential single-scan model).
    */
  private final class BitReader(bytes: Array[Byte], var pos: Int) {
    private var buf = 0
    private var cnt = 0
    def nextBit(): Int = {
      if (cnt == 0) {
        if (pos >= bytes.length) throw new IllegalStateException("eof in scan")
        var b = bytes(pos) & 0xff; pos += 1
        if (b == 0xff) {
          if (pos >= bytes.length) throw new IllegalStateException("eof after ff")
          val m = bytes(pos) & 0xff
          if (m == 0x00) pos += 1
          else throw new IllegalStateException(f"marker ff$m%02x in scan")
        }
        buf = b; cnt = 8
      }
      cnt -= 1
      (buf >> cnt) & 1
    }
    def receive(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { v = (v << 1) | nextBit(); i += 1 }
      v
    }
    /** Byte-align and consume an expected RSTn marker. */
    def restart(): Unit = {
      cnt = 0
      if (pos + 2 > bytes.length || (bytes(pos) & 0xff) != 0xff ||
          (bytes(pos + 1) & 0xf8) != 0xd0)
        throw new IllegalStateException("missing restart marker")
      pos += 2
    }
    def decodeHuff(t: HuffTable): Int = {
      var code = nextBit()
      var l = 1
      while (code > t.maxCode(l) || t.maxCode(l) < 0) {
        l += 1
        if (l > 16) throw new IllegalStateException("bad huffman code")
        code = (code << 1) | nextBit()
      }
      t.value(l, code)
    }
  }

  private def extend(v: Int, t: Int): Int =
    if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

  private val MaxDecodedBytes = 256L << 20 // same hostile-header cap as decodePng

  /** REAL pixel decode, pure JVM (see object doc for scope). Returns
    * None on anything outside baseline sequential or malformed.
    */
  def decode(bytes: Array[Byte]): Option[JpegImage] = try {
    if (bytes == null || bytes.length < 4) return None
    if ((bytes(0) & 0xff) != 0xff || (bytes(1) & 0xff) != 0xd8) return None
    val qt = new Array[Array[Int]](4) // natural-order quantizers
    val dcTab = new Array[HuffTable](4)
    val acTab = new Array[HuffTable](4)
    var width = 0; var height = 0; var nComp = 0
    var compId: Array[Int] = null; var compH: Array[Int] = null
    var compV: Array[Int] = null; var compQ: Array[Int] = null
    var dri = 0
    var pos = 2

    def u16(p: Int) = ((bytes(p) & 0xff) << 8) | (bytes(p + 1) & 0xff)

    var scanStart = -1
    var compDc: Array[Int] = null; var compAc: Array[Int] = null
    var scanOrder: Array[Int] = null
    while (scanStart < 0) {
      if (pos + 2 > bytes.length) return None
      if ((bytes(pos) & 0xff) != 0xff) return None
      val marker = bytes(pos + 1) & 0xff
      if (marker == 0xff) { pos += 1 }
      else if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd8)) { pos += 2 }
      else if (marker == 0xd9) return None // EOI before SOS
      else {
        if (pos + 4 > bytes.length) return None
        val len = u16(pos + 2)
        val seg = pos + 4
        val segEnd = pos + 2 + len
        if (len < 2 || segEnd > bytes.length) return None
        marker match {
          case 0xdb => // DQT: one or more tables
            var p = seg
            while (p < segEnd) {
              val pq = (bytes(p) & 0xff) >> 4; val tq = bytes(p) & 0x0f
              if (pq > 1 || tq > 3) return None
              val tab = new Array[Int](64)
              p += 1
              var i = 0
              while (i < 64) {
                val v = if (pq == 1) { val x = u16(p); p += 2; x }
                        else { val x = bytes(p) & 0xff; p += 1; x }
                if (v <= 0) return None
                tab(ZigZag(i)) = v
                i += 1
              }
              qt(tq) = tab
            }
          case 0xc4 => // DHT: one or more tables
            var p = seg
            while (p < segEnd) {
              val tc = (bytes(p) & 0xff) >> 4; val th = bytes(p) & 0x0f
              if (tc > 1 || th > 3) return None
              p += 1
              val bitsArr = Array.tabulate(16)(i => bytes(p + i) & 0xff)
              p += 16
              val n = bitsArr.sum
              if (n == 0 || n > 256 || p + n > segEnd) return None
              val vals = Array.tabulate(n)(i => bytes(p + i) & 0xff)
              p += n
              val t = new HuffTable(bitsArr, vals)
              if (tc == 0) dcTab(th) = t else acTab(th) = t
            }
          case 0xc0 | 0xc1 => // SOF0 baseline (and SOF1 ext. sequential, same layout)
            if (bytes(seg) != 8) return None // 8-bit precision only
            height = u16(seg + 1); width = u16(seg + 3)
            nComp = bytes(seg + 5) & 0xff
            if (width <= 0 || height <= 0 || (nComp != 1 && nComp != 3)) return None
            if (width.toLong * height * nComp > MaxDecodedBytes) return None
            compId = new Array[Int](nComp); compH = new Array[Int](nComp)
            compV = new Array[Int](nComp); compQ = new Array[Int](nComp)
            var c = 0
            while (c < nComp) {
              val b = seg + 6 + 3 * c
              compId(c) = bytes(b) & 0xff
              compH(c) = (bytes(b + 1) & 0xff) >> 4
              compV(c) = bytes(b + 1) & 0x0f
              compQ(c) = bytes(b + 2) & 0xff
              if (compH(c) < 1 || compH(c) > 2 || compV(c) < 1 || compV(c) > 2 ||
                  compQ(c) > 3) return None
              c += 1
            }
          case m if isSof(m) => return None // progressive/arithmetic/12-bit
          case 0xdd => // DRI
            if (len != 4) return None
            dri = u16(seg)
          case 0xda => // SOS
            if (nComp == 0) return None
            val ns = bytes(seg) & 0xff
            if (ns != nComp) return None // single interleaved scan only
            compDc = new Array[Int](nComp); compAc = new Array[Int](nComp)
            scanOrder = new Array[Int](nComp)
            var s = 0
            while (s < ns) {
              val cs = bytes(seg + 1 + 2 * s) & 0xff
              val ci = compId.indexOf(cs)
              if (ci < 0) return None
              scanOrder(s) = ci
              compDc(ci) = (bytes(seg + 2 + 2 * s) & 0xff) >> 4
              compAc(ci) = bytes(seg + 2 + 2 * s) & 0x0f
              s += 1
            }
            // Ss=0, Se=63, AhAl=0 for sequential
            if ((bytes(segEnd - 3) & 0xff) != 0 || (bytes(segEnd - 2) & 0xff) != 63 ||
                (bytes(segEnd - 1) & 0xff) != 0) return None
            scanStart = segEnd
          case _ => () // APPn/COM/unknown: skip
        }
        if (scanStart < 0) pos = segEnd
      }
    }

    val hMax = compH.max; val vMax = compV.max
    val mcusX = (width + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (height + 8 * vMax - 1) / (8 * vMax)
    // padded per-component planes
    val planeW = Array.tabulate(nComp)(c => mcusX * compH(c) * 8)
    val planeH = Array.tabulate(nComp)(c => mcusY * compV(c) * 8)
    val planes = Array.tabulate(nComp)(c => new Array[Byte](planeW(c) * planeH(c)))
    for (c <- 0 until nComp)
      if (qt(compQ(c)) == null || dcTab(compDc(c)) == null || acTab(compAc(c)) == null)
        return None

    val rd = new BitReader(bytes, scanStart)
    val pred = new Array[Int](nComp)
    val coef = new Array[Int](64)
    val samp = new Array[Int](64)
    var mcu = 0
    val nMcus = mcusX * mcusY
    while (mcu < nMcus) {
      if (dri > 0 && mcu > 0 && mcu % dri == 0) {
        rd.restart()
        java.util.Arrays.fill(pred, 0)
      }
      val mx = mcu % mcusX; val my = mcu / mcusX
      var s = 0
      while (s < nComp) {
        val c = scanOrder(s)
        val q = qt(compQ(c)); val dc = dcTab(compDc(c)); val ac = acTab(compAc(c))
        var by = 0
        while (by < compV(c)) {
          var bx = 0
          while (bx < compH(c)) {
            java.util.Arrays.fill(coef, 0)
            val t = rd.decodeHuff(dc)
            if (t > 11) return None
            pred(c) += extend(rd.receive(t), t)
            coef(0) = pred(c) * q(0)
            var k = 1
            var done = false
            while (!done && k < 64) {
              val rs = rd.decodeHuff(ac)
              val r = rs >> 4; val size = rs & 0x0f
              if (size == 0) {
                if (r == 15) k += 16 else done = true // ZRL vs EOB
              } else {
                k += r
                if (k > 63) return None
                val nat = ZigZag(k)
                coef(nat) = extend(rd.receive(size), size) * q(nat)
                k += 1
              }
            }
            idctBlock(coef, samp)
            // place the 8x8 block into the component plane
            val ox = (mx * compH(c) + bx) * 8; val oy = (my * compV(c) + by) * 8
            var yy = 0
            while (yy < 8) {
              var xx = 0
              while (xx < 8) {
                planes(c)((oy + yy) * planeW(c) + ox + xx) = samp(yy * 8 + xx).toByte
                xx += 1
              }
              yy += 1
            }
            bx += 1
          }
          by += 1
        }
        s += 1
      }
      mcu += 1
    }

    if (nComp == 1) {
      val outPx = new Array[Byte](width * height)
      var y = 0
      while (y < height) {
        System.arraycopy(planes(0), y * planeW(0), outPx, y * width, width)
        y += 1
      }
      Some(JpegImage(width, height, 1, outPx))
    } else {
      // nearest (sample-replication) chroma upsampling + JFIF YCbCr->RGB
      val outPx = new Array[Byte](width * height * 3)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          def sampleOf(c: Int): Int = {
            val cx = x * compH(c) / hMax; val cy = y * compV(c) / vMax
            planes(c)(cy * planeW(c) + cx) & 0xff
          }
          val yy = sampleOf(0).toDouble
          val cb = sampleOf(1) - 128.0
          val cr = sampleOf(2) - 128.0
          val o = (y * width + x) * 3
          outPx(o) = clamp8(math.round(yy + 1.402 * cr).toInt)
          outPx(o + 1) = clamp8(math.round(yy - 0.344136 * cb - 0.714136 * cr).toInt)
          outPx(o + 2) = clamp8(math.round(yy + 1.772 * cb).toInt)
          x += 1
        }
        y += 1
      }
      Some(JpegImage(width, height, 3, outPx))
    }
  } catch { case NonFatal(_) => None }

  private def clamp8(v: Int): Byte =
    (if (v < 0) 0 else if (v > 255) 255 else v).toByte

  // ---- exact constant-block grayscale encoder ---- //

  // T.81 Annex K.3.3 typical luminance Huffman tables (public spec)
  private val DcLumBits = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcLumVals = (0 to 11).toArray
  private val AcLumBits = Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val AcLumVals: Array[Int] = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)

  /** symbol -> (code, length) from a BITS/HUFFVAL pair (canonical). */
  private def encTable(bits: Array[Int], vals: Array[Int]): Array[(Int, Int)] = {
    val out = new Array[(Int, Int)](256)
    var code = 0; var k = 0
    var l = 1
    while (l <= 16) {
      var i = 0
      while (i < bits(l - 1)) { out(vals(k)) = (code, l); code += 1; k += 1; i += 1 }
      code <<= 1
      l += 1
    }
    out
  }
  private lazy val DcEnc = encTable(DcLumBits, DcLumVals)
  private lazy val AcEnc = encTable(AcLumBits, AcLumVals)

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var buf = 0
    private var cnt = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        buf = (buf << 1) | ((code >> i) & 1)
        cnt += 1
        if (cnt == 8) {
          out.write(buf)
          if (buf == 0xff) out.write(0x00) // byte stuffing
          buf = 0; cnt = 0
        }
        i -= 1
      }
    }
    def flushWithOnes(): Unit =
      if (cnt > 0) { put((1 << (8 - cnt)) - 1, 8 - cnt) }
  }

  /** Grayscale baseline JPEG of `wBlocks`×`hBlocks` 8×8 blocks, block k
    * filled with the constant value `valueAt(k) & 0xff` (row-major).
    * All-ones quantization table ⇒ each block is DC-only and the
    * round trip is EXACT (see object doc). Dimensions are the block
    * grid ×8, so there is no partial-MCU edge to approximate.
    */
  def encodeGrayBlocks(wBlocks: Int, hBlocks: Int, valueAt: Int => Int): Array[Byte] = {
    require(wBlocks > 0 && hBlocks > 0 && wBlocks * 8 <= 65535 && hBlocks * 8 <= 65535,
      s"bad block grid ${wBlocks}x$hBlocks")
    val bos = new java.io.ByteArrayOutputStream()
    def marker(m: Int): Unit = { bos.write(0xff); bos.write(m) }
    def u16(v: Int): Unit = { bos.write((v >> 8) & 0xff); bos.write(v & 0xff) }
    marker(0xd8) // SOI
    marker(0xdb); u16(2 + 1 + 64); bos.write(0x00) // DQT, 8-bit, id 0
    var i = 0
    while (i < 64) { bos.write(1); i += 1 } // all-ones quantizer
    val w = wBlocks * 8; val h = hBlocks * 8
    marker(0xc0); u16(11); bos.write(8); u16(h); u16(w) // SOF0
    bos.write(1); bos.write(1); bos.write(0x11); bos.write(0) // 1 comp, 1x1, q0
    def dht(tc: Int, bits: Array[Int], vals: Array[Int]): Unit = {
      marker(0xc4); u16(2 + 1 + 16 + vals.length); bos.write((tc << 4) | 0)
      bits.foreach(bos.write); vals.foreach(bos.write)
    }
    dht(0, DcLumBits, DcLumVals)
    dht(1, AcLumBits, AcLumVals)
    marker(0xda); u16(8); bos.write(1); bos.write(1); bos.write(0x00) // SOS
    bos.write(0); bos.write(63); bos.write(0) // Ss/Se/AhAl
    val bw = new BitWriter(bos)
    var prevDc = 0
    var k = 0
    val n = wBlocks * hBlocks
    while (k < n) {
      val v = valueAt(k) & 0xff
      val dc = 8 * (v - 128) // S(0,0) of a constant block, quantizer 1
      var diff = dc - prevDc
      prevDc = dc
      val t = if (diff == 0) 0 else 32 - Integer.numberOfLeadingZeros(math.abs(diff))
      val (c0, l0) = DcEnc(t)
      bw.put(c0, l0)
      if (t > 0) {
        if (diff < 0) diff += (1 << t) - 1
        bw.put(diff, t)
      }
      val (c1, l1) = AcEnc(0x00) // EOB: all AC are zero
      bw.put(c1, l1)
      k += 1
    }
    bw.flushWithOnes()
    marker(0xd9) // EOI
    bos.toByteArray
  }
}
