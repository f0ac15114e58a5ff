package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnaryExpression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Shims
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the sketch-signature hot paths.
  *
  * The pure-`Column` versions of these (HOF `aggregate`/`zip_with`
  * pipelines) are interpreted — no whole-stage codegen, no CSE, heavy
  * boxing. Each expression here runs the whole per-row loop in one
  * compiled JVM method and participates in codegen via `doGenCode`
  * (a single static-shaped call on a referenced helper), which is the
  * preference order SURVEY.md §2.8 sets out: native Expression > UDF.
  *
  * Semantics are bit-identical to the Column versions they replace
  * (same xxhash64 seed 42, same (a·h+b) mod P permutations, same
  * sequential fold order), so fixture-pinned results are unchanged.
  */
object NativeHash {

  /** Hash assigned to a null array element. The shingle/token exprs here
    * never emit nulls, but these helpers are a public surface callable on
    * arbitrary array<string> columns — a null element hashes to this
    * sentinel instead of NPEing (mirrors array_distinct treating null as
    * one more value). Non-null inputs are bit-identical to before.
    */
  private val NullElementHash = 0x9E3779B97F4A7C15L

  // ---- minhash ----

  final class MinHashHelper(k: Int, seed: Long) extends Serializable {
    private val P = 4294967311L // prime > 2^32 (MinHashDedup.P)
    private val M31 = 1L << 31
    private val (as, bs) = {
      val rng = new scala.util.Random(seed)
      val aMax = (1L << 31) - 1
      val a = new Array[Long](k); val b = new Array[Long](k)
      var i = 0
      while (i < k) { a(i) = rng.nextLong().abs % aMax + 1; b(i) = rng.nextLong().abs % P; i += 1 }
      (a, b)
    }
    def compute(arr: ArrayData): ArrayData = {
      val sig = Array.fill(k)(Long.MaxValue)
      val n = arr.numElements()
      var i = 0
      while (i < n) {
        val s = arr.getUTF8String(i)
        val h0 = if (s == null) NullElementHash
          else XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        update(sig, h0)
        i += 1
      }
      new GenericArrayData(sig)
    }
    /** Same permutation family over PRE-HASHED shingles (array<long>,
      * e.g. shingle_hashes output) — skips the per-shingle string hash;
      * signature values differ from the string path (different h0) but
      * the minhash collision property is hash-family-independent.
      */
    def computeLongs(arr: ArrayData): ArrayData = {
      val sig = Array.fill(k)(Long.MaxValue)
      val n = arr.numElements()
      var i = 0
      while (i < n) { update(sig, arr.getLong(i)); i += 1 }
      new GenericArrayData(sig)
    }
    private def update(sig: Array[Long], h0: Long): Unit = {
      val h = ((h0 % M31) + M31) % M31
      var j = 0
      while (j < k) {
        val v = (h * as(j) + bs(j)) % P // operands positive: no pmod fixup needed
        if (v < sig(j)) sig(j) = v
        j += 1
      }
    }
  }

  case class MinHashSigExpr(child: Expression, numHashes: Int, seed: Long)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes = Seq(ArrayType(StringType))
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    @transient private lazy val helper = new MinHashHelper(numHashes, seed)
    override def nullSafeEval(input: Any): Any = helper.compute(input.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val h = ctx.addReferenceObj("minhashHelper", helper, classOf[MinHashHelper].getName)
      defineCodeGen(ctx, ev, c => s"$h.compute($c)")
    }
    override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
      copy(child = newChild)
    override def prettyName: String = "minhash_sig"
  }

  /** Fused signature + LSH banding: computes the k-wide minhash
    * signature and folds it into `bands` 64-bit band buckets in the
    * same compiled pass (bucket = polynomial hash of the band's
    * signature slice — equal slices ⇒ equal buckets, which is all LSH
    * banding needs). Saves a second interpreted pass over the signature
    * array per row.
    */
  final class MinHashBandsHelper(k: Int, bands: Int, seed: Long) extends Serializable {
    private val base = new MinHashHelper(k, seed)
    private val r = k / bands
    // An empty shingle set yields NO band buckets (empty array): an
    // empty doc can never be a near-dup, and emitting its (degenerate,
    // identical) buckets would pair every empty doc with every other.
    // Handling it here also lets callers drop their filter(size > 0) —
    // which the optimizer used to push below Par.widen's exchange,
    // re-evaluating the whole shingle expression on the narrow scan.
    def compute(arr: ArrayData): ArrayData =
      if (arr.numElements() == 0) new GenericArrayData(Array.emptyLongArray)
      else fold(base.compute(arr))
    def computeLongs(arr: ArrayData): ArrayData =
      if (arr.numElements() == 0) new GenericArrayData(Array.emptyLongArray)
      else fold(base.computeLongs(arr))
    private def fold(sig: ArrayData): ArrayData = {
      val out = new Array[Long](bands)
      var b = 0
      while (b < bands) {
        var h = 1125899906842597L + b // distinct seed per band position
        var j = b * r
        val end = j + r
        while (j < end) { h = h * 6364136223846793005L + sig.getLong(j); j += 1 }
        out(b) = h
        b += 1
      }
      new GenericArrayData(out)
    }
  }

  case class MinHashBandsExpr(child: Expression, numHashes: Int, numBands: Int, seed: Long)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes = Seq(ArrayType(StringType))
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    @transient private lazy val helper = new MinHashBandsHelper(numHashes, numBands, seed)
    override def nullSafeEval(input: Any): Any = helper.compute(input.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val h = ctx.addReferenceObj("minhashBandsHelper", helper, classOf[MinHashBandsHelper].getName)
      defineCodeGen(ctx, ev, c => s"$h.compute($c)")
    }
    override protected def withNewChildInternal(newChild: Expression): MinHashBandsExpr =
      copy(child = newChild)
    override def prettyName: String = "minhash_band_buckets"
  }

  /** Band buckets over PRE-HASHED shingles (shingle_hashes output) —
    * the string hash is already paid, so signature+banding is pure long
    * arithmetic per row.
    */
  case class MinHashBandsHashExpr(child: Expression, numHashes: Int, numBands: Int, seed: Long)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes = Seq(ArrayType(LongType))
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    @transient private lazy val helper = new MinHashBandsHelper(numHashes, numBands, seed)
    override def nullSafeEval(input: Any): Any = helper.computeLongs(input.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val h = ctx.addReferenceObj("minhashBandsHashHelper", helper, classOf[MinHashBandsHelper].getName)
      defineCodeGen(ctx, ev, c => s"$h.computeLongs($c)")
    }
    override protected def withNewChildInternal(newChild: Expression): MinHashBandsHashExpr =
      copy(child = newChild)
    override def prettyName: String = "minhash_band_buckets_hashed"
  }

  // ---- simhash ----

  final class SimHashHelper extends Serializable {
    def compute(arr: ArrayData): Long = {
      val votes = new Array[Int](64)
      val n = arr.numElements()
      var i = 0
      while (i < n) {
        val s = arr.getUTF8String(i)
        val h = if (s == null) NullElementHash
          else XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
        i += 1
      }
      var sig = 0L
      var b = 0
      while (b < 64) { if (votes(b) > 0) sig |= (1L << b); b += 1 }
      sig
    }
  }

  case class SimHash64Expr(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes = Seq(ArrayType(StringType))
    override def dataType: DataType = LongType
    @transient private lazy val helper = new SimHashHelper
    override def nullSafeEval(input: Any): Any = helper.compute(input.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val h = ctx.addReferenceObj("simhashHelper", helper, classOf[SimHashHelper].getName)
      defineCodeGen(ctx, ev, c => s"$h.compute($c)")
    }
    override protected def withNewChildInternal(newChild: Expression): SimHash64Expr =
      copy(child = newChild)
    override def prettyName: String = "simhash64"
  }

  // ---- SRP sign bits ----

  final class SrpHelper(dim: Int, nPlanes: Int, seed: Long) extends Serializable {
    // same seeded pool as the Column version (row-major, plane-by-plane)
    private val planes: Array[Array[Double]] = {
      val rng = new scala.util.Random(seed)
      Array.fill(nPlanes)(Array.fill(dim)(rng.nextGaussian()))
    }
    def compute(vec: ArrayData): ArrayData = {
      val v = new Array[Double](dim)
      val n = math.min(dim, vec.numElements())
      var i = 0
      while (i < n) { v(i) = vec.getFloat(i).toDouble; i += 1 }
      val bits = new Array[Long](nPlanes)
      var p = 0
      while (p < nPlanes) {
        val w = planes(p)
        var acc = 0.0
        var j = 0
        while (j < dim) { acc += v(j) * w(j); j += 1 }
        bits(p) = if (acc >= 0) 1L else 0L
        p += 1
      }
      new GenericArrayData(bits)
    }
  }

  case class SrpBitsExpr(child: Expression, dim: Int, nPlanes: Int, seed: Long)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes = Seq(ArrayType(FloatType))
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    @transient private lazy val helper = new SrpHelper(dim, nPlanes, seed)
    override def nullSafeEval(input: Any): Any = helper.compute(input.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val h = ctx.addReferenceObj("srpHelper", helper, classOf[SrpHelper].getName)
      defineCodeGen(ctx, ev, c => s"$h.compute($c)")
    }
    override protected def withNewChildInternal(newChild: Expression): SrpBitsExpr =
      copy(child = newChild)
    override def prettyName: String = "srp_bits"
  }

  // ---- SRP band buckets (fused bits + fold) ----

  /** L bucket ids of r bits each in ONE compiled pass over the plane
    * pool — same plane order and same bit-fold arithmetic as
    * srpBits + Vectors.srpFoldBuckets (bucket_t = Σ bit(t·r+i)·2^i), so
    * bucket VALUES are identical to that chain; this just removes the
    * intermediate bits array column and the interpreted fold.
    */
  final class SrpBucketsHelper(dim: Int, bitsPerTable: Int, tables: Int, seed: Long)
      extends Serializable {
    private val base = new SrpHelper(dim, bitsPerTable * tables, seed)
    def compute(vec: ArrayData): ArrayData = {
      val bits = base.compute(vec)
      val out = new Array[Long](tables)
      var t = 0
      while (t < tables) {
        var b = 0L
        var i = 0
        while (i < bitsPerTable) { b += bits.getLong(t * bitsPerTable + i) << i; i += 1 }
        out(t) = b
        t += 1
      }
      new GenericArrayData(out)
    }
  }

  case class SrpBucketsExpr(child: Expression, dim: Int, bitsPerTable: Int, tables: Int, seed: Long)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes = Seq(ArrayType(FloatType))
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    @transient private lazy val helper = new SrpBucketsHelper(dim, bitsPerTable, tables, seed)
    override def nullSafeEval(input: Any): Any = helper.compute(input.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val h = ctx.addReferenceObj("srpBucketsHelper", helper, classOf[SrpBucketsHelper].getName)
      defineCodeGen(ctx, ev, c => s"$h.compute($c)")
    }
    override protected def withNewChildInternal(newChild: Expression): SrpBucketsExpr =
      copy(child = newChild)
    override def prettyName: String = "srp_band_buckets"
  }

  // ---- cosine similarity ----

  /** Cosine of two float vectors in one fused loop (dot and both square
    * norms together, doubles, ascending index — the same sequential
    * summation order as the HOF `aggregate` formula and DuckDB's
    * list_cosine_similarity). 0.0 when either norm is 0.
    */
  final class CosineHelper extends Serializable {
    def compute(a: ArrayData, b: ArrayData): Double = {
      val n = math.min(a.numElements(), b.numElements())
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < n) {
        val x = a.getFloat(i).toDouble
        val y = b.getFloat(i).toDouble
        dot += x * y; na += x * x; nb += y * y
        i += 1
      }
      if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
    }
  }

  case class CosineExpr(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {
    override def inputTypes = Seq(ArrayType(FloatType), ArrayType(FloatType))
    override def dataType: DataType = DoubleType
    @transient private lazy val helper = new CosineHelper
    override def nullSafeEval(a: Any, b: Any): Any =
      helper.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val h = ctx.addReferenceObj("cosineHelper", helper, classOf[CosineHelper].getName)
      defineCodeGen(ctx, ev, (a, b) => s"$h.compute($a, $b)")
    }
    override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): CosineExpr =
      copy(left = newLeft, right = newRight)
    override def prettyName: String = "cosine_sim"
  }

  // ---- shingle hashes ----

  /** Distinct word-n-gram shingle hashes of a token array, SORTED
    * ascending: each token XXH64-hashed once, each n-window folded by
    * chaining (h = XXH64(tokHash_j, h)), result sorted + deduplicated in
    * place. Replaces the interpreted transform(concat_ws(slice…)) +
    * array_distinct + explode + xxhash64(string) pipeline — no shingle
    * strings are ever materialized. Hash VALUES differ from
    * xxhash64-of-the-shingle-string; the Jaccard operators rely only on
    * the equality structure (equal token windows ⇒ equal hash; distinct
    * windows collide at ~2⁻⁶⁴), so document frequencies, candidate sets,
    * intersection counts and Jaccard values are unchanged.
    */
  final class ShingleHashHelper(n: Int) extends Serializable {
    def compute(arr: ArrayData): ArrayData = {
      val m = arr.numElements()
      if (m < n) return new GenericArrayData(Array.emptyLongArray)
      val th = new Array[Long](m)
      var i = 0
      while (i < m) {
        val s = arr.getUTF8String(i)
        th(i) = if (s == null) NullElementHash
          else XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        i += 1
      }
      val cnt = m - n + 1
      val out = new Array[Long](cnt)
      i = 0
      while (i < cnt) {
        var h = 42L
        var j = i
        val end = i + n
        while (j < end) { h = XXH64.hashLong(th(j), h); j += 1 }
        out(i) = h
        i += 1
      }
      dedupeSorted(out)
    }
  }

  /** Distinct char-n-gram hashes (code-point windows — same boundaries
    * as `substr` on a UTF8String), sorted ascending. For short or
    * unsegmented text where word tokenization is meaningless.
    */
  final class CharShingleHashHelper(n: Int) extends Serializable {
    def compute(s: UTF8String): ArrayData = {
      val cps = s.toString.codePoints().toArray
      val m = cps.length
      if (m < n) return new GenericArrayData(Array.emptyLongArray)
      val cnt = m - n + 1
      val out = new Array[Long](cnt)
      var i = 0
      while (i < cnt) {
        var h = 42L
        var j = i
        val end = i + n
        while (j < end) { h = XXH64.hashLong(cps(j).toLong, h); j += 1 }
        out(i) = h
        i += 1
      }
      dedupeSorted(out)
    }
  }

  private def dedupeSorted(out: Array[Long]): ArrayData = {
    java.util.Arrays.sort(out)
    var w = 0
    var i = 0
    while (i < out.length) {
      if (i == 0 || out(i) != out(i - 1)) { out(w) = out(i); w += 1 }
      i += 1
    }
    new GenericArrayData(if (w == out.length) out else java.util.Arrays.copyOf(out, w))
  }

  case class ShingleHashExpr(child: Expression, n: Int)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes = Seq(ArrayType(StringType))
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    @transient private lazy val helper = new ShingleHashHelper(n)
    override def nullSafeEval(input: Any): Any = helper.compute(input.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val h = ctx.addReferenceObj("shingleHashHelper", helper, classOf[ShingleHashHelper].getName)
      defineCodeGen(ctx, ev, c => s"$h.compute($c)")
    }
    override protected def withNewChildInternal(newChild: Expression): ShingleHashExpr =
      copy(child = newChild)
    override def prettyName: String = "shingle_hashes"
  }

  case class CharShingleHashExpr(child: Expression, n: Int)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes = Seq(StringType)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    @transient private lazy val helper = new CharShingleHashHelper(n)
    override def nullSafeEval(input: Any): Any = helper.compute(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val h = ctx.addReferenceObj("charShingleHashHelper", helper, classOf[CharShingleHashHelper].getName)
      defineCodeGen(ctx, ev, c => s"$h.compute($c)")
    }
    override protected def withNewChildInternal(newChild: Expression): CharShingleHashExpr =
      copy(child = newChild)
    override def prettyName: String = "char_shingle_hashes"
  }

  /** Duplicate-n-gram ratio 1 − distinct/total over the token windows,
    * fused into one compiled pass (the HOF formulation materializes the
    * n-gram *strings* twice — once for size, once for array_distinct —
    * both interpreted). Distinctness is judged on the same xxhash64
    * window hashes as `shingle_hashes` (collision ~2⁻⁶⁴, preserves
    * counts).
    */
  final class ShingleDupRatioHelper(n: Int) extends Serializable {
    def compute(arr: ArrayData): Double = {
      val m = arr.numElements()
      if (m < n) return 0.0
      val th = new Array[Long](m)
      var i = 0
      while (i < m) {
        val s = arr.getUTF8String(i)
        th(i) = if (s == null) NullElementHash
          else XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        i += 1
      }
      val cnt = m - n + 1
      val out = new Array[Long](cnt)
      i = 0
      while (i < cnt) {
        var h = 42L
        var j = i
        val end = i + n
        while (j < end) { h = XXH64.hashLong(th(j), h); j += 1 }
        out(i) = h
        i += 1
      }
      java.util.Arrays.sort(out)
      var distinct = 0
      i = 0
      while (i < cnt) {
        if (i == 0 || out(i) != out(i - 1)) distinct += 1
        i += 1
      }
      1.0 - distinct.toDouble / cnt.toDouble
    }
  }

  case class ShingleDupRatioExpr(child: Expression, n: Int)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes = Seq(ArrayType(StringType))
    override def dataType: DataType = DoubleType
    @transient private lazy val helper = new ShingleDupRatioHelper(n)
    override def nullSafeEval(input: Any): Any = helper.compute(input.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val h = ctx.addReferenceObj("shingleDupRatioHelper", helper, classOf[ShingleDupRatioHelper].getName)
      defineCodeGen(ctx, ev, c => s"$h.compute($c)")
    }
    override protected def withNewChildInternal(newChild: Expression): ShingleDupRatioExpr =
      copy(child = newChild)
    override def prettyName: String = "shingle_dup_ratio"
  }

  // ---- portable md5-derived hashes ----

  /** The engine-portable md5-derived hash family, compiled. The Column
    * formulations ([[graft.operators.SimHashDedup.portableTokenHash]] /
    * `portableSimhash`) split the md5 hex string and fold it with
    * interpreted higher-order `aggregate` — correct but ~50× the CPU
    * (the round-7 `dedup_simhash` gate spent 319 s there at sf0.1).
    * Key identity this relies on: the base-16 fold of the first 15 hex
    * chars of an md5 IS the big-endian u64 of the digest's first 8
    * bytes shifted right 4 (15 nibbles = top 60 bits), so one digest
    * yields the fold without ever printing hex. Bit-identical to the
    * Column versions and to the DuckDB `fold60Sql` twin.
    *
    * One MessageDigest per thread: the helper is shared by every task
    * the generated code runs in this JVM, and MessageDigest is stateful.
    */
  final class PortableHashHelper extends Serializable {
    @transient private lazy val mdTL =
      ThreadLocal.withInitial[java.security.MessageDigest](() =>
        java.security.MessageDigest.getInstance("MD5"))
    /** Big-endian u64 of md5's first 8 bytes — the numeric value of the
      * 16-hex-char prefix (`substr(md5(x),1,16)`) under unsigned
      * comparison, which is how the winnowing sort keys compare.
      */
    def md5Prefix64(bytes: Array[Byte], off: Int, len: Int): Long = {
      val md = mdTL.get(); md.reset()
      md.update(bytes, off, len)
      val d = md.digest()
      var v = 0L
      var i = 0
      while (i < 8) { v = (v << 8) | (d(i) & 0xFFL); i += 1 }
      v
    }
    /** 60-bit fold: first 15 hex chars of md5 as base-16 (non-negative). */
    def fold60(s: UTF8String): Long = {
      val b = s.getBytes
      md5Prefix64(b, 0, b.length) >>> 4
    }
    /** Charikar simhash over the 60-bit portable token hashes, one
      * compiled pass: per-bit votes, bit set iff votes > 0. A null
      * token votes −1 on every bit (what the Column `when` chain does).
      */
    def simhash60(arr: ArrayData): Long = {
      val votes = new Array[Int](60)
      val n = arr.numElements()
      var i = 0
      while (i < n) {
        val s = arr.getUTF8String(i)
        if (s == null) {
          var b = 0
          while (b < 60) { votes(b) -= 1; b += 1 }
        } else {
          val h = fold60(s)
          var b = 0
          while (b < 60) {
            if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
            b += 1
          }
        }
        i += 1
      }
      var sig = 0L
      var b = 0
      while (b < 60) { if (votes(b) > 0) sig |= (1L << b); b += 1 }
      sig
    }
  }

  case class Fold60Expr(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes = Seq(StringType)
    override def dataType: DataType = LongType
    @transient private lazy val helper = new PortableHashHelper
    override def nullSafeEval(input: Any): Any =
      helper.fold60(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val h = ctx.addReferenceObj("portableHashHelper", helper, classOf[PortableHashHelper].getName)
      defineCodeGen(ctx, ev, c => s"$h.fold60($c)")
    }
    override protected def withNewChildInternal(newChild: Expression): Fold60Expr =
      copy(child = newChild)
    override def prettyName: String = "md5_fold60"
  }

  case class PortableSimHash60Expr(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes = Seq(ArrayType(StringType))
    override def dataType: DataType = LongType
    @transient private lazy val helper = new PortableHashHelper
    override def nullSafeEval(input: Any): Any =
      helper.simhash60(input.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val h = ctx.addReferenceObj("portableHashHelper", helper, classOf[PortableHashHelper].getName)
      defineCodeGen(ctx, ev, c => s"$h.simhash60($c)")
    }
    override protected def withNewChildInternal(newChild: Expression): PortableSimHash60Expr =
      copy(child = newChild)
    override def prettyName: String = "portable_simhash60"
  }

  // ---- substring-window selection (SubstringDedup hot path) ----

  /** Content-keyed selection of fixed-length character windows, one
    * compiled pass per document. Replaces the interpreted HOF
    * formulations in [[graft.operators.SubstringDedup]] (per-position
    * string materialization + `array_min(slice(...))` cost the round-7
    * `dedup_winnow` gate 73.7 s at sf0.1). Returns the 1-based window
    * start positions, distinct and ascending — hashing of the selected
    * (few) windows stays in Column land.
    *
    * Windows are code-point windows (the boundaries `substr`/`length`
    * use on both engines), hashed over their UTF-8 bytes — identical
    * bytes to `md5(substr(text, i, w))` / `xxhash64(substr(...))`.
    * Selection keys compare exactly like the Column/SQL string keys
    * they replace: the 16-hex-char md5 prefix (resp. zero-padded
    * `hex(xxhash64)`) orders as the unsigned 64-bit hash value, and the
    * appended `1e9 − pos` tie-break means equal hashes pick the
    * RIGHTMOST position ("robust winnowing").
    */
  final class SubstringSelectHelper(window: Int, portable: Boolean) extends Serializable {
    private val ph = new PortableHashHelper

    /** Start byte offset of every code point, plus an end sentinel. */
    private def cpOffsets(b: Array[Byte]): Array[Int] = {
      var n = 0
      var i = 0
      while (i < b.length) { if ((b(i) & 0xC0) != 0x80) n += 1; i += 1 }
      val off = new Array[Int](n + 1)
      var w = 0
      i = 0
      while (i < b.length) { if ((b(i) & 0xC0) != 0x80) { off(w) = i; w += 1 }; i += 1 }
      off(n) = b.length
      off
    }

    private def hashAt(bytes: Array[Byte], off: Array[Int], i: Int): Long = {
      val s = off(i); val e = off(i + window)
      if (portable) ph.md5Prefix64(bytes, s, e - s)
      else XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET + s, e - s, 42L)
    }

    /** Positions whose window hash ≡ 0 (mod sampleMod) — the
      * content-defined-chunking anchor rule. Portable selection uses the
      * 60-bit fold (non-negative); native uses `pmod(xxhash64, m) = 0`,
      * which holds iff the signed remainder is 0.
      */
    def contentMod(s: UTF8String, sampleMod: Int): ArrayData = {
      val bytes = s.getBytes
      val off = cpOffsets(bytes)
      val n = off.length - 1
      if (n < window) return new GenericArrayData(Array.emptyLongArray)
      val cnt = n - window + 1
      val out = new Array[Long](cnt)
      var w = 0
      var i = 0
      while (i < cnt) {
        val h = hashAt(bytes, off, i)
        val hv = if (portable) h >>> 4 else h
        if (hv % sampleMod == 0) { out(w) = (i + 1).toLong; w += 1 }
        i += 1
      }
      new GenericArrayData(if (w == cnt) out else java.util.Arrays.copyOf(out, w))
    }

    /** Winnowing selection: the rightmost minimal hash of every
      * guard-length (end-clipped) run of consecutive windows — a
      * monotone-deque sliding minimum, O(n) total instead of the
      * O(n·guard) string comparisons of the slice formulation. Equal
      * hashes evict earlier positions, so ties keep the rightmost —
      * exactly the `min(hex ‖ pad(1e9−pos))` order. Emitted picks are
      * non-decreasing, so consecutive-dedupe = distinct.
      */
    def winnow(s: UTF8String, guard: Int): ArrayData = {
      val bytes = s.getBytes
      val off = cpOffsets(bytes)
      val n = off.length - 1
      if (n < window) return new GenericArrayData(Array.emptyLongArray)
      val cnt = n - window + 1
      val keys = new Array[Long](cnt)
      var i = 0
      while (i < cnt) { keys(i) = hashAt(bytes, off, i); i += 1 }
      val q = new Array[Int](cnt) // deque of candidate indices, front = current min
      var qh = 0; var qt = 0
      val out = new Array[Long](cnt)
      var w = 0; var last = -1
      val emitFrom = math.min(guard - 1, cnt - 1) // short docs: one clipped run
      var r = 0
      while (r < cnt) {
        while (qt > qh && java.lang.Long.compareUnsigned(keys(q(qt - 1)), keys(r)) >= 0) qt -= 1
        q(qt) = r; qt += 1
        if (r >= emitFrom) {
          val j0 = math.max(r - guard + 1, 0)
          while (q(qh) < j0) qh += 1
          val p = q(qh)
          if (p != last) { out(w) = (p + 1).toLong; w += 1; last = p }
        }
        r += 1
      }
      new GenericArrayData(java.util.Arrays.copyOf(out, w))
    }
  }

  case class ContentModPositionsExpr(
      child: Expression, window: Int, sampleMod: Int, portable: Boolean)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes = Seq(StringType)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    @transient private lazy val helper = new SubstringSelectHelper(window, portable)
    override def nullSafeEval(input: Any): Any =
      helper.contentMod(input.asInstanceOf[UTF8String], sampleMod)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val h = ctx.addReferenceObj("substringSelectHelper", helper, classOf[SubstringSelectHelper].getName)
      defineCodeGen(ctx, ev, c => s"$h.contentMod($c, $sampleMod)")
    }
    override protected def withNewChildInternal(newChild: Expression): ContentModPositionsExpr =
      copy(child = newChild)
    override def prettyName: String = "content_mod_positions"
  }

  case class WinnowPositionsExpr(
      child: Expression, window: Int, guard: Int, portable: Boolean)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes = Seq(StringType)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    @transient private lazy val helper = new SubstringSelectHelper(window, portable)
    override def nullSafeEval(input: Any): Any =
      helper.winnow(input.asInstanceOf[UTF8String], guard)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val h = ctx.addReferenceObj("substringSelectHelper", helper, classOf[SubstringSelectHelper].getName)
      defineCodeGen(ctx, ev, c => s"$h.winnow($c, $guard)")
    }
    override protected def withNewChildInternal(newChild: Expression): WinnowPositionsExpr =
      copy(child = newChild)
    override def prettyName: String = "winnow_positions"
  }

  // ---- decimal-exact centroid assignment (Embeddings hot path) ----

  /** Compiled twin of [[graft.operators.Embeddings.assignExact]]: the
    * nearest-centroid argmin whose squared distance is accumulated in
    * decimal(28,18) so the result is partition-order-free and
    * reproducible on any engine. The Column formulation is a per-centroid
    * interpreted HOF fold (k·dim boxed decimal ops per row); this runs
    * the whole argmin in one compiled loop over primitive doubles with
    * java.math.BigDecimal accumulation — SAME numbers:
    *  - per element, `(x−c)²` in IEEE double, then
    *    `BigDecimal.valueOf(sq).setScale(18, HALF_UP)` — exactly Spark's
    *    double→decimal(28,18) cast (valueOf is the shortest-repr string
    *    path scala.math.BigDecimal uses; setScale is changePrecision's
    *    HALF_UP);
    *  - running sum at scale 18; any step whose precision exceeds 28
    *    (Spark: cast-back overflow → null → raise_error) throws the
    *    same overflow error the Column version raises;
    *  - argmin by (sum, cid) — the struct array_min tie-break (equal
    *    distances pick the smallest centroid id).
    * Null elements, NaN/infinite squares, and length mismatches all
    * throw (the Column version nulls the fold, and its coalesce guard
    * turns that into raise_error).
    */
  final class AssignExactHelper(centroids: Array[(Int, Array[Double])]) extends Serializable {
    require(centroids.nonEmpty, "assignExact: empty centroid set")
    private val HALF_UP = java.math.RoundingMode.HALF_UP

    /** Argmin over exact decimal(28,18) distance sums — but the exact
      * fold is ~70 BigDecimal allocations per (row, centroid, dim) and
      * was THE hot loop of the semantic-dedup rows (measured: two
      * assignment passes × k≈√n centroids × dim ≈ 45M BigDecimal ops
      * per gate query). A plain double fold of the same squared terms
      * brackets the decimal sum provably:
      *
      *   S = Σ dec18(sq_i),  |dec18(sq_i) − sq_i| ≤ 0.5e-18 each, and
      *   the double fold of 2n non-negative-term ops has relative error
      *   < 2n·2⁻⁵³·1.01 — so |S − sumD| ≤ sumD·(1e-15·n + 1e-12)
      *   + n·1e-18 =: err (the coded bound is ~100× looser than the
      *   analytic one on every term, so fp slop cannot invalidate it).
      *
      * A centroid whose LOWER bound (sumD − err) exceeds the smallest
      * UPPER bound (min over candidates of sumD + err) can neither win
      * nor tie the exact argmin, so only the candidates inside the
      * bracket pay the decimal fold — on real embeddings (inter-cluster
      * gaps ≫ 1e-10) that is one fold per row instead of k. Exactness
      * is unconditional: survivors are compared by the UNCHANGED exact
      * fold in the UNCHANGED (sum, cid) order, and excluded centroids
      * provably compare strictly greater. Failure semantics are
      * preserved: the double pass performs the same per-centroid
      * length/null/finite checks in the same centroid order, and any
      * term or sum near the decimal(28,18) precision wall (≥ 1e9 —
      * orders of magnitude above any real embedding distance) disables
      * pruning for that centroid so the exact fold's own precision
      * checks fire exactly as before. NativeHashSpec pins the compiled
      * helper equal to the interpreted full-fold Column reference,
      * ties and near-ties included.
      */
    def assign(vec: ArrayData): Int = {
      val n = vec.numElements()
      val k = centroids.length
      val sums = new Array[Double](k)
      var noPrune = false
      var ci = 0
      while (ci < k) {
        val (cid, c) = centroids(ci)
        if (c.length != n) fail(cid)
        var sumD = 0.0
        var i = 0
        while (i < n) {
          if (vec.isNullAt(i)) fail(cid)
          val diff = vec.getDouble(i) - c(i)
          val sq = diff * diff
          if (!java.lang.Double.isFinite(sq)) fail(cid)
          if (sq >= 1e9) noPrune = true
          sumD += sq
          i += 1
        }
        if (sumD >= 1e9) noPrune = true
        sums(ci) = sumD
        ci += 1
      }
      // smallest upper bound over all centroids
      var minUpper = java.lang.Double.MAX_VALUE
      ci = 0
      while (ci < k) {
        val up = sums(ci) + err(sums(ci), n)
        if (up < minUpper) minUpper = up
        ci += 1
      }
      var best: java.math.BigDecimal = null
      var bestCid = 0
      ci = 0
      while (ci < k) {
        val (cid, c) = centroids(ci)
        if (noPrune || sums(ci) - err(sums(ci), n) <= minUpper) {
          val sum = exactSum(vec, c, cid, n)
          if (best == null || {
            val cmp = sum.compareTo(best)
            cmp < 0 || (cmp == 0 && cid < bestCid)
          }) { best = sum; bestCid = cid }
        }
        ci += 1
      }
      bestCid
    }

    @inline private def err(sumD: Double, n: Int): Double =
      (1e-15 * n + 1e-12) * (sumD + 1.0) + n * 1e-18

    private def exactSum(
        vec: ArrayData, c: Array[Double], cid: Int, n: Int): java.math.BigDecimal = {
      var sum = java.math.BigDecimal.ZERO.setScale(18)
      var i = 0
      while (i < n) {
        val diff = vec.getDouble(i) - c(i)
        val sq = diff * diff
        val d = java.math.BigDecimal.valueOf(sq).setScale(18, HALF_UP)
        if (d.precision > 28) fail(cid)
        sum = sum.add(d)
        if (sum.precision > 28) fail(cid)
        i += 1
      }
      sum
    }

    private def fail(cid: Int): Nothing = throw new IllegalStateException(
      s"assignExact: null squared distance to cluster $cid — decimal(28,18) " +
        "overflow (squared distance must stay < 1e10) or null vector/element")
  }

  case class AssignExactExpr(child: Expression, centroids: Array[(Int, Array[Double])])
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes = Seq(ArrayType(DoubleType))
    override def dataType: DataType = IntegerType
    @transient private lazy val helper = new AssignExactHelper(centroids)
    override def nullSafeEval(input: Any): Any =
      helper.assign(input.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val h = ctx.addReferenceObj("assignExactHelper", helper, classOf[AssignExactHelper].getName)
      defineCodeGen(ctx, ev, c => s"$h.assign($c)")
    }
    override protected def withNewChildInternal(newChild: Expression): AssignExactExpr =
      copy(child = newChild)
    override def prettyName: String = "assign_exact"
  }

  // ---- sorted intersection count ----

  /** |a ∩ b| for two SORTED long arrays by a single merge walk — zero
    * allocation, no per-row hash set (array_intersect builds one), the
    * exact-verify inner loop of the Jaccard near-dup operators.
    */
  final class SortedIntersectHelper extends Serializable {
    def count(a: ArrayData, b: ArrayData): Int = {
      val na = a.numElements()
      val nb = b.numElements()
      var i = 0; var j = 0; var c = 0
      while (i < na && j < nb) {
        val x = a.getLong(i)
        val y = b.getLong(j)
        if (x == y) { c += 1; i += 1; j += 1 }
        else if (x < y) i += 1
        else j += 1
      }
      c
    }

    /** Early-exit variant for threshold verifies: the exact |A∩B| when
      * it reaches `alpha`, else -1 — bailing as soon as
      * c + min(remaining_a, remaining_b) < alpha. On candidate streams
      * that are overwhelmingly false (the PPJoin regime on low-diversity
      * corpora) most walks exit in the first few steps instead of
      * scanning both arrays. A match leaves the bound unchanged
      * (c+1, remaining−1), so the bound is only re-checked on the
      * advance-without-match branches.
      */
    def countAtLeast(a: ArrayData, b: ArrayData, alpha: Int): Int = {
      val na = a.numElements()
      val nb = b.numElements()
      if (math.min(na, nb) < alpha) return -1
      var i = 0; var j = 0; var c = 0
      while (i < na && j < nb) {
        val x = a.getLong(i)
        val y = b.getLong(j)
        if (x == y) { c += 1; i += 1; j += 1 }
        else {
          if (x < y) i += 1 else j += 1
          if (c + math.min(na - i, nb - j) < alpha) return -1
        }
      }
      if (c >= alpha) c else -1
    }
  }

  case class SortedIntersectCountExpr(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {
    override def inputTypes = Seq(ArrayType(LongType), ArrayType(LongType))
    override def dataType: DataType = IntegerType
    @transient private lazy val helper = new SortedIntersectHelper
    override def nullSafeEval(a: Any, b: Any): Any =
      helper.count(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val h = ctx.addReferenceObj("sortedIntersectHelper", helper, classOf[SortedIntersectHelper].getName)
      defineCodeGen(ctx, ev, (a, b) => s"$h.count($a, $b)")
    }
    override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): SortedIntersectCountExpr =
      copy(left = newLeft, right = newRight)
    override def prettyName: String = "sorted_intersect_count"
  }

  /** `sorted_intersect_at_least(a, b, alpha)`: exact intersection count
    * when ≥ alpha, else -1 via the early-exit walk — the verify-stage
    * workhorse for threshold joins (see SortedIntersectHelper
    * .countAtLeast for the bail condition's exactness argument).
    */
  /** Merge-walk algebra over sorted-distinct long arrays backing the
    * DIFF-BASED member verify (ClusterDedup / OverlapJoin step 5): a
    * member x of cluster C is carried as edit-sized diffs against C's
    * anchor set H — dM = H \ S_x (what x is missing), dP = S_x \ H
    * (what x adds) — and a member pair's exact intersection is
    * reconstructed from the anchor-pair walk plus these small-array
    * terms:
    *
    *   |S_x ∩ S_y| = |H_A∩H_B|                       (the prune's walk)
    *               + (|dPx∩H_B| − |dMx∩H_B|)         (adjust, side A)
    *               + (|dPy∩H_A| − |dMy∩H_A|)         (adjust, side B)
    *               + |dMx∩dMy| − |dPx∩dMy|
    *               − |dPy∩dMx| + |dPx∩dPy|           (correction)
    *
    * Proof: write S_x = (H_A \ dMx) ⊎ dPx and S_y likewise; S_x∩S_y
    * splits into four disjoint pieces — (H_A∩H_B) \ (dMx∪dMy),
    * dPy ∩ (H_A\dMx), dPx ∩ (H_B\dMy), dPx∩dPy — and
    * inclusion-exclusion over the first (dMx ⊆ H_A, dMy ⊆ H_B, so
    * dMx∩dMy ⊆ H_A∩H_B) gives exactly the terms above. Every term is
    * an exact set cardinality, so the assembled count is the same
    * integer the direct full-array walk returns. The point at scale:
    * the member-pair join ships and walks only edit-sized diffs — the
    * anchor-sized work happens once per (member, opposite cluster),
    * never per member pair.
    */
  final class SortedDiffHelper extends Serializable {
    /** Elements of `a` not present in `b` (both sorted distinct) — the
      * output stays sorted distinct.
      */
    def diff(a: ArrayData, b: ArrayData): ArrayData = {
      val na = a.numElements(); val nb = b.numElements()
      val out = new Array[Long](na)
      var i = 0; var j = 0; var o = 0
      while (i < na && j < nb) {
        val x = a.getLong(i); val y = b.getLong(j)
        if (x == y) { i += 1; j += 1 }
        else if (x < y) { out(o) = x; o += 1; i += 1 }
        else j += 1
      }
      while (i < na) { out(o) = a.getLong(i); o += 1; i += 1 }
      new GenericArrayData(if (o == na) out else java.util.Arrays.copyOf(out, o))
    }
    private def count(a: ArrayData, b: ArrayData): Int = {
      val na = a.numElements(); val nb = b.numElements()
      var i = 0; var j = 0; var c = 0
      while (i < na && j < nb) {
        val x = a.getLong(i); val y = b.getLong(j)
        if (x == y) { c += 1; i += 1; j += 1 }
        else if (x < y) i += 1
        else j += 1
      }
      c
    }
    /** |dP ∩ h| − |dM ∩ h|: the side's exact contribution relative to
      * its own anchor's walk against `h` (the OPPOSITE cluster's
      * anchor). dM/dP are edit-sized, so both walks are bounded by
      * |h| + |diff|.
      */
    def anchorAdjust(dM: ArrayData, dP: ArrayData, h: ArrayData): Int =
      count(dP, h) - count(dM, h)
    /** |daM∩dbM| − |daP∩dbM| − |dbP∩daM| + |daP∩dbP| — the per-pair
      * term; all four walks are over edit-sized arrays.
      */
    def correction(daM: ArrayData, daP: ArrayData,
        dbM: ArrayData, dbP: ArrayData): Int =
      count(daM, dbM) - count(daP, dbM) - count(dbP, daM) + count(daP, dbP)
  }

  /** `sorted_diff(a, b)`: sorted elements of a absent from b. */
  case class SortedDiffExpr(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {
    override def inputTypes = Seq(ArrayType(LongType), ArrayType(LongType))
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    @transient private lazy val helper = new SortedDiffHelper
    override def nullSafeEval(a: Any, b: Any): Any =
      helper.diff(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val h = ctx.addReferenceObj("sortedDiffHelper", helper, classOf[SortedDiffHelper].getName)
      defineCodeGen(ctx, ev, (a, b) => s"$h.diff($a, $b)")
    }
    override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): SortedDiffExpr =
      copy(left = newLeft, right = newRight)
    override def prettyName: String = "sorted_diff"
  }

  /** `anchor_adjust(dM, dP, h)` = |dP∩h| − |dM∩h| (see SortedDiffHelper). */
  case class AnchorAdjustExpr(first: Expression, second: Expression,
      third: Expression) extends TernaryExpression with ExpectsInputTypes {
    override def inputTypes = Seq(ArrayType(LongType), ArrayType(LongType), ArrayType(LongType))
    override def dataType: DataType = IntegerType
    @transient private lazy val helper = new SortedDiffHelper
    override def nullSafeEval(dm: Any, dp: Any, h: Any): Any =
      helper.anchorAdjust(dm.asInstanceOf[ArrayData], dp.asInstanceOf[ArrayData],
        h.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val h = ctx.addReferenceObj("sortedDiffHelper", helper, classOf[SortedDiffHelper].getName)
      defineCodeGen(ctx, ev, (a, b, c) => s"$h.anchorAdjust($a, $b, $c)")
    }
    override protected def withNewChildrenInternal(newFirst: Expression,
        newSecond: Expression, newThird: Expression): AnchorAdjustExpr =
      copy(first = newFirst, second = newSecond, third = newThird)
    override def prettyName: String = "anchor_adjust"
  }

  /** `diff_correction(daM, daP, dbM, dbP)` — the per-pair term of the
    * diff-based verify (see SortedDiffHelper).
    */
  case class DiffCorrectionExpr(first: Expression, second: Expression,
      third: Expression, fourth: Expression)
      extends org.apache.spark.sql.catalyst.expressions.QuaternaryExpression
      with ExpectsInputTypes {
    override def inputTypes = Seq(ArrayType(LongType), ArrayType(LongType),
      ArrayType(LongType), ArrayType(LongType))
    override def dataType: DataType = IntegerType
    @transient private lazy val helper = new SortedDiffHelper
    override def nullSafeEval(daM: Any, daP: Any, dbM: Any, dbP: Any): Any =
      helper.correction(daM.asInstanceOf[ArrayData], daP.asInstanceOf[ArrayData],
        dbM.asInstanceOf[ArrayData], dbP.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val h = ctx.addReferenceObj("sortedDiffHelper", helper, classOf[SortedDiffHelper].getName)
      defineCodeGen(ctx, ev, (a, b, c, d) => s"$h.correction($a, $b, $c, $d)")
    }
    override protected def withNewChildrenInternal(newFirst: Expression,
        newSecond: Expression, newThird: Expression, newFourth: Expression): DiffCorrectionExpr =
      copy(first = newFirst, second = newSecond, third = newThird, fourth = newFourth)
    override def prettyName: String = "diff_correction"
  }

  case class SortedIntersectAtLeastExpr(first: Expression, second: Expression,
      third: Expression) extends TernaryExpression with ExpectsInputTypes {
    override def inputTypes = Seq(ArrayType(LongType), ArrayType(LongType), IntegerType)
    override def dataType: DataType = IntegerType
    @transient private lazy val helper = new SortedIntersectHelper
    override def nullSafeEval(a: Any, b: Any, alpha: Any): Any =
      helper.countAtLeast(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
        alpha.asInstanceOf[Int])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val h = ctx.addReferenceObj("sortedIntersectHelper", helper, classOf[SortedIntersectHelper].getName)
      defineCodeGen(ctx, ev, (a, b, al) => s"$h.countAtLeast($a, $b, $al)")
    }
    override protected def withNewChildrenInternal(newFirst: Expression,
        newSecond: Expression, newThird: Expression): SortedIntersectAtLeastExpr =
      copy(first = newFirst, second = newSecond, third = newThird)
    override def prettyName: String = "sorted_intersect_at_least"
  }

  // ---- Column wrappers ----

  def minhashSig(arr: Column, numHashes: Int = 64, seed: Long = 42L): Column =
    Shims.column(MinHashSigExpr(Shims.expression(arr), numHashes, seed))

  def minhashBandBuckets(arr: Column, numHashes: Int, numBands: Int, seed: Long = 42L): Column =
    Shims.column(MinHashBandsExpr(Shims.expression(arr), numHashes, numBands, seed))

  def minhashBandBucketsHashed(arr: Column, numHashes: Int, numBands: Int, seed: Long = 42L): Column =
    Shims.column(MinHashBandsHashExpr(Shims.expression(arr), numHashes, numBands, seed))

  def simhash64(tokens: Column): Column =
    Shims.column(SimHash64Expr(Shims.expression(tokens)))

  def srpBits(vec: Column, dim: Int, nPlanes: Int, seed: Long = 42L): Column =
    Shims.column(SrpBitsExpr(Shims.expression(vec), dim, nPlanes, seed))

  def srpBuckets(vec: Column, dim: Int, bitsPerTable: Int, tables: Int, seed: Long = 42L): Column =
    Shims.column(SrpBucketsExpr(Shims.expression(vec), dim, bitsPerTable, tables, seed))

  def cosine(a: Column, b: Column): Column =
    Shims.column(CosineExpr(Shims.expression(a), Shims.expression(b)))

  def shingleHashes(tokens: Column, n: Int): Column =
    Shims.column(ShingleHashExpr(Shims.expression(tokens), n))

  def charShingleHashes(text: Column, n: Int): Column =
    Shims.column(CharShingleHashExpr(Shims.expression(text), n))

  def sortedIntersectCount(a: Column, b: Column): Column =
    Shims.column(SortedIntersectCountExpr(Shims.expression(a), Shims.expression(b)))

  def sortedIntersectAtLeast(a: Column, b: Column, alpha: Column): Column =
    Shims.column(SortedIntersectAtLeastExpr(
      Shims.expression(a), Shims.expression(b), Shims.expression(alpha)))

  def sortedDiff(a: Column, b: Column): Column =
    Shims.column(SortedDiffExpr(Shims.expression(a), Shims.expression(b)))

  def anchorAdjust(dM: Column, dP: Column, h: Column): Column =
    Shims.column(AnchorAdjustExpr(
      Shims.expression(dM), Shims.expression(dP), Shims.expression(h)))

  def diffCorrection(daM: Column, daP: Column, dbM: Column, dbP: Column): Column =
    Shims.column(DiffCorrectionExpr(Shims.expression(daM), Shims.expression(daP),
      Shims.expression(dbM), Shims.expression(dbP)))

  def shingleDupRatio(tokens: Column, n: Int): Column =
    Shims.column(ShingleDupRatioExpr(Shims.expression(tokens), n))

  def fold60(s: Column): Column =
    Shims.column(Fold60Expr(Shims.expression(s)))

  def portableSimhash60(tokens: Column): Column =
    Shims.column(PortableSimHash60Expr(Shims.expression(tokens)))

  def contentModPositions(text: Column, window: Int, sampleMod: Int, portable: Boolean): Column =
    Shims.column(ContentModPositionsExpr(Shims.expression(text), window, sampleMod, portable))

  def assignExact(vec: Column, centroids: Seq[(Int, Array[Double])]): Column =
    Shims.column(AssignExactExpr(Shims.expression(vec), centroids.toArray))

  def winnowPositions(text: Column, window: Int, guard: Int, portable: Boolean): Column =
    Shims.column(WinnowPositionsExpr(Shims.expression(text), window, guard, portable))
}
