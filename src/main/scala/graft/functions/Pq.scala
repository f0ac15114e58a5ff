package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Shims
import org.apache.spark.sql.types._

/** Product-quantization codec as native Catalyst expressions.
  *
  * PQ (Jégou et al., "Product Quantization for Nearest Neighbor
  * Search", TPAMI 2011) splits a d-dim vector into m subvectors and
  * quantizes each against its own small codebook: a 64-float vector
  * (256 B) becomes m small codes (m bytes at 256 centroids) — a 16-64×
  * compression that is what lets a 100 TB embedding corpus be scanned
  * from memory. Scoring against a query uses the ADC lookup trick: the
  * query's dot product with every sub-centroid is precomputed once
  * (m·k entries), so scoring one corpus vector is m table lookups
  * instead of d multiplies.
  *
  * Both steps run as codegen'd expressions over the corpus; the
  * codebook (m·k·(d/m) floats — tens of KB) rides along as a
  * referenced object like the other NativeHash helpers.
  */
object Pq {

  /** Shared codec state: `cb(s)(c)` = centroid c of subspace s. */
  final class PqHelper(val cb: Array[Array[Array[Float]]]) extends Serializable {
    val m: Int = cb.length
    val kc: Int = cb(0).length
    val subdim: Int = cb(0)(0).length
    /** Flattened squared norms of every sub-centroid: the reconstructed
      * vector's norm ‖x̂‖² = Σ_s ‖c_{s,code_s}‖² needed for cosine.
      */
    val norms2: Array[Double] = {
      val out = new Array[Double](m * kc)
      var s = 0
      while (s < m) {
        var c = 0
        while (c < kc) {
          val cent = cb(s)(c); var d = 0.0; var i = 0
          while (i < cent.length) { d += cent(i).toDouble * cent(i); i += 1 }
          out(s * kc + c) = d; c += 1
        }
        s += 1
      }
      out
    }

    def encode(arr: ArrayData): ArrayData = {
      val v = arr.toFloatArray()
      val codes = new Array[Int](m)
      var s = 0
      while (s < m) {
        val base = s * subdim
        var best = 0; var bestD = Double.MaxValue; var c = 0
        while (c < kc) {
          val cent = cb(s)(c); var d = 0.0; var i = 0
          while (i < subdim) { val t = v(base + i) - cent(i); d += t * t; i += 1 }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        codes(s) = best; s += 1
      }
      new GenericArrayData(codes)
    }

    /** Per-query ADC tables: (partial dots against every sub-centroid,
      * query norm). Built once per query on the driver.
      */
    def buildLut(q: Array[Float]): (Array[Double], Double) = {
      val lut = new Array[Double](m * kc)
      var qn = 0.0
      var i = 0
      while (i < q.length) { qn += q(i).toDouble * q(i); i += 1 }
      var s = 0
      while (s < m) {
        val base = s * subdim; var c = 0
        while (c < kc) {
          val cent = cb(s)(c); var d = 0.0; var j = 0
          while (j < subdim) { d += q(base + j).toDouble * cent(j); j += 1 }
          lut(s * kc + c) = d; c += 1
        }
        s += 1
      }
      (lut, math.sqrt(qn))
    }
  }

  /** ADC cosine scoring state for a bounded query set. */
  final class PqAdcHelper(
      codec: PqHelper, luts: Map[Long, (Array[Double], Double)]) extends Serializable {
    private val m = codec.m
    private val kc = codec.kc
    private val norms2 = codec.norms2
    def score(codes: ArrayData, qid: Long): Double = {
      val t = luts(qid)
      val lut = t._1
      var dot = 0.0; var n2 = 0.0; var s = 0
      while (s < m) {
        val c = codes.getInt(s)
        dot += lut(s * kc + c); n2 += norms2(s * kc + c); s += 1
      }
      val denom = t._2 * math.sqrt(n2)
      if (denom == 0.0) 0.0 else dot / denom
    }
  }

  case class PqEncodeExpr(child: Expression, helper: PqHelper)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes = Seq(ArrayType(FloatType))
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def nullSafeEval(input: Any): Any = helper.encode(input.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val h = ctx.addReferenceObj("pqEncodeHelper", helper, classOf[PqHelper].getName)
      defineCodeGen(ctx, ev, c => s"$h.encode($c)")
    }
    override protected def withNewChildInternal(newChild: Expression): PqEncodeExpr =
      copy(child = newChild)
    override def prettyName: String = "pq_encode"
  }

  case class PqAdcScoreExpr(left: Expression, right: Expression, helper: PqAdcHelper)
      extends BinaryExpression with ExpectsInputTypes {
    override def inputTypes = Seq(ArrayType(IntegerType), LongType)
    override def dataType: DataType = DoubleType
    override def nullSafeEval(codes: Any, qid: Any): Any =
      helper.score(codes.asInstanceOf[ArrayData], qid.asInstanceOf[Long])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val h = ctx.addReferenceObj("pqAdcHelper", helper, classOf[PqAdcHelper].getName)
      defineCodeGen(ctx, ev, (c, q) => s"$h.score($c, $q)")
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): PqAdcScoreExpr =
      copy(left = l, right = r)
    override def prettyName: String = "pq_adc_score"
  }

  def encode(vec: Column, helper: PqHelper): Column =
    Shims.column(PqEncodeExpr(Shims.expression(vec), helper))

  def adcScore(codes: Column, qid: Column, helper: PqAdcHelper): Column =
    Shims.column(PqAdcScoreExpr(Shims.expression(codes), Shims.expression(qid), helper))
}
