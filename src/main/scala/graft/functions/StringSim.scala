package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Shims
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Jaro / Jaro-Winkler similarity as native codegen'd expressions —
  * Spark ships levenshtein but neither of these, and they are the
  * standard record-linkage scorers for short strings (names, titles,
  * ids) where levenshtein over-penalizes transpositions.
  *
  * Semantics match the classic Winkler formulation (and DuckDB's
  * `jaro_similarity` / `jaro_winkler_similarity`, verified empirically
  * — the fuzzy-match oracle relies on it): match window
  * ⌊max(|a|,|b|)/2⌋−1, zero matches → 0, either side empty → 0,
  * jaro = (m/|a| + m/|b| + (m−t)/m)/3 with t = half-transpositions;
  * Winkler boost jw = j + ℓ·0.1·(1−j) applies only when j > 0.7, with
  * the common prefix ℓ capped at 4. Comparison is per Unicode code
  * point.
  *
  * Scale shape: pure per-row compute (one compiled method call inside
  * whole-stage codegen, no boxing); O(|a|·window) time, two small int
  * buffers per call.
  */
object StringSim {

  final class JaroHelper(winkler: Boolean) extends Serializable {
    def compute(a: UTF8String, b: UTF8String): Double = {
      val s1 = a.toString.codePoints().toArray
      val s2 = b.toString.codePoints().toArray
      val la = s1.length
      val lb = s2.length
      if (la == 0 || lb == 0) return 0.0
      val window = math.max(math.max(la, lb) / 2 - 1, 0)
      val matched2 = new Array[Boolean](lb)
      val order = new Array[Int](math.min(la, lb)) // s2-indices of matches, in s1 order
      var m = 0
      var i = 0
      while (i < la) {
        val lo = math.max(0, i - window)
        val hi = math.min(lb - 1, i + window)
        var j = lo
        var found = false
        while (j <= hi && !found) {
          if (!matched2(j) && s1(i) == s2(j)) {
            matched2(j) = true
            order(m) = j
            m += 1
            found = true
          }
          j += 1
        }
        i += 1
      }
      if (m == 0) return 0.0
      // half-transpositions: compare the matched sequence in s1 order
      // (s2(order(k)) — equal to s1's matched char by construction)
      // against the matched sequence in s2 order (ascending walk of
      // matched2); each positional difference is a half-transposition
      var t = 0
      var k = 0
      var jj = 0
      while (k < m) {
        while (!matched2(jj)) jj += 1
        if (s2(order(k)) != s2(jj)) t += 1
        jj += 1
        k += 1
      }
      val half = t / 2
      val mm = m.toDouble
      val j = (mm / la + mm / lb + (mm - half) / mm) / 3.0
      if (!winkler || j <= 0.7) j
      else {
        var l = 0
        val cap = math.min(4, math.min(la, lb))
        while (l < cap && s1(l) == s2(l)) l += 1
        j + l * 0.1 * (1.0 - j)
      }
    }
  }

  case class JaroExpr(left: Expression, right: Expression, winkler: Boolean)
      extends BinaryExpression with ExpectsInputTypes {
    override def inputTypes = Seq(StringType, StringType)
    override def dataType: DataType = DoubleType
    @transient private lazy val helper = new JaroHelper(winkler)
    override def nullSafeEval(a: Any, b: Any): Any =
      helper.compute(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val h = ctx.addReferenceObj("jaroHelper", helper, classOf[JaroHelper].getName)
      defineCodeGen(ctx, ev, (a, b) => s"$h.compute($a, $b)")
    }
    override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): JaroExpr =
      copy(left = newLeft, right = newRight)
    override def prettyName: String = if (winkler) "jaro_winkler" else "jaro"
  }

  def jaro(a: Column, b: Column): Column =
    Shims.column(JaroExpr(Shims.expression(a), Shims.expression(b), winkler = false))

  def jaroWinkler(a: Column, b: Column): Column =
    Shims.column(JaroExpr(Shims.expression(a), Shims.expression(b), winkler = true))
}
