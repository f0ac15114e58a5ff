package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.StringSim

/** Jaro / Jaro-Winkler pinned bit-exactly to DuckDB's
  * jaro_similarity / jaro_winkler_similarity outputs (probed values) —
  * the string_sim_funcs oracle depends on this agreement.
  */
class StringSimSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def sims(pairs: Seq[(String, String)]): Seq[(Double, Double)] = {
    pairs.toDF("a", "b")
      .select(StringSim.jaro(col("a"), col("b")).as("j"),
        StringSim.jaroWinkler(col("a"), col("b")).as("jw"))
      .as[(Double, Double)].collect().toSeq
  }

  test("jaro/jaro-winkler match DuckDB bit-for-bit on the classic fixtures") {
    val cases = Seq(
      ("martha", "marhta") -> (0.9444444444444445, 0.9611111111111111),
      ("dixon", "dicksonx") -> (0.7666666666666666, 0.8133333333333332),
      ("jellyfish", "smellyfish") -> (0.8962962962962964, 0.8962962962962964),
      ("dwayne", "duane") -> (0.8222222222222223, 0.8400000000000001),
      ("abc", "abc") -> (1.0, 1.0),
      ("abc", "cba") -> (0.5555555555555555, 0.5555555555555555), // window 0: only the diagonal
      ("abcd", "badc") -> (0.8333333333333334, 0.8333333333333334), // all transpositions, no prefix
      ("a", "ab") -> (0.8333333333333334, 0.8500000000000001),
      ("Customer#000000001", "Customer#000000100")
        -> (0.9814814814814815, 0.9888888888888889) // prefix capped at 4
    )
    val got = sims(cases.map(_._1))
    cases.map(_._2).zip(got).zip(cases.map(_._1)).foreach { case ((exp, g), in) =>
      assert(g == exp, s"for $in")
    }
  }

  test("edge semantics: empty sides and zero matches give 0; boost needs j > 0.7") {
    val got = sims(Seq(("", ""), ("a", ""), ("", "a"), ("ab", "ba"), ("abcdef", "abdcfe")))
    assert(got(0) == ((0.0, 0.0)) && got(1) == ((0.0, 0.0)) && got(2) == ((0.0, 0.0)))
    assert(got(3) == ((0.0, 0.0))) // window ⌊2/2⌋−1 = 0 and nothing on the diagonal
    assert(got(4) == ((0.8888888888888888, 0.9111111111111111))) // boosted: prefix 2
  }

  test("SQL surface: jaro/jaro_winkler and vec_* resolve via GraftExtensions") {
    import spark.implicits._
    Seq(("martha", "marhta", Seq(1.0f, 2.0f, 2.0f), Seq(2.0f, 1.0f, 2.0f)))
      .toDF("a", "b", "va", "vb").createOrReplaceTempView("sim_rows")
    val r = spark.sql(
      """SELECT jaro(a, b) AS j, jaro_winkler(a, b) AS jw,
        |       vec_dot(va, vb) AS d, vec_norm(va) AS n,
        |       vec_l2_distance(va, vb) AS l2, cosine_sim(va, vb) AS cos
        |FROM sim_rows""".stripMargin).collect().head
    assert(r.getAs[Double]("j") == 0.9444444444444445)
    assert(r.getAs[Double]("jw") == 0.9611111111111111)
    assert(r.getAs[Double]("d") == 8.0) // 1·2 + 2·1 + 2·2
    assert(r.getAs[Double]("n") == 3.0) // √(1+4+4)
    assert(r.getAs[Double]("l2") == math.sqrt(2.0))
    // SQL and Column paths agree exactly (same expressions underneath)
    val viaCol = Seq((Seq(1.0f, 2.0f, 2.0f), Seq(2.0f, 1.0f, 2.0f))).toDF("va", "vb")
      .select(graft.functions.Vectors.cosine(col("va"), col("vb"))).as[Double].head()
    assert(math.abs(r.getAs[Double]("cos") - viaCol) < 1e-12)
  }
}
