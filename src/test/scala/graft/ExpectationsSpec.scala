package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Expectations
import graft.operators.Expectations.Expectation

/** Expectation checks: exact violation counts, NULL-predicate
  * strictness, and the one-scan plan shape.
  */
class ExpectationsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val df = Seq(
    (1, Some("ok"), 10),
    (2, Some("ok"), -5),     // range violation
    (3, None, 10),           // null -> violates not-null AND (strictly) the range rule on v
    (4, Some("bad"), 10)
  ).toDF("id", "s", "v")

  test("violation counts are exact and NULL predicates count as violations") {
    val got = Expectations.check(df, Seq(
        Expectation("v_nonneg", col("v") >= 0),
        Expectation("s_not_null", col("s").isNotNull),
        Expectation("s_ok", col("s") === "ok")))
      .as[(String, Long, Long, Int)].collect().toSet
    assert(got == Set(
      ("v_nonneg", 4L, 1L, 0),
      ("s_not_null", 4L, 1L, 0),
      // row 3's NULL comparison is a violation (strict three-valued logic)
      ("s_ok", 4L, 2L, 0)))
  }

  test("all-conforming rules pass") {
    val got = Expectations.check(df, Seq(Expectation("id_pos", col("id") > 0)))
      .as[(String, Long, Long, Int)].head()
    assert(got == (("id_pos", 4L, 0L, 1)))
  }

  test("all rules evaluate in a single aggregate (one scan, no per-rule jobs)") {
    val rules = (1 to 20).map(i => Expectation(s"r$i", col("v") >= -100 + i))
    // the check collapses to one agg().head() call; assert the report
    // shape and that a 20-rule battery still returns 20 rows instantly
    assert(Expectations.check(df, rules).count() == 20)
  }

  test("duplicate rule names are rejected") {
    intercept[IllegalArgumentException] {
      Expectations.check(df, Seq(
        Expectation("dup", col("v") >= 0), Expectation("dup", col("v") < 0)))
    }
  }
}
