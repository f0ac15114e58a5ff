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
    // count Spark jobs during the check: 20 rules must NOT cost 20 jobs
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val report = Expectations.check(df, rules)
      // listener events post asynchronously; give the bus a bounded drain
      val deadline = System.nanoTime() + 2000000000L
      while (jobs.get() < 1 && System.nanoTime() < deadline) Thread.sleep(20)
      // one agg().head() job (AQE may add a stage, not a per-rule job);
      // the local toDF of the report adds no job until acted on
      assert(jobs.get() <= 2, s"expected a single aggregate job, saw ${jobs.get()}")
      assert(report.count() == 20)
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("empty input reports vacuous passes, not an error") {
    val empty = df.filter(col("id") < 0)
    val got = Expectations.check(empty, Seq(Expectation("v_nonneg", col("v") >= 0)))
      .as[(String, Long, Long, Int)].head()
    assert(got == (("v_nonneg", 0L, 0L, 1)))
  }

  test("duplicate rule names are rejected") {
    intercept[IllegalArgumentException] {
      Expectations.check(df, Seq(
        Expectation("dup", col("v") >= 0), Expectation("dup", col("v") < 0)))
    }
  }
}
