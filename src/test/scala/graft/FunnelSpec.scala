package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Funnel

/** Funnel progression: step k counts only strictly after step k−1
  * completed. Out-of-order events must NOT count.
  */
class FunnelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val steps = Seq("view", "click", "purchase")

  private def run(rows: Seq[(Long, Long, String)]): Map[Long, (Option[Long], Option[Long], Option[Long], Int)] = {
    val df = rows.toDF("user_id", "t", "event_type")
    Funnel.progression(df, "user_id", "t", "event_type", steps)
      .as[(Long, Option[Long], Option[Long], Option[Long], Int)]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
  }

  test("full funnel in order completes all steps at the earliest times") {
    val got = run(Seq(
      (1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "purchase"),
      (1L, 40L, "click") // later repeat doesn't move step2 back
    ))
    assert(got(1L) == ((Some(10L), Some(20L), Some(30L), 3)))
  }

  test("a click BEFORE any view does not count; a later one does") {
    val got = run(Seq(
      (2L, 5L, "click"), (2L, 10L, "view"), (2L, 15L, "click")
    ))
    assert(got(2L) == ((Some(10L), Some(15L), None, 2)))
  }

  test("purchase before the click-after-view chain completes is ignored") {
    // view(10), purchase(15), click(20): purchase precedes step-2
    // completion, so the funnel stops at 2
    val got = run(Seq(
      (3L, 10L, "view"), (3L, 15L, "purchase"), (3L, 20L, "click")
    ))
    assert(got(3L) == ((Some(10L), Some(20L), None, 2)))
  }

  test("same-timestamp step does not satisfy the STRICTLY-after rule") {
    val got = run(Seq((4L, 10L, "view"), (4L, 10L, "click")))
    assert(got(4L)._4 == 1)
  }

  test("users with no step-1 event complete zero steps") {
    val got = run(Seq((5L, 10L, "click"), (5L, 20L, "purchase")))
    assert(got(5L) == ((None, None, None, 0)))
  }

  test("the whole funnel plans a SINGLE shuffle (stacked windows + rollup share it)") {
    val df = (1 to 100).map(i => (i.toLong % 10, i.toLong, if (i % 3 == 0) "view" else "click"))
      .toDF("user_id", "t", "event_type")
    val plan = Funnel.progression(df, "user_id", "t", "event_type", steps)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected 1 hash exchange, got $exchanges:\n$plan")
  }
}
