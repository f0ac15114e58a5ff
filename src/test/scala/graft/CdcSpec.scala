package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Cdc

/** Changelog apply: last op per key wins, trailing deletes remove the
  * key, same-timestamp commits break ties on the sequence column.
  */
class CdcSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // (key, seq, op, payload)
  private def apply(rows: Seq[(Int, Int, String, String)]): Set[(Int, String)] =
    Cdc.applyChangelog(rows.toDF("k", "seq", "op", "v"),
        keys = Seq("k"), ordering = Seq(col("seq")))
      .select("k", "v").as[(Int, String)].collect().toSet

  test("last upsert wins; trailing delete removes the key") {
    val got = apply(Seq(
      (1, 1, "I", "a1"), (1, 2, "U", "a2"),            // live at a2
      (2, 1, "I", "b1"), (2, 2, "D", ""),              // deleted
      (3, 1, "I", "c1"), (3, 2, "D", ""), (3, 3, "I", "c2"))) // re-inserted
    assert(got == Set((1, "a2"), (3, "c2")))
  }

  test("same-timestamp commits are ordered by the sequence tie-break") {
    val got = Cdc.applyChangelog(
        Seq((1, 100, 1, "U", "first"), (1, 100, 2, "U", "second"))
          .toDF("k", "ts", "seq", "op", "v"),
        keys = Seq("k"), ordering = Seq(col("ts"), col("seq")))
      .select("k", "v").as[(Int, String)].collect().toSet
    assert(got == Set((1, "second")))
  }

  test("applying a changelog twice equals applying it once (idempotent replay)") {
    // key 3 survives via its INSERT — comparison must ignore the op
    // column, which replay legitimately rewrites
    val log = Seq((1, 1, "I", "a"), (1, 2, "U", "b"), (2, 1, "D", ""), (3, 1, "I", "c"))
      .toDF("k", "seq", "op", "v")
    val once = Cdc.applyChangelog(log, Seq("k"), Seq(col("seq")))
    val twice = Cdc.applyChangelog(once.withColumn("op", lit("U")), Seq("k"), Seq(col("seq")))
    assert(once.drop("op").collect().toSet == twice.drop("op").collect().toSet)
  }

  test("a NULL op on the winning record is an upsert, not a silent delete") {
    val log = Seq(
      (1, 1, Some("I"), "a"), (1, 2, None, "a2"), // malformed latest op
      (2, 1, Some("I"), "b"), (2, 2, Some("D"), "")).toDF("k", "seq", "op", "v")
    val got = Cdc.applyChangelog(log, Seq("k"), Seq(col("seq")))
      .select("k", "v").as[(Int, String)].collect().toSet
    assert(got == Set((1, "a2")))
  }
}
