package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

import graft.operators.{Dedup, Merge}
import graft.sources.Source

/** ScalaCheck properties (SURVEY.md §5.3): merge idempotence, dedup
  * idempotence/coverage, split-scan losslessness — run on real Spark
  * plans over generated data. Case counts are kept small: each case is
  * a full Spark job.
  */
object GraftProperties extends Properties("graft") {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(10)

  private val kvRows: Gen[List[(Int, String)]] =
    Gen.listOfN(30, Gen.zip(Gen.choose(0, 9), Gen.alphaStr.map(_.take(5))))

  property("merge idempotence: merge(merge(t,s),s) == merge(t,s)") =
    forAll(kvRows, kvRows) { (t, s) =>
      // staging must be key-unique for a well-defined upsert
      val tDf = t.toDF("k", "v")
      val sDf = s.distinctBy(_._1).toDF("k", "v")
      val once = Merge.upsert(tDf, sDf, Seq("k"))
      val twice = Merge.upsert(once, sDf, Seq("k"))
      once.collect().toSet == twice.collect().toSet
    }

  property("merge result contains every staging row") =
    forAll(kvRows, kvRows) { (t, s) =>
      val sDf = s.distinctBy(_._1).toDF("k", "v")
      val out = Merge.upsert(t.toDF("k", "v"), sDf, Seq("k")).collect().toSet
      sDf.collect().toSet.subsetOf(out)
    }

  property("dedup byRank: one row per key, rows drawn from input") =
    forAll(kvRows) { rows =>
      rows.isEmpty || {
        val df = rows.toDF("k", "v")
        val out = Dedup.byRank(df, Seq("k"), Seq(col("v").asc)).as[(Int, String)].collect()
        out.map(_._1).distinct.length == out.length &&
        out.toSet.subsetOf(rows.toSet) &&
        out.map(_._1).toSet == rows.map(_._1).toSet
      }
    }

  property("dedup idempotence") =
    forAll(kvRows) { rows =>
      rows.isEmpty || {
        val df = rows.toDF("k", "v")
        val once = Dedup.byRank(df, Seq("k"), Seq(col("v").asc))
        Dedup.byRank(once, Seq("k"), Seq(col("v").asc)).collect().toSet == once.collect().toSet
      }
    }

  property("splitRanges union == full scan for any longs and split count") =
    forAll(Gen.nonEmptyListOf(Gen.choose(-1000000L, 1000000L)), Gen.choose(1, 8)) {
      (ks, n) =>
        val df = ks.toDF("k")
        val parts = Source.splitRanges(df, "k", n)
        parts.map(_.count()).sum == ks.length
    }
}
