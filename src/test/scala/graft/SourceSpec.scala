package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Source

/** S1-S3/S9 source API semantics at the library boundary (the driver
  * gate exercises them through queries; this pins the API contract).
  */
class SourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val dir = {
    val d = Files.createTempDirectory("src").toString
    Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("id", "name", "x").write.parquet(s"$d/t.parquet")
    d
  }

  test("table: empty columns means * (reference default, dumper/sql.py:36)") {
    assert(Source.table(spark, dir, "t").columns.toSeq == Seq("id", "name", "x"))
  }

  test("table: projection prunes and preserves requested order") {
    assert(Source.table(spark, dir, "t", Seq("x", "id")).columns.toSeq == Seq("x", "id"))
  }

  test("table: where is an arbitrary SQL predicate (S2 injection semantics)") {
    val out = Source.table(spark, dir, "t", Seq("id"), Some("x > 15 AND name <> 'c'"))
      .as[Long].collect()
    assert(out.toSeq == Seq(2L))
  }

  test("table: malformed predicate fails at plan time with a parse error") {
    intercept[Exception] {
      Source.table(spark, dir, "t", Nil, Some("x >>> oops")).collect()
    }
  }

  test("registerAll + sql: temp views resolve by table name (S3)") {
    Source.registerAll(spark, dir, Seq("t"))
    assert(Source.sql(spark, "SELECT count(*) AS n FROM t").as[Long].head() == 3L)
  }

  test("columnsOf excludes requested columns (S9 exclude list)") {
    val df = Source.table(spark, dir, "t")
    assert(Source.columnsOf(df, exclude = Seq("name")) == Seq("id", "x"))
  }

  test("dryRun returns a formatted plan without executing (S11)") {
    val plan = Source.dryRun(Source.table(spark, dir, "t", Seq("id"), Some("x > 15")))
    assert(plan.contains("PushedFilters") && plan.toLowerCase.contains("scan parquet"))
  }

  test("files reads csv and json directories with an explicit schema") {
    import org.apache.spark.sql.types._
    val root = java.nio.file.Files.createTempDirectory("graft_src_files").toString
    val data = Seq((1L, "x"), (2L, "y"))
    data.toDF("id", "v").write.csv(s"$root/c")
    data.toDF("id", "v").write.json(s"$root/j")
    val schema = StructType(Seq(StructField("id", LongType), StructField("v", StringType)))
    for (fmt <- Seq("csv", "json")) {
      val back = Source.files(spark, s"$root/${fmt.head}", fmt, Some(schema))
        .as[(Long, String)].collect().toSet
      assert(back == data.toSet, s"$fmt round trip")
    }
  }
}
