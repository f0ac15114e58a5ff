package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Loader, Transforms}
import graft.sources.Source

/** The Pipeline composition surface (Source |> transforms |> sink) and
  * the S11 dry-run mode: explain-only, execute nothing.
  */
class PipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val dataDir = {
    val d = Files.createTempDirectory("pipe").toString
    Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "a", 30.0))
      .toDF("id", "grp", "x").write.parquet(s"$d/t.parquet")
    d
  }

  test("pipeline composes source, transforms, and sink into one run") {
    val out = Files.createTempDirectory("pipeout").toString + "/r"
    Pipeline.fromParquet(dataDir, "t")
      .|>(Transforms.where(col("x") > 15))
      .|>(Transforms.derive("x2" -> (col("x") * 2)))
      .run(spark, df => df.write.parquet(out))
    val back = spark.read.parquet(out).select("id", "x2").as[(Long, Double)].collect().toSet
    assert(back == Set((2L, 40.0), (3L, 60.0)))
  }

  test("dry-run explains the plan and executes nothing (S11)") {
    val plan = Pipeline.fromParquet(dataDir, "t")
      .|>(Transforms.where(col("x") > 15))
      .explain(spark)
    assert(plan.toLowerCase.contains("scan parquet"))
    // the filter reaches the scan in the dry-run plan (pushdown visible)
    assert(plan.contains("PushedFilters"))
    // dryRun pipelines never write: run() with a throwing sink must not throw
    var executed = false
    Pipeline.fromParquet(dataDir, "t").copy(dryRun = true)
      .run(spark, _ => executed = true)
    assert(!executed)
  }

  test("pipeline loads into the catalog through Loader") {
    spark.sql("DROP TABLE IF EXISTS pipe_tgt")
    Pipeline.fromParquet(dataDir, "t")
      .|>(Transforms.where(col("grp") === "a"))
      .load(spark, Loader.LoadConfig("pipe_tgt", Loader.Overwrite))
    assert(spark.table("pipe_tgt").count() == 2)
    spark.sql("DROP TABLE pipe_tgt")
  }

  test("quoteIdentifier round-trips through a catalog statement (S9/R10)") {
    assert(Source.hasTable(spark, "definitely_not_a_table") == false)
  }
}
