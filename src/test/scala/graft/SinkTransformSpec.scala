package graft

import java.nio.file.Files
import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Transforms
import graft.sinks.Sink

/** K9/K10 sink plumbing, format map, and the T4/T6 transform surface. */
class SinkTransformSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("fanOut materializes once and feeds every sink (K9)") {
    val base = Files.createTempDirectory("fanout").toString
    val df = Seq((1, "a"), (2, "b")).toDF("k", "v")
    Sink.fanOut(df, Seq(
      d => Sink.format(d, s"$base/p", "parquet"),
      d => Sink.csv(d, s"$base/c")))
    assert(spark.read.parquet(s"$base/p").count() == 2)
    assert(spark.read.csv(s"$base/c").count() == 2)
  }

  test("format map round-trips parquet and orc (const.py:19-26)") {
    val base = Files.createTempDirectory("fmt").toString
    val df = Seq((1L, "x")).toDF("k", "v")
    for (fmt <- Seq("parquet", "orc")) {
      Sink.format(df, s"$base/$fmt", fmt)
      assert(spark.read.format(fmt).load(s"$base/$fmt").collect().toSeq == df.collect().toSeq)
    }
  }

  test("noop sink computes without writing (K10)") {
    Sink.noop(Seq((1, "a")).toDF("k", "v")) // must not throw
  }

  test("quarantine splits good rows from poisoned rows (T4)") {
    val ds = Seq(1, 2, 3, 4, 5, 6).toDS()
    val (good, bad) = Transforms.quarantine(ds) { n =>
      if (n % 3 == 0) throw new IllegalStateException(s"bad $n") else n * 10
    }
    assert(good.collect().sorted.toSeq == Seq(10, 20, 40, 50))
    val errs = bad.collect()
    assert(errs.length == 2 && errs.forall(_.contains("IllegalStateException")))
  }

  test("observed reports the row count through an Observation handle (T6)") {
    val obs = Observation("rows_t6")
    val df = Transforms.observed(obs)(Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "v"))
    df.write.format("noop").mode("overwrite").save()
    assert(obs.get("rows") == 3L)
  }

  test("pipe composes stages left to right (T1/T2)") {
    val out = Transforms.pipe(
      Transforms.derive("d" -> (col("k") * 2)),
      Transforms.where(col("d") > 2)
    )(Seq(1, 2, 3).toDF("k"))
    assert(out.select("k", "d").as[(Int, Int)].collect().toSet == Set((2, 4), (3, 6)))
  }

  test("jsonExtract parses with explicit schema; explodeArray flattens (T3)") {
    import org.apache.spark.sql.types._
    val df = Seq((1, """{"xs": [10, 20]}""")).toDF("id", "js")
    val schema = StructType(Seq(StructField("xs", ArrayType(IntegerType))))
    val out = Transforms.pipe(
      Transforms.jsonExtract("js", schema),
      Transforms.explodeArray("j.xs", "x")
    )(df)
    assert(out.select("id", "x").as[(Int, Int)].collect().toSet == Set((1, 10), (1, 20)))
  }
}
