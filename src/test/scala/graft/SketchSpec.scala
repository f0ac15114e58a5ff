package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{MinHashAgg, NativeHash, Text}

/** Group-level MinHash sketches: the union law must hold EXACTLY
  * (element-wise min of per-doc signatures == signature of the union of
  * their shingle sets), and the Jaccard estimate must track truth.
  */
class SketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "g1", "the quick brown fox jumps over the lazy dog"),
    (2L, "g1", "a quick brown cat naps under the warm sun"),
    (3L, "g2", "the quick brown fox jumps over the lazy dog"), // == doc 1
    (4L, "g2", "completely different content about columnar engines")
  ).toDF("id", "grp", "text")

  private def sig(c: org.apache.spark.sql.Column) =
    NativeHash.minhashSig(array_distinct(Text.shingles(Text.tokens(c), 2)), 64, 42L)

  test("union sketch equals the signature of the union of shingle sets, per group") {
    val sketched = docs
      .select(col("grp"), sig(col("text")).as("sig"))
      .groupBy("grp").agg(MinHashAgg.unionSketch(col("sig"), 64).as("sk"))
      .as[(String, Seq[Long])].collect().toMap
    // direct union signature: concat the group's texts' shingles, distinct
    val direct = docs
      .select(col("grp"), array_distinct(Text.shingles(Text.tokens(col("text")), 2)).as("sh"))
      .groupBy("grp").agg(flatten(collect_list(col("sh"))).as("all"))
      .select(col("grp"), NativeHash.minhashSig(array_distinct(col("all")), 64, 42L).as("sig"))
      .as[(String, Seq[Long])].collect().toMap
    assert(sketched == direct)
  }

  test("estimated cross-group Jaccard tracks the exact value") {
    val sk = docs
      .select(col("grp"), sig(col("text")).as("sig"))
      .groupBy("grp").agg(MinHashAgg.unionSketch(col("sig"), 64).as("sk"))
      .as[(String, Seq[Long])].collect().toMap
    val est = MinHashAgg.estimateJaccard(sk("g1"), sk("g2"))
    val sets = docs
      .select(col("grp"), explode(array_distinct(Text.shingles(Text.tokens(col("text")), 2))).as("s"))
      .as[(String, String)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = (sets("g1") & sets("g2")).size.toDouble / (sets("g1") | sets("g2")).size
    assert(math.abs(est - exact) < 0.2, s"est $est vs exact $exact") // k=64 => se ~ 1/8
  }

  test("HLL sketches merge losslessly: union of per-slice sketches == whole-corpus sketch") {
    // the incremental-distinct pattern: daily user sketches merge to the
    // month WITHOUT re-scanning events — estimates must agree exactly
    // (same sketch state), and track the true cardinality
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select(col("event_id"), col("user_id")).persist()
    val whole = ev.agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("e"))
      .head().getLong(0)
    val merged = ev.withColumn("slice", pmod(col("event_id"), lit(7)))
      .groupBy("slice").agg(hll_sketch_agg(col("user_id")).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("e"))
      .head().getLong(0)
    val exact = ev.select("user_id").distinct().count()
    assert(merged == whole, s"merged $merged != whole $whole") // same sketch math
    assert(math.abs(merged - exact).toDouble / exact < 0.05, s"est $merged vs exact $exact")
    ev.unpersist()
  }
}
