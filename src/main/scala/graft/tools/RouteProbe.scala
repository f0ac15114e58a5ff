package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.functions.{NativeHash, Text}
object RouteProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.tuned(SparkSession.builder().master("local[32]"), "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def probe(name: String, df: org.apache.spark.sql.DataFrame, sh: org.apache.spark.sql.Column,
        numHashes: Int, numBands: Int): Unit = {
      val hashed = df.select(sh.as("__sh")).select(col("__sh"),
        coalesce(size(col("__sh")), lit(0)).as("n")).where(col("n") > 0)
      val st = hashed.agg(count(lit(1)),
        approx_count_distinct(xxhash64(col("__sh")), 0.01),
        approx_count_distinct(element_at(
          NativeHash.minhashBandBucketsHashed(col("__sh"), numHashes / numBands, 1), 1), 0.01),
        countDistinct(element_at(
          NativeHash.minhashBandBucketsHashed(col("__sh"), numHashes / numBands, 1), 1))).head()
      println(s"[route] $name n=${st.getLong(0)} hllSets=${st.getLong(1)} hllBuckets=${st.getLong(2)} exactBuckets=${st.getLong(3)}")
    }
    probe("ngram2", docs, NativeHash.shingleHashes(Text.tokens(col("text")), 2), 64, 16)
    probe("chargram3-zh", docs.filter(col("lang") === "zh"), NativeHash.charShingleHashes(col("text"), 3), 64, 16)
    probe("overlap-tok1", docs, NativeHash.shingleHashes(Text.tokens(col("text")), 1), 64, 16)
    spark.stop()
  }
}
