package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.functions.{NativeHash, Text}
import graft.operators.Par

/** Throwaway decomposition of the routed-dedup probe + prefix-index
  * cost (r18 item 1): times each phase SEQUENTIALLY so the fused
  * probe's concurrent double-materialization is visible, and A/Bs the
  * count-window df against an aggregate + shuffled-hash join-back over
  * the same single exchange. Delete when the round's measurements are
  * done.
  */
object PrefixProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.tuned(
        SparkSession.builder().master(s"local[$cpus]"), cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val threshold = 0.3
    val Eps = 1e-9

    def time(name: String)(body: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[prefix] $name%-46s ${(System.nanoTime() - t0) / 1e9}%7.3f s  ($r)")
    }
    def noop(df: DataFrame): Long = { df.write.format("noop").mode("overwrite").save(); 0L }

    (1 to 2).foreach { round =>
      println(s"== round $round (${if (round == 1) "cold" else "warm"}) ==")
      spark.catalog.clearCache(); Par.sweepBlocks(spark)

      val hashed = Par.widen(docs)
        .select(col("doc_id").as("id"),
          NativeHash.shingleHashes(Text.tokens(col("text")), 2).as("__sh"))
        .select(col("id"), col("__sh"), coalesce(size(col("__sh")), lit(0)).as("n"))
        .persist(MEMORY_AND_DISK)
      val nonEmpty = hashed.where(col("n") > 0)

      time("A hashed materialize")(hashed.count())
      time("B statAgg over cache")(nonEmpty.agg(count(lit(1)),
        approx_count_distinct(xxhash64(col("__sh")), 0.01),
        approx_count_distinct(element_at(
          NativeHash.minhashBandBucketsHashed(col("__sh"), 4, 1), 1), 0.01)).head())

      val index = nonEmpty.select(col("id"), explode(col("__sh")).as("s"), col("n"))
      val p = spark.sparkContext.defaultParallelism

      // current form: count window over repartition(p, s)
      val wS = Window.partitionBy(col("s"))
      val wDoc = Window.partitionBy(col("id")).orderBy(col("df").asc, col("s").asc)
      val winPrefix = index.repartition(p, col("s"))
        .withColumn("df", count(lit(1)).over(wS))
        .repartition(p, col("id"))
        .withColumn("pos", row_number().over(wDoc))
        .filter(col("pos") <= col("n") - ceil(col("n") * threshold - lit(Eps)) + 1)
        .select(col("s"), col("id"), col("n"), col("pos"))
      time("C1 prefix via count window")(noop(winPrefix))

      // candidate form: agg + shuffled-hash join-back over the SAME exchange
      val idx = index.repartition(p, col("s"))
      val dfreq = idx.groupBy("s").agg(count(lit(1)).as("df"))
      val shjPrefix = idx.join(dfreq.hint("shuffle_hash"), Seq("s"))
        .repartition(p, col("id"))
        .withColumn("pos", row_number().over(wDoc))
        .filter(col("pos") <= col("n") - ceil(col("n") * threshold - lit(Eps)) + 1)
        .select(col("s"), col("id"), col("n"), col("pos"))
      time("C2 prefix via agg+SHJ")(noop(shjPrefix))

      // split the two window phases of C1
      time("C1a df count window only")(noop(index.repartition(p, col("s"))
        .withColumn("df", count(lit(1)).over(wS))))
      time("C2a df agg+SHJ only")(noop(idx.join(dfreq.hint("shuffle_hash"), Seq("s"))))

      // candidate form 3: combiner dfreq + AQE-broadcast join-back —
      // no s-exchange of the index at all (one exchange, by id)
      val dfreq2 = index.groupBy(col("s")).agg(count(lit(1)).as("df"))
      val bcPrefix = index.join(dfreq2, Seq("s"))
        .repartition(p, col("id"))
        .withColumn("pos", row_number().over(wDoc))
        .filter(col("pos") <= col("n") - ceil(col("n") * threshold - lit(Eps)) + 1)
        .select(col("s"), col("id"), col("n"), col("pos"))
      time("C3 prefix via combiner dfreq + bcast join")(noop(bcPrefix))

      val prefix = winPrefix.persist(MEMORY_AND_DISK)
      time("D prefix materialize (window form)")(prefix.count())
      time("E cvAgg over prefix cache")(prefix.groupBy("s").agg(count(lit(1)).as("c"))
        .agg(coalesce(sum(col("c").cast("double") * col("c").cast("double")), lit(0.0))).head())
      prefix.unpersist(false)

      // F: the proposed sequential probe end-to-end (statAgg rsd=0.05 →
      // prefix CUT (C3 form) → cvAgg over the cut)
      time("F new probe seq total") {
        val st = nonEmpty.agg(count(lit(1)),
          approx_count_distinct(xxhash64(col("__sh")), 0.05),
          approx_count_distinct(element_at(
            NativeHash.minhashBandBucketsHashed(col("__sh"), 4, 1), 1), 0.05)).head()
        val pfx = Par.cut(bcPrefix, "probe: prefix cut")
        val cv = pfx.groupBy("s").agg(count(lit(1)).as("c"))
          .agg(coalesce(sum(col("c").cast("double") * col("c").cast("double")), lit(0.0))).head()
        Par.free(pfx)
        s"${st.getLong(0)}/${cv.getDouble(0)}"
      }
      hashed.unpersist(false)
    }
    spark.stop()
  }
}
