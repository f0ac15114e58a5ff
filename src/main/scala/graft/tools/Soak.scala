package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.{GraftSession, SparkEntry}

/** Full-suite scale soak (standing harness, not a one-shot probe — the
  * per-round soak is a discipline since the r12 verdict): replicate ALL
  * sf0.1 tables REPS× with FK-consistent key offsets (≈sf1 at the
  * default 10), then run every `SparkEntry.queries` entry ONCE against
  * the replicated directory, printing per-query wall time + shuffle
  * write bytes (total and largest single stage). The goal is measured
  * super-linearity evidence for the 100-TB plan arguments — correctness
  * at scale is pinned by the sf0.01 oracle, not here.
  *
  * Replication shape (per replica r = 0..R-1; r = 0 is the identity):
  *   - every FK/PK column gets `+ r * 10^7` (all keys are numeric and
  *     < 10^7, so replicas never collide and every intra-replica join
  *     edge is preserved — scaling adds ENTITIES, not density per key,
  *     like TPC-H SF does);
  *   - `documents.text` r>0 gets a 2-token ` rep r` suffix (near-dup
  *     load for MinHash/winnow; r=0 keeps exact-dup cliques),
  *     `n_chars` recomputed to stay consistent;
  *   - `embeddings.embedding` r>0 scaled by (1 + r/1000): cosine-
  *     near-identical copies — ANN throughput load.
  *
  *   SPARK_GRAFT_CPUS=16 sbt -batch "runMain graft.tools.Soak --regen"
  *   SPARK_GRAFT_CPUS=16 sbt -batch "runMain graft.tools.Soak dedup_clusters dedup_clusters_scalable"
  *
  * Env: SPARK_GRAFT_SF_DIR (source, default /root/testdata/sf0.1),
  * SPARK_GRAFT_SOAK_DIR (default /tmp/graft_soak10x),
  * SPARK_GRAFT_SOAK_REPS (default 10). `--regen` forces re-replication;
  * remaining args restrict the run to the named queries.
  */
object Soak {

  /** Key columns offset per replica, per table. */
  private val keyCols: Map[String, Seq[String]] = Map(
    "region"     -> Seq("r_regionkey"),
    "nation"     -> Seq("n_nationkey", "n_regionkey"),
    "customer"   -> Seq("c_custkey", "c_nationkey"),
    "supplier"   -> Seq("s_suppkey", "s_nationkey"),
    "part"       -> Seq("p_partkey"),
    "orders"     -> Seq("o_orderkey", "o_custkey"),
    "lineitem"   -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
    "events"     -> Seq("event_id", "user_id"),
    "documents"  -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"))

  private val Off = 10_000_000L // > every key in the sf0.1 tables

  def replicate(spark: SparkSession, srcDir: String, outDir: String, reps: Int): Unit =
    keyCols.foreach { case (table, keys) =>
      val df = spark.read.parquet(s"$srcDir/$table.parquet")
      val parts = (0 until reps).map { r =>
        val keyed = keys.foldLeft(df) { (d, k) =>
          val orig = df.schema(k).dataType
          d.withColumn(k, (col(k).cast(LongType) + lit(r * Off)).cast(orig))
        }
        table match {
          case "documents" if r > 0 =>
            keyed.withColumn("text", concat(col("text"), lit(s" rep $r")))
              .withColumn("n_chars", length(col("text")).cast(LongType))
          case "embeddings" if r > 0 =>
            val elem = df.schema("embedding").dataType
              .asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType
            keyed.withColumn("embedding",
              transform(col("embedding"), x => (x * lit(1.0 + r / 1000.0)).cast(elem)))
          case _ => keyed
        }
      }
      parts.reduce(_ unionByName _).write.mode("overwrite")
        .parquet(s"$outDir/$table.parquet")
      println(s"[soak] replicated $table ${reps}x")
    }

  def main(args: Array[String]): Unit = {
    val srcDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val outDir = sys.env.getOrElse("SPARK_GRAFT_SOAK_DIR", "/tmp/graft_soak10x")
    val reps = sys.env.getOrElse("SPARK_GRAFT_SOAK_REPS", "10").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = GraftSession.tuned(
        SparkSession.builder().master(s"local[$cpus]"), cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val regen = args.contains("--regen")
    val only = args.filterNot(_ == "--regen").toSet
    val unknown = only -- SparkEntry.queries.keySet
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")

    if (regen || !new java.io.File(s"$outDir/lineitem.parquet").exists())
      replicate(spark, srcDir, outDir, reps)

    // shuffle-write accounting: total + largest single stage, reset per
    // query; the listener bus is drained before each row is stamped so
    // async completions land in the query that ran them
    val total = new java.util.concurrent.atomic.AtomicLong
    val maxStage = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val b = s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
        total.addAndGet(b)
        maxStage.accumulateAndGet(b, Math.max(_, _))
      }
    })

    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.isEmpty || only(name) }

    // Janino/JIT warmup at the smallest SF so soak walls measure the
    // steady-state engine, comparable to the (warmed) BENCH numbers
    selected.foreach { case (_, fn) =>
      try fn(spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    spark.catalog.clearCache()
    graft.operators.Par.sweepBlocks(spark)
    Thread.sleep(500)

    var sumSec = 0.0
    val failed = scala.collection.mutable.ListBuffer[String]()
    selected.foreach { case (name, fn) =>
      total.set(0); maxStage.set(0)
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, outDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[soak] $name failed: ${e.getMessage}")
          failed += name; false
        }
      // stamp wall time FIRST (listener-delivery wait is measurement
      // plumbing, not query work), THEN drain the bus so async
      // stage-completed events land in THIS query's shuffle columns
      // rather than bleeding into the next row
      val sec = (System.nanoTime() - t0) / 1e9
      val drained = org.apache.spark.sql.graft.Shims.drainListenerBus(spark.sparkContext)
      if (!drained)
        System.err.println(s"[soak] $name: listener bus drain timed out — " +
          "trailing stage events may bleed into the next row's shuffle columns")
      spark.catalog.clearCache()
      // sealed checkpoint outputs are outside the catalog cache; sweep
      // them so a long soak doesn't tax later queries (same discipline
      // as Bench/Verify)
      graft.operators.Par.sweepBlocks(spark)
      sumSec += sec
      println(f"""{"soak_q":"$name","sec":$sec%.3f,"shuffle_mb":${total.get / 1e6}%.1f,"max_stage_shuffle_mb":${maxStage.get / 1e6}%.1f,"ok":$ok,"bus_drained":$drained}""")
    }
    println(f"""{"soak_total_sec":$sumSec%.1f,"n":${selected.size},"reps":$reps,"failed":${failed.map("\"" + _ + "\"").mkString("[", ",", "]")}}""")
    spark.stop()
  }
}
