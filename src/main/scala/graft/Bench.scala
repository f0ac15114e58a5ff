package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: every SparkEntry query runs against
  * SPARK_GRAFT_SF_DIR, materialized through the noop sink (full compute,
  * no pruning shortcut a bare count() would allow, no output I/O noise).
  * Prints exactly one JSON line for the driver.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.tuned(
        SparkSession.builder().master(s"local[$cpus]"), cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // JVM/codegen warmup: run EVERY query once at the smallest SF so the
    // measured numbers are the steady-state engine (plans analyzed,
    // Janino-compiled, executor JIT warm), not per-query compile time.
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (_, fn) =>
      try fn(spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    // drop warmup caches: measured queries build (and pay for) their own
    spark.catalog.clearCache()

    // a crashed query must not masquerade as a fast one: its (near-zero)
    // wall time is recorded, but its name also lands in "failed" so
    // round-over-round comparisons can exclude it
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          false
        }
      (name, (System.nanoTime() - t0) / 1e9, ok)
    }
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.map(_._2).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
