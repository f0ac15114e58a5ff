package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: every SparkEntry query runs against
  * SPARK_GRAFT_SF_DIR, materialized through the noop sink (full compute,
  * no pruning shortcut a bare count() would allow, no output I/O noise).
  * Prints exactly one JSON line for the driver.
  *
  * Noise control: each query runs SPARK_GRAFT_BENCH_REPS times (default
  * 3) and reports the MEDIAN — a single run on a shared host conflates
  * host contention with real regressions (r3's driver bench showed
  * unchanged queries "regressing" 5-12× that re-measured clean). Caches
  * are cleared between reps so every rep pays its own materializations.
  * Optional args restrict the run to the named queries (local
  * iteration).
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

    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt.max(1)
    val only = args.toSet
    val unknown = only -- SparkEntry.queries.keySet
    // a typo'd name silently shrinking the run would print a valid-looking
    // (and spectacular) total that round-over-round tooling would ingest
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.isEmpty || only(name) }

    // JVM/codegen warmup: run every selected query once at the smallest
    // SF so the measured numbers are the steady-state engine (plans
    // analyzed, Janino-compiled, executor JIT warm), not per-query
    // compile time.
    selected.foreach { case (_, fn) =>
      try fn(spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    // drop warmup caches: measured queries build (and pay for) their own
    spark.catalog.clearCache()

    // a crashed query must not masquerade as a fast one: its (near-zero)
    // wall time is recorded, but its name also lands in "failed" so
    // round-over-round comparisons can exclude it
    val results = selected.map { case (name, fn) =>
      val runs = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            false
          }
        val sec = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache() // each rep pays its own persists
        (sec, ok)
      }
      val median = runs.map(_._1).sorted.apply(reps / 2)
      (name, median, runs.forall(_._2))
    }
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.map(_._2).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"failed":$failed,"reps":$reps,"sf":"$sfDir"}""")
    // the per-query line above outgrew the driver's 2000-char tail
    // capture (~133 queries), which truncated its LEADING totals fields
    // in the r6 artifact — so the totals are ALSO emitted as a short
    // final line that always fits inside any tail capture
    println(f"""{"metric":"totals_tail","value":$total%.3f,"unit":"sec","n_queries":${results.size},"failed":$failed,"reps":$reps,"sf":"$sfDir"}""")
    spark.stop()
  }
}
