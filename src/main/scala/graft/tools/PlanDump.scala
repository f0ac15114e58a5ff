package graft.tools

import org.apache.spark.sql.SparkSession

import graft.{GraftSession, SparkEntry}

/** Dump `.explain("formatted")` for named declared queries to files —
  * the optimization-round evidence trail (plans/r17/<q>_before.txt /
  * _after.txt). The plan is captured from the SAME lambda the bench and
  * the oracle gate run.
  *
  * Usage: runMain graft.tools.PlanDump <outDir> <suffix> <query> [query ...]
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32).
  *
  * Note: operators that eagerly materialize intermediates (Par.cut)
  * execute those stages during plan construction; the dumped plan is
  * the FINAL frame's — upstream sealed stages appear as
  * ExistingRDD/LogicalRDD leaves. That is the honest shape of what the
  * consumer re-executes; the in-flight stage plans are pinned by
  * PlanShapeSpec probes instead.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <outDir> <suffix> <query> [query ...]")
    val outDir = java.nio.file.Paths.get(args(0))
    val suffix = args(1)
    java.nio.file.Files.createDirectories(outDir)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.tuned(
        SparkSession.builder().master(s"local[$cpus]"), cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.drop(2).foreach { q =>
      val fn = SparkEntry.queries.getOrElse(q, sys.error(s"unknown query: $q"))
      val plan = fn(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(outDir.resolve(s"${q}_$suffix.txt"),
        plan.getBytes("UTF-8"))
      System.err.println(s"[plandump] wrote ${q}_$suffix.txt")
      spark.catalog.clearCache()
      graft.operators.Par.sweepBlocks(spark)
    }
    spark.stop()
  }
}
