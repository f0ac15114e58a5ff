package graft

import org.apache.spark.sql.SparkSession

/** One shared test session (getOrCreate — suites may run in parallel in
  * a single forked JVM). Warehouse goes to a temp dir so catalog-writing
  * tests (LoaderSpec) never pollute the repo.
  */
object TestSpark {
  lazy val spark: SparkSession = {
    val wh = java.nio.file.Files.createTempDirectory("graft-wh").toString
    val s = GraftSession.tuned(SparkSession.builder().master("local[4]"), "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", wh)
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
