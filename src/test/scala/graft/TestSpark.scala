package graft

import org.apache.spark.sql.SparkSession

/** One shared test session (getOrCreate — suites may run in parallel in
  * a single forked JVM). Warehouse goes to a temp dir so catalog-writing
  * tests (LoaderSpec) never pollute the repo.
  */
object TestSpark {
  lazy val spark: SparkSession = {
    val wh = java.nio.file.Files.createTempDirectory("graft-wh").toString
    // hive-backed catalog (derby metastore in the temp warehouse) so the
    // K8 LOAD DATA / R4 staging-clone paths are testable; everything the
    // in-memory catalog supported works identically under it
    val s = GraftSession.tuned(SparkSession.builder().master("local[4]"), "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", wh)
      .config("javax.jdo.option.ConnectionURL",
        s"jdbc:derby:;databaseName=$wh/metastore_db;create=true")
      .enableHiveSupport()
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
