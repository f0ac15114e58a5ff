package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Loader

/** K8 bulk file load + R4 staging-table protocol against the hive-backed
  * test catalog — the reference's `hive -e "LOAD DATA …"` subprocess and
  * `CREATE TABLE stg LIKE t` staging clone, executed natively.
  */
class HiveSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("LOAD DATA LOCAL INPATH ingests a text file into a hive table (K8)") {
    spark.sql("DROP TABLE IF EXISTS hv_load")
    spark.sql("CREATE TABLE hv_load (k INT, v STRING) ROW FORMAT DELIMITED FIELDS TERMINATED BY ',' STORED AS TEXTFILE")
    val f = Files.createTempFile("hvload", ".csv")
    Files.writeString(f, "1,a\n2,b\n")
    Loader.loadFile(spark, f.toString, "hv_load")
    assert(spark.table("hv_load").as[(Int, String)].collect().toSet == Set((1, "a"), (2, "b")))
    // OVERWRITE replaces previous contents
    val f2 = Files.createTempFile("hvload2", ".csv")
    Files.writeString(f2, "9,z\n")
    Loader.loadFile(spark, f2.toString, "hv_load", overwrite = true)
    assert(spark.table("hv_load").as[(Int, String)].collect().toSet == Set((9, "z")))
    spark.sql("DROP TABLE hv_load")
  }

  test("staging clone copies the target's schema with no rows (R4)") {
    spark.sql("DROP TABLE IF EXISTS hv_t")
    Seq((1, "a", 2.5)).toDF("k", "v", "x").write.saveAsTable("hv_t")
    Loader.prepareStaging(spark, "hv_t", "hv_t_staging")
    assert(spark.table("hv_t_staging").schema == spark.table("hv_t").schema)
    assert(spark.table("hv_t_staging").count() == 0)
    // idempotent: re-preparing drops and recreates
    Loader.prepareStaging(spark, "hv_t", "hv_t_staging")
    assert(spark.table("hv_t_staging").count() == 0)
    spark.sql("DROP TABLE hv_t"); spark.sql("DROP TABLE hv_t_staging")
  }
}
