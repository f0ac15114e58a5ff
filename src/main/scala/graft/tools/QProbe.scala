package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Temp probe: approx_percentile vs DuckDB quantile_disc alignment. */
object QProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.GraftSession.tuned(SparkSession.builder().master("local[16]"), "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    for (acc <- Seq(1000, 10000, 100000)) {
      val r = li.groupBy("l_returnflag")
        .agg(
          expr(s"approx_percentile(l_quantity, 0.5, $acc)").as("p50"),
          expr(s"approx_percentile(l_quantity, 0.9, $acc)").as("p90"),
          expr(s"approx_percentile(l_extendedprice, 0.99, $acc)").as("p99"))
        .orderBy("l_returnflag")
        .collect()
      println(s"QPROBE acc=$acc " + r.map(_.toSeq.mkString(",")).mkString(" | "))
    }
    spark.stop()
  }
}
