package graft.tools

import graft.{GraftSession, SparkEntry}

object ExplainNew {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(16)
    val dir = "/root/testdata/sf0.01"
    for (q <- Seq("gap_fill", "page_transitions", "unpivot_metrics", "rfm_segments", "ann_pq")) {
      println(s"===== $q =====")
      println(SparkEntry.queries(q)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
