package graft.tools

import graft.{GraftSession, SparkEntry}

/** Plan inspector: `runMain graft.tools.ExplainNew <query> [query...]`
  * prints the formatted physical plan of each named SparkEntry query at
  * sf0.01 — the per-operator "is this the plan I'd want at 100 TB" check.
  */
object ExplainNew {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(16)
    val dir = "/root/testdata/sf0.01"
    val names = if (args.nonEmpty) args.toSeq else Seq("q1_agg")
    for (q <- names) {
      println(s"===== $q =====")
      println(SparkEntry.queries(q)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
