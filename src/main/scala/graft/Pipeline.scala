package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.Loader
import graft.sources.Source

/** The reference's three nouns — dump / transform / load (README.md:17-42)
  * — as one lazily-composed Spark plan. Where the reference crosses
  * process + network boundaries between stages (SURVEY.md §3.1), here the
  * whole pipeline is a single job graph: Catalyst sees through all stages
  * (filter pushdown through transforms into the scan), and the only
  * materialization points are the ones the data requires (shuffles).
  */
final case class Pipeline(
    source: SparkSession => DataFrame,
    stages: Seq[DataFrame => DataFrame] = Nil,
    dryRun: Boolean = false) {

  def |>(stage: DataFrame => DataFrame): Pipeline = copy(stages = stages :+ stage)

  def plan(spark: SparkSession): DataFrame =
    stages.foldLeft(source(spark))((df, s) => s(df))

  /** S11 dry-run: return the formatted plan, execute nothing. */
  def explain(spark: SparkSession): String = Source.dryRun(plan(spark))

  def run(spark: SparkSession, sink: DataFrame => Unit): Unit =
    if (dryRun) println(explain(spark)) else sink(plan(spark))

  def load(spark: SparkSession, cfg: Loader.LoadConfig): Unit =
    if (dryRun) println(explain(spark)) else Loader.load(spark, plan(spark), cfg)
}

object Pipeline {
  def fromParquet(dir: String, table: String): Pipeline =
    Pipeline(spark => spark.read.parquet(s"$dir/$table.parquet"))

  def fromSql(sql: String): Pipeline = Pipeline(_.sql(sql))
}
