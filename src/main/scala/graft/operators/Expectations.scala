package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality expectation checks — the validation gate a pipeline
  * runs before publishing a table (the Great-Expectations pattern as a
  * plain Spark aggregate).
  *
  * Every rule is a row-local predicate compiled into ONE conditional
  * count inside a single global aggregate: checking 50 rules over
  * 100 TB costs exactly one scan and one 1-row exchange, not 50 jobs.
  * A predicate evaluating to NULL (unknown) counts as a violation —
  * strict by design, so a null-polluted column cannot pass a range
  * rule by three-valued-logic accident.
  */
object Expectations {

  /** `predicate` must be TRUE for a conforming row. */
  final case class Expectation(name: String, predicate: Column)

  /** One (rule, n_rows, n_violations, pass) row per expectation;
    * `pass` = 1 when no row violates.
    */
  def check(df: DataFrame, rules: Seq[Expectation]): DataFrame = {
    require(rules.nonEmpty, "need at least one expectation")
    require(rules.map(_.name).distinct.size == rules.size, "duplicate rule names")
    // coalesce: sum over ZERO rows is null — an empty table must report
    // vacuous passes (0 violations), not NPE the driver read
    val aggs = rules.map(r =>
      coalesce(sum(when(r.predicate, 0L).otherwise(1L)), lit(0L)).as(r.name))
    val row = df.agg(count(lit(1)).as("__n"), aggs: _*).head()
    val n = row.getLong(0)
    val spark = df.sparkSession
    import spark.implicits._
    rules.zipWithIndex.map { case (r, i) =>
      val v = row.getLong(i + 1)
      (r.name, n, v, if (v == 0L) 1 else 0)
    }.toDF("rule", "n_rows", "n_violations", "pass")
  }
}
