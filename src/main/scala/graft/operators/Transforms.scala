package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import scala.util.{Failure, Success, Try}

/** T1-T4 — the transform surface (SURVEY.md §2.3).
  *
  * The reference's `Transformer.transform_impl(row)` is an opaque
  * per-row Python hook (`transformer.py:11-16`); that design forces
  * row-at-a-time interpretation. Here the *preferred* surface is Column
  * expressions (whole-stage-codegen'd, vectorizable); `mapRows`/`flatMapRows`
  * exist as the typed escape hatch for genuinely opaque logic, and the
  * quarantine wrapper reproduces T4's log-and-skip row error handling
  * without ever stopping the job.
  */
object Transforms {

  type Stage = DataFrame => DataFrame

  /** Compose stages left-to-right — the `Source |> T |> Sink` pipe. */
  def pipe(stages: Stage*): Stage = stages.reduceLeft(_ andThen _)

  /** T1 — declarative row map: add/replace derived columns. */
  def derive(cols: (String, Column)*): Stage =
    df => cols.foldLeft(df) { case (d, (n, c)) => d.withColumn(n, c) }

  /** T2 — filter-by-transform (reference drops rows whose transform
    * returns falsy, `handler/base.py:32-37`).
    */
  def where(cond: Column): Stage = _.filter(cond)

  /** T3 — JSON extract + flatten: the reference's signature transform
    * ("extracting data from json and flatten each row into rows",
    * README.md:24-28). Parse `jsonCol` with an explicit schema, explode
    * nothing if scalar; `explodeArray` handles the row→rows case.
    */
  def jsonExtract(jsonCol: String, schema: StructType, as: String = "j"): Stage =
    _.withColumn(as, from_json(col(jsonCol), schema))

  /** T3 — row → rows on an array column (reference: transform returning a
    * list, every element emitted, `handler/csv_handler.py:80-90`).
    */
  def explodeArray(arrayCol: String, as: String): Stage =
    _.withColumn(as, explode(col(arrayCol)))

  /** T1 escape hatch — typed per-row map (the pluggable row-factory /
    * Transformer extension point). Use only for logic Column exprs can't
    * express: breaks codegen fusion at this stage boundary.
    */
  def mapRows[T: Encoder, U: Encoder](ds: Dataset[T])(f: T => U): Dataset[U] = ds.map(f)

  def flatMapRows[T: Encoder, U: Encoder](ds: Dataset[T])(f: T => IterableOnce[U]): Dataset[U] =
    ds.flatMap(f)

  /** T4 — error-tolerant transform: rows whose transform throws are routed
    * to a quarantine side (reference logs-and-skips, `handler/base.py:32-44`).
    * Returns (good, quarantined-with-error). Distributed: the Try runs
    * inside the task; nothing is collected.
    */
  def quarantine[T: Encoder, U: Encoder](ds: Dataset[T])(f: T => U)(
      implicit e: Encoder[(Option[U], Option[String])]): (Dataset[U], Dataset[String]) = {
    val attempted = ds.map { t =>
      Try(f(t)) match {
        case Success(u)  => (Option(u), Option.empty[String])
        case Failure(ex) => (Option.empty[U], Option(s"${ex.getClass.getName}: ${ex.getMessage}"))
      }
    }
    import ds.sparkSession.implicits._
    val cached = attempted.persist()
    (cached.flatMap(_._1), cached.flatMap(_._2))
  }

  /** T6 — observe-based row metrics (reference: counter + log every 10k
    * rows, `dumper/worker.py:73-80`). `df.observe` aggregates on the
    * executors with zero extra pass; read via QueryExecutionListener.
    */
  def observed(name: String)(df: DataFrame): DataFrame =
    df.observe(name, count(lit(1)).as("rows"))

  /** T6 with a handle: `Observation.get` blocks until the first action
    * over the returned frame finishes, then yields the metric map —
    * the reference's end-of-dump row count ("took %s", worker.py:73-80)
    * without a listener registration.
    */
  def observed(obs: org.apache.spark.sql.Observation)(df: DataFrame): DataFrame =
    df.observe(obs, count(lit(1)).as("rows"))
}
