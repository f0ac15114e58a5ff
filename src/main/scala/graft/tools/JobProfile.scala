package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

import graft.{GraftSession, SparkEntry}

/** Per-JOB wall-clock profiler for a single declared query (guide §1:
  * measure first, empirically). The bench medians say WHICH query is
  * slow; this says WHERE inside it the seconds go — each Spark job's
  * duration, task count, and the name/callsite of its first stage, so a
  * 10 s query decomposes into "0.4 s shingle persist + 2.1 s collapse
  * window + ..." instead of one opaque number.
  *
  * Usage: runMain graft.tools.JobProfile <query> [query ...]
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32).
  * Each query runs twice; the second (warm) run is the one reported —
  * same steady-state the bench medians measure.
  */
object JobProfile {

  private final case class JobRec(
      id: Int, start: Long, var end: Long = -1L,
      desc: String, stages: Seq[String], var nTasks: Int = 0)

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: JobProfile <query> [query ...]")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.tuned(
        SparkSession.builder().master(s"local[$cpus]"), cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobs = mutable.ArrayBuffer.empty[JobRec]
    val taskCounts = mutable.Map.empty[Int, Int] // stageId -> tasks
    val stageToJob = mutable.Map.empty[Int, Int]
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = synchronized {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
        val stages = js.stageInfos.map(si => s"${si.stageId}:${si.name.takeWhile(_ != '\n')}")
        js.stageIds.foreach(sid => stageToJob(sid) = js.jobId)
        jobs += JobRec(js.jobId, js.time, desc = desc, stages = stages.toSeq)
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = synchronized {
        jobs.find(_.id == je.jobId).foreach(_.end = je.time)
      }
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = synchronized {
        taskCounts(te.stageId) = taskCounts.getOrElse(te.stageId, 0) + 1
      }
    }

    args.foreach { q =>
      val fn = SparkEntry.queries.getOrElse(q, sys.error(s"unknown query: $q"))
      // warm run: plans analyzed, codegen compiled, JIT warm
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      spark.catalog.clearCache()
      graft.operators.Par.sweepBlocks(spark)

      jobs.clear(); taskCounts.clear(); stageToJob.clear()
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // let the listener bus drain
      spark.sparkContext.removeSparkListener(listener)

      println(f"== $q%s wall=$wall%.2fs jobs=${jobs.size}%d ==")
      var prevEnd = -1L
      jobs.sortBy(_.start).foreach { j =>
        val dur = if (j.end > 0) (j.end - j.start) / 1e3 else -1.0
        val gap = if (prevEnd > 0) (j.start - prevEnd) / 1e3 else 0.0
        prevEnd = if (j.end > 0) j.end else prevEnd
        val nt = j.stages.map(_.takeWhile(_ != ':').toInt)
          .map(taskCounts.getOrElse(_, 0)).sum
        val head = if (j.desc.nonEmpty) j.desc else j.stages.take(3).mkString(" | ")
        println(f"  job ${j.id}%3d ${dur}%7.2fs gap=${gap}%6.2fs tasks=$nt%4d  $head")
      }
      val tracked = jobs.filter(_.end > 0)
      val jobSum = tracked.map(j => (j.end - j.start) / 1e3).sum
      println(f"  sum(job walls)=$jobSum%.2fs (gaps = driver-side planning/actions)")
      spark.catalog.clearCache()
      graft.operators.Par.sweepBlocks(spark)
    }
    spark.stop()
  }
}
