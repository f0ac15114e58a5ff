package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.ClusterDedup

/** Temporary stage profile of ClusterDedup.components at sf0.1 (see
  * verify skill: library-API probe mains live here and are deleted
  * after use). Mirrors the operator body stage by stage with timed
  * materializations.
  */
object ClusterProf12 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.tuned(
        SparkSession.builder().master("local[32]"), "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      private val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        starts.put(j.jobId, (System.nanoTime(),
          Option(j.properties).map(_.getProperty("callSite.short", "?")).getOrElse("?")))
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val s = starts.remove(j.jobId)
        if (s != null) {
          val sec = (System.nanoTime() - s._1) / 1e9
          if (sec > 0.5) println(f"JOB ${j.jobId}%4d ${sec}%7.2f s  ${s._2}")
        }
      }
    })
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def timed[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"PROF12 $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.1f s")
      r
    }
    timed("components e2e cold")(
      ClusterDedup.components(docs, "doc_id", "text", 2, 0.3).count())
    timed("components e2e warm")(
      ClusterDedup.components(docs, "doc_id", "text", 2, 0.3).count())
    timed("direct e2e")(
      graft.operators.Components.connectedComponents(
        graft.operators.JaccardDedup.nearDupPairs(docs, "doc_id", "text", 2, 0.3),
        "id_a", "id_b", Some(docs.select(col("doc_id")))).count())

    import graft.functions.{NativeHash, Text}
    import graft.operators.{Components, JaccardDedup, Par}
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val t = 0.3
    val unionCap = 1 << 15
    val hashed = Par.widen(docs)
      .select(col("doc_id").as("id"),
        NativeHash.shingleHashes(Text.tokens(col("text")), 2).as("__sh"))
      .select(col("id"), col("__sh"), coalesce(size(col("__sh")), lit(0)).as("n"))
      .persist(MEMORY_AND_DISK)
    println(s"PROF12 docs=${timed("shingle")(hashed.count())}")
    val nonEmpty = hashed.where(col("n") > 0)
    val docRep = nonEmpty.select(col("id"), min(col("id")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("__sh"))).as("rep"))
      .persist(MEMORY_AND_DISK)
    timed("collapse mat")(docRep.count())
    val reps = nonEmpty.join(docRep.where(col("id") === col("rep")).select("id"), Seq("id"))
      .persist(MEMORY_AND_DISK)
    println(s"PROF12 reps=${timed("reps mat")(reps.count())}")
    val buckets = reps.select(col("id"),
      posexplode(NativeHash.minhashBandBucketsHashed(col("__sh"), 64, 16))
        .as(Seq("band", "bucket")))
    val lshCand = buckets.select(col("band"), col("bucket"), col("id").as("id_a"))
      .join(buckets.select(col("band"), col("bucket"), col("id").as("id_b")),
        Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    val alphaOf = (na: String, nb: String) =>
      ceil((col(na) + col(nb)) * (t / (1.0 + t)) - lit(1e-9)).cast("int")
    val edges1 = lshCand
      .join(reps.select(col("id").as("id_a"), col("__sh").as("__sha"), col("n").as("n_a")), Seq("id_a"))
      .join(reps.select(col("id").as("id_b"), col("__sh").as("__shb"), col("n").as("n_b")), Seq("id_b"))
      .filter(greatest(col("n_a"), col("n_b")) * t <= least(col("n_a"), col("n_b")) + lit(1e-9))
      .withColumn("c", NativeHash.sortedIntersectAtLeast(col("__sha"), col("__shb"), alphaOf("n_a", "n_b")))
      .filter(col("c") >= 0)
      .filter(col("c") / (col("n_a") + col("n_b") - col("c")) >= t)
      .select("id_a", "id_b")
    val nbrMin = edges1.select(col("id_a").as("id"), col("id_b").as("nb"))
      .union(edges1.select(col("id_b").as("id"), col("id_a").as("nb")))
      .groupBy("id").agg(min("nb").as("__nbmin"))
    val repCluster = reps.select(col("id"))
      .join(nbrMin, Seq("id"), "left")
      .select(col("id"), least(col("id"), coalesce(col("__nbmin"), col("id"))).as("cl"))
      .persist(MEMORY_AND_DISK)
    timed("lsh+edges1+star mat")(repCluster.count())
    println(s"PROF12 clusters=${repCluster.select("cl").distinct().count()}")
    val index = reps.select(col("id"), explode(col("__sh")).as("s"), col("n"))
    val member = reps.join(repCluster, Seq("id")).persist(MEMORY_AND_DISK)
    val cStats = member.groupBy("cl")
      .agg(min("n").as("minN"), max("n").as("maxN"), count(lit(1)).as("nm"))
    val cpost = JaccardDedup.prefixIndex(index, "id", t)
      .join(repCluster, Seq("id"))
      .groupBy(col("s"), col("cl"))
      .agg(max(col("n") - col("pos")).as("mr"))
      .join(cStats, Seq("cl"))
      .persist(MEMORY_AND_DISK)
    timed("cpost mat")(cpost.count())
    val alphaMin = ceil((col("__mna") + col("__mnb")) * (t / (1.0 + t)) - lit(1e-9))
    val candCl = cpost.select(col("s").as("__sa"), col("cl").as("cl_a"), col("mr").as("__mra"),
        col("minN").as("__mna"), col("maxN").as("__mxa"), col("nm").as("__nma"))
      .join(cpost.select(col("s").as("__sb"), col("cl").as("cl_b"), col("mr").as("__mrb"),
          col("minN").as("__mnb"), col("maxN").as("__mxb"), col("nm").as("__nmb")),
        col("__sa") === col("__sb") && col("cl_a") < col("cl_b") &&
        least(col("__mxa"), col("__mxb")) + lit(1e-9) >=
          greatest(col("__mna"), col("__mnb")) * t &&
        lit(1) + least(col("__mra"), col("__mrb")) >= alphaMin)
      .select(col("cl_a"), col("cl_b"), col("__nma"), col("__nmb"))
      .distinct()
      .persist(MEMORY_AND_DISK)
    println(s"PROF12 candCl=${timed("candCl mat")(candCl.count())}")
    val exploded = member
      .join(cStats.where(col("nm") > 1).select("cl"), Seq("cl"))
      .select(col("cl"), explode(col("__sh")).as("s")).distinct()
      .persist(MEMORY_AND_DISK)
    val uSize = exploded.groupBy("cl").agg(count(lit(1)).as("usz"))
    val unions = exploded
      .join(uSize.where(col("usz") <= unionCap).select("cl"), Seq("cl"))
      .groupBy("cl").agg(sort_array(collect_list(col("s"))).as("u"))
    val pruned = candCl
      .join(cStats.select(col("cl").as("cl_a"), col("minN").as("minA")), Seq("cl_a"))
      .join(cStats.select(col("cl").as("cl_b"), col("minN").as("minB")), Seq("cl_b"))
      .join(unions.select(col("cl").as("cl_a"), col("u").as("u_a")), Seq("cl_a"), "left")
      .join(unions.select(col("cl").as("cl_b"), col("u").as("u_b")), Seq("cl_b"), "left")
      .filter((col("__nma") === 1 && col("__nmb") === 1) ||
        col("u_a").isNull || col("u_b").isNull ||
        NativeHash.sortedIntersectCount(col("u_a"), col("u_b")) >=
          greatest(col("minA"), col("minB")) * t - lit(1e-9))
      .select("cl_a", "cl_b")
    val crossEdges = pruned
      .join(member.select(col("cl").as("cl_a"), col("__sh").as("__sha"), col("n").as("n_a")), Seq("cl_a"))
      .join(member.select(col("cl").as("cl_b"), col("__sh").as("__shb"), col("n").as("n_b")), Seq("cl_b"))
      .filter(greatest(col("n_a"), col("n_b")) * t <= least(col("n_a"), col("n_b")) + lit(1e-9))
      .withColumn("c", NativeHash.sortedIntersectAtLeast(col("__sha"), col("__shb"), alphaOf("n_a", "n_b")))
      .filter(col("c") >= 0)
      .filter(col("c") / (col("n_a") + col("n_b") - col("c")) >= t)
      .select(col("cl_a"), col("cl_b")).distinct()
      .persist(MEMORY_AND_DISK)
    println("PROF12 === crossEdges plan ===")
    crossEdges.explain("formatted")
    println(s"PROF12 crossEdges=${timed("prune+verify mat")(crossEdges.count())}")
    val clComp = timed("cc final")(
      Components.connectedComponents(crossEdges, "cl_a", "cl_b")
        .select(col("id").as("cl"), col("component")))
    val labeled = docRep.select(col("id"), col("rep"))
      .join(repCluster.select(col("id").as("rep"), col("cl")), Seq("rep"))
      .join(clComp, Seq("cl"), "left")
      .select(col("id"), coalesce(col("component"), col("cl")).as("component"))
    val isolated = hashed.where(col("n") === 0)
      .select(col("id"), col("id").as("component"))
    val out = timed("labels+cut mat")(Par.cut(labeled.union(isolated)))
    println(s"PROF12 out=${out.count()}")
    spark.stop()
  }
}
