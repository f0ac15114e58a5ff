package graft.operators

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over a pair/edge list — the step a
  * real dedup pipeline needs after near-dup pair generation: pairs are
  * edges, a duplicate *cluster* is a connected component, and the kept
  * ("canonical") document is the component minimum.
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14). Each round
  * is two narrow-key groupBy+join passes over the edge list; the edge
  * set contracts toward a forest of stars rooted at each component's
  * minimum id in O(log^2 n) rounds. Scale shape: no driver-side graph,
  * no per-node adjacency state — every step is an ordinary shuffle on
  * node ids, so 10^11-edge pair sets partition like any other join.
  * Lineage is cut per round with [[Par.cut]]: a RELIABLE
  * `checkpoint()` when the session has a checkpoint dir (the
  * production setting — survives executor loss), else eager
  * localCheckpoint.
  */
object Components {

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** (id, component) for every vertex, component = min id reachable.
    * `vertices` (single id column, any name) adds isolated nodes that
    * appear in no edge — they map to themselves.
    *
    * Adaptive execution (same idea as AQE's broadcast threshold): when
    * the deduped edge set fits `localThreshold` rows (default 2²⁰ ≈
    * ~16 MB of id pairs — a bounded driver collect, like the IVF
    * centroid sample), a driver union-find labels it in one pass
    * instead of paying several distributed alternation rounds. Dedup
    * pair graphs are usually corpus-tiny; the distributed path is the
    * 100 TB posture and is what larger graphs get automatically.
    */
  def connectedComponents(
      edges: DataFrame, srcCol: String, dstCol: String,
      vertices: Option[DataFrame] = None, maxIter: Int = 25,
      localThreshold: Long = 1L << 20): DataFrame = {
    val idT = edges.schema(srcCol).dataType
    // the edge input is often an expensive subtree (e.g. a near-dup
    // pair pipeline); persist so normalization and vertex extraction
    // evaluate it exactly once
    val in = edges.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // normalize: undirected, deduped, self-loops dropped
    var e = in
      .select(least(col(srcCol), col(dstCol)).cast(idT).as("dst"),
              greatest(col(srcCol), col(dstCol)).cast(idT).as("src"))
      .where(col("src") =!= col("dst"))
      .distinct()
    e = Par.cut(e)

    var prev = checksum(e)
    val labels =
      if (prev._1 <= localThreshold) { val l = localLabels(e, idT); freeCheckpoint(e); l }
      else {
        var iter = 0
        var converged = false
        while (!converged && iter < maxIter) {
          val next = Par.cut(smallStar(largeStar(e)))
          val cur = checksum(next)
          freeCheckpoint(e)
          e = next
          converged = cur == prev
          prev = cur
          iter += 1
        }
        if (!converged)
          log.warn(s"connectedComponents: edge-set checksum did not converge in $maxIter " +
            "alternation rounds — labels below are the groupBy-min of the last edge set " +
            "and may split components; raise maxIter")
        // at the fixpoint every non-root points straight at its component
        // min; groupBy(min) also makes pre-convergence output well-defined
        e.groupBy(col("src").as("id")).agg(min("dst").as("component"))
      }
    val vs = {
      // one pass over the cached input (a union of two selects would
      // re-scan it twice); raw edges, so self-loop-only nodes survive
      val fromEdges = in.select(
        explode(array(col(srcCol).cast(idT), col(dstCol).cast(idT))).as("id"))
      vertices.map(v => fromEdges.union(v.toDF("id"))).getOrElse(fromEdges)
    }.distinct()
    // materialize the (vertex-sized) result so every intermediate
    // checkpoint — the per-round edge sets above plus the final
    // fixpoint — can be freed NOW instead of lingering until RDD GC;
    // the one surviving checkpoint is the result itself. The vertex
    // union stays LAZY inside this one cut (r17): a separate eager vs
    // cut was a whole extra job per call, and the input cache is only
    // dropped after the cut has materialized everything it reads.
    val out = Par.cut(vs.join(labels, Seq("id"), "left")
      .select(col("id"), coalesce(col("component"), col("id")).as("component")),
      "components: labels out")
    in.unpersist()
    freeCheckpoint(e)
    out
  }

  /** Release a prior iteration's cut (blocks + any reliable
    * checkpoint files) via [[Par.free]]; safe no-op on
    * non-checkpointed frames. */
  private def freeCheckpoint(df: DataFrame): Unit = Par.free(df)

  /** Driver union-find over a bounded edge list. Union-by-min with path
    * compression: the smaller id always stays root, so each final root
    * IS its component's minimum.
    */
  private def localLabels(e: DataFrame, idT: org.apache.spark.sql.types.DataType): DataFrame = {
    val spark = e.sparkSession
    val parent = scala.collection.mutable.HashMap.empty[Any, Any]
    def find(x: Any): Any = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      // path compression
      var c = x
      while (parent.getOrElse(c, c) != r) { val nxt = parent(c); parent(c) = r; c = nxt }
      r
    }
    @inline def lt(a: Any, b: Any): Boolean =
      a.asInstanceOf[Comparable[Any]].compareTo(b) < 0
    e.collect().foreach { row =>
      val (a, b) = (row.get(0), row.get(1))
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) {
        if (lt(ra, rb)) parent(rb) = ra else parent(ra) = rb
      } else parent.getOrElseUpdate(a, a) // ensure singletons registered
    }
    val rows = parent.keysIterator.map(x =>
      org.apache.spark.sql.Row(x, find(x))).toSeq
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", idT),
      org.apache.spark.sql.types.StructField("component", idT)))
    spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](rows.asJava), schema)
  }

  /** Large-star: every node u links each strictly-larger neighbor to
    * the minimum of its closed neighborhood min(N(u) ∪ {u}).
    */
  private def largeStar(e: DataFrame): DataFrame = {
    val b = bidir(e)
    val m = b.groupBy("src").agg(least(min("dst"), first("src")).as("m"))
    b.join(m, "src")
      .where(col("dst") > col("src"))
      .select(col("dst").as("src"), col("m").as("dst"))
      .where(col("src") =!= col("dst"))
      .distinct()
  }

  /** Small-star: orient edges toward smaller ids; every node links its
    * smaller neighbors (and itself) to the smallest of them.
    */
  private def smallStar(e: DataFrame): DataFrame = {
    val o = bidir(e).where(col("dst") < col("src"))
    val m = o.groupBy("src").agg(min("dst").as("m"))
    val nbrs = o.join(m, "src")
      .where(col("dst") =!= col("m"))
      .select(col("dst").as("src"), col("m").as("dst"))
    val self = m.select(col("src"), col("m").as("dst"))
    nbrs.union(self).where(col("src") =!= col("dst")).distinct()
  }

  private def bidir(e: DataFrame): DataFrame =
    e.select(col("src"), col("dst"))
      .union(e.select(col("dst").as("src"), col("src").as("dst")))

  /** Order-insensitive edge-set fingerprint: one tiny agg job per round
    * (the input is checkpointed, so this re-reads cached blocks).
    * XOR, not SUM — overflow-free under ANSI, and the rows are distinct
    * so XOR cancellation of duplicate rows can't occur.
    */
  private def checksum(e: DataFrame): (Long, Long) = {
    val r = e.agg(count(lit(1)), bit_xor(xxhash64(col("src"), col("dst")))).head()
    (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
  }
}
