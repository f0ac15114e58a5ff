package graft.operators

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
  * Lineage is cut per round with localCheckpoint (swap for
  * `checkpoint` + a checkpoint dir on a real cluster).
  */
object Components {

  /** (id, component) for every vertex, component = min id reachable.
    * `vertices` (single id column, any name) adds isolated nodes that
    * appear in no edge — they map to themselves.
    */
  def connectedComponents(
      edges: DataFrame, srcCol: String, dstCol: String,
      vertices: Option[DataFrame] = None, maxIter: Int = 25): DataFrame = {
    val idT = edges.schema(srcCol).dataType
    // normalize: undirected, deduped, self-loops dropped
    var e = edges
      .select(least(col(srcCol), col(dstCol)).cast(idT).as("dst"),
              greatest(col(srcCol), col(dstCol)).cast(idT).as("src"))
      .where(col("src") =!= col("dst"))
      .distinct()
      .localCheckpoint(true)

    var prev = checksum(e)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val next = smallStar(largeStar(e)).localCheckpoint(true)
      val cur = checksum(next)
      e.unpersist()
      e = next
      converged = cur == prev
      prev = cur
      iter += 1
    }

    // at the fixpoint every non-root points straight at its component
    // min; groupBy(min) also makes pre-convergence output well-defined
    val labels = e.groupBy(col("src").as("id")).agg(min("dst").as("component"))
    val vs = {
      val fromEdges = edges.select(col(srcCol).as("id"))
        .union(edges.select(col(dstCol).as("id")))
      vertices.map(v => fromEdges.union(v.toDF("id"))).getOrElse(fromEdges)
    }.distinct()
    vs.join(labels, Seq("id"), "left")
      .select(col("id"), coalesce(col("component"), col("id")).as("component"))
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
