package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Weighted PageRank by fixed-iteration power method (Page et al. 1999)
  * over an edge DataFrame — the standard importance score for entity /
  * source graphs in curation pipelines (e.g. rank domains by link mass
  * before sampling training documents).
  *
  * Scale shape: each iteration is one equi-join of the rank vector
  * against the out-normalized edge list (both hash-partitioned on the
  * src key — co-partitioned across iterations since the edge list is
  * persisted once) followed by a groupBy on dst with partial
  * aggregation. Lineage is cut per iteration with [[Par.cut]] (a
  * reliable checkpoint when the session has a checkpoint dir, else
  * eager localCheckpoint) so the plan stays O(1) deep instead of
  * O(iterations). The only
  * driver-side scalar is the node count (one count job).
  *
  * Semantics: teleport (1-d)/n to every node; dangling-node mass is
  * dropped, not redistributed (ranks then sum to < 1 if sinks exist) —
  * the common simplification; callers needing stochastic completeness
  * add self-loops upstream.
  */
object PageRank {

  /** edges: (src, dst, w ≥ 0). Returns (node, rank) for every node
    * appearing as a src or dst. `iterations` fixed (no convergence
    * probe — deterministic cost and output).
    */
  def run(edges: DataFrame, iterations: Int = 10, damping: Double = 0.85): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    val e = edges.select(col("src"), col("dst"), col("w").cast("double").as("w"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
    val outW = e.groupBy("src").agg(sum("w").as("wout"))
    val norm = e.join(outW, "src")
      .select(col("src"), col("dst"), (col("w") / col("wout")).as("p"))
      .persist(StorageLevel.MEMORY_AND_DISK) // reused every iteration
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = nodes.count()
    var ranks = nodes.withColumn("rank", lit(1.0 / n))
    for (_ <- 1 to iterations) {
      // Par.cut is eager: the new rank vector is materialized before the
      // old one's blocks are freed
      val next = Par.cut(nodes.join(
          norm.join(ranks, col("src") === col("node"))
            .groupBy(col("dst"))
            .agg(sum(col("rank") * col("p")).as("inflow")),
          col("node") === col("dst"), "left")
        .select(col("node"),
          (lit((1 - damping) / n) + lit(damping) * coalesce(col("inflow"), lit(0.0))).as("rank")))
      freeCheckpoint(ranks)   // no-op on the first (non-checkpointed) rank vector
      ranks = next
    }
    norm.unpersist()
    nodes.unpersist()
    ranks
  }

  /** Release a prior iteration's cut (blocks + any reliable
    * checkpoint files) via [[Par.free]]; safe no-op on
    * non-checkpointed frames. */
  private def freeCheckpoint(df: DataFrame): Unit = Par.free(df)
}
