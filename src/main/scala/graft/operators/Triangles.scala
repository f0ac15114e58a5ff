package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Exact triangle counting / global clustering coefficient on an
  * undirected simple graph, via degree-ordered orientation (Suri &
  * Vassilvitskii, "Counting triangles and the curse of the last
  * reducer", WWW'11).
  *
  * Scale shape: every edge is directed from its lower-(degree, id)
  * endpoint to the higher one, which bounds every out-degree by
  * O(√m); the wedge self-join then costs Σ d_out(v)² = O(m^1.5)
  * worst-case instead of the Σ deg(v)² of a naive id-ordered join —
  * on a power-law graph the difference is the job finishing or not
  * (the "last reducer" holding a celebrity vertex's quadratic wedge
  * set). All joins are equi-joins on vertex ids; the closure probe
  * joins wedges back against the canonical edge set on the (least,
  * greatest) pair. Nothing is collected to the driver.
  */
object Triangles {

  /** One-row graph summary: `n_nodes`, `n_edges`, `n_wedges` (unordered
    * vertex-centered paths, open + closed), `n_triangles`, and
    * `global_cc` = 3·triangles / wedges. Input edges are canonicalized
    * (self-loops dropped, (a,b) ↔ (b,a) and duplicates collapsed), so
    * any raw pair list is accepted.
    */
  def stats(
      edges: DataFrame, aCol: String, bCol: String,
      broadcastEdgeLimit: Long = 20L * 1000 * 1000): DataFrame = {
    val e = edges
      .select(least(col(aCol), col(bCol)).as("a"), greatest(col(aCol), col(bCol)).as("b"))
      .filter(col("a") < col("b")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    // the edge count also feeds the broadcast decision below; one job
    // over the persisted frame, reused by the final edgeAgg
    val m = e.count()
    // degree table is |V|-sized (≤ 2m): broadcast into the orientation
    // only while the edge count says it fits — a billion-vertex graph
    // would OOM the driver on an unconditional broadcast; past the
    // limit the orientation joins fall back to shuffles on the vertex
    // key, same policy as adjSide below
    // persisted: three consumers (both orientation joins and nodeAgg)
    // would otherwise each re-run the 2m-row degree aggregate
    val degBase = e.select(col("a").as("v")).union(e.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("deg"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val deg = if (m <= broadcastEdgeLimit) broadcast(degBase) else degBase
    val withDeg = e
      .join(deg.select(col("v").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("v").as("b"), col("deg").as("db")), "b")
    val srcFirst = col("da") < col("db") || (col("da") === col("db") && col("a") < col("b"))
    val oriented = withDeg.select(
        when(srcFirst, col("a")).otherwise(col("b")).as("src"),
        when(srcFirst, col("b")).otherwise(col("a")).as("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // edge-iterator closure count: a triangle's orientation order is
    // acyclic (total on (deg, id)), so {u→v, u→w, v→w} is counted
    // EXACTLY once — at its lowest edge (u,v), as w ∈ N⁺(u) ∩ N⁺(v).
    // Out-adjacency lists are O(√m)-bounded by the orientation, the
    // intersection runs inside one codegen'd map stage, and the
    // Σ-d_out²-sized wedge relation of the join formulation is never
    // materialized or shuffled at all. The adjacency table (m entries
    // across |V| rows) broadcasts while it fits; past the limit the
    // two joins fall back to shuffles on the vertex key.
    val adj = oriented.groupBy(col("src")).agg(collect_list(col("dst")).as("nbrs"))
    val adjSide = if (m <= broadcastEdgeLimit) broadcast(adj) else adj
    val closures = closureCounts(oriented, adjSide)
    // three one-row aggregates crossed together (broadcast-trivial);
    // Σ deg·(deg−1) sums as DECIMAL and halves with integer `div` —
    // double division would silently round past 2^53, exactly the
    // regime a celebrity vertex reaches
    val nodeAgg = degBase.agg(count(lit(1)).as("n_nodes"),
      expr("CAST(sum(CAST(deg AS DECIMAL(38,0)) * (deg - 1)) div 2 AS BIGINT)")
        .as("n_wedges"))
    val triAgg = closures.agg(coalesce(sum(col("nc")), lit(0L)).as("n_triangles"))
    // explicit double casts: a bare `3.0` literal is DECIMAL in both
    // Spark and DuckDB SQL, and their decimal division semantics differ
    // n_edges = m, already counted on the persisted canonical edge set —
    // a separate e.agg(count) job re-scanned the cache for a known scalar
    val out = nodeAgg.crossJoin(triAgg)
      .withColumn("n_edges", lit(m))
      .withColumn("global_cc",
        expr("round(CAST(3 * n_triangles AS DOUBLE) / CAST(n_wedges AS DOUBLE), 6)"))
      .select("n_nodes", "n_edges", "n_wedges", "n_triangles", "global_cc")
    // the result is a single summary row: materialize it eagerly so the
    // two cached frames can be RELEASED here (a lazy return would leak
    // them for the session — the Components/PageRank discipline)
    val row = out.collect()
    val result = edges.sparkSession.createDataFrame(
      java.util.Arrays.asList(row: _*), out.schema)
    e.unpersist()
    degBase.unpersist()
    oriented.unpersist()
    result
  }

  /** Per-edge closure counts {u→v: |N⁺(u) ∩ N⁺(v)|}: two vertex-keyed
    * joins with the intersection in the projection — the Σ-d_out²-sized
    * wedge relation of the join formulation never exists as a plan
    * node. Package-private so PlanShapeSpec can pin that shape.
    */
  private[graft] def closureCounts(oriented: DataFrame, adjSide: DataFrame): DataFrame =
    oriented
      .join(adjSide.select(col("src").as("__u"), col("nbrs").as("nu")),
        col("src") === col("__u"), "left")
      .join(adjSide.select(col("src").as("__v"), col("nbrs").as("nv")),
        col("dst") === col("__v"), "left")
      // nu is never null (N⁺(u) holds this edge's own v); nv is null for
      // sink vertices — zero common out-neighbors by definition
      .select(when(col("nv").isNull, lit(0L))
        .otherwise(size(array_intersect(col("nu"), col("nv"))).cast("long")).as("nc"))
}
