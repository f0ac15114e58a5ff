package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed vector aggregation over `array<float>` embedding columns
  * — the building block of k-means / IVF-quantizer training and
  * per-group prototype computation at corpus scale.
  *
  * Scale shape: the vector is exploded to (group, dim, value) rows, so
  * the mean is an ordinary partial-aggregatable groupBy on a narrow
  * composite key — no per-group state holds a whole vector, no driver
  * collect, and skewed groups split like any other aggregate under AQE.
  * The per-group re-assembly (collect dims, sort, project values) runs
  * on `groups × dim` rows — trivially small next to the corpus.
  */
object Embeddings {

  /** Per-group element-wise mean vector. Output: (groupCol,
    * centroid array<double>), dimensions averaged independently.
    */
  def centroids(df: DataFrame, groupCol: String, vecCol: String): DataFrame =
    centroidDims(df, groupCol, vecCol)
      .groupBy(col(groupCol))
      .agg(array_sort(collect_list(struct(col("pos"), col("value")))).as("__dm"))
      .select(col(groupCol),
        transform(col("__dm"), x => x.getField("value")).as("centroid"))

  /** Per-group per-dimension mean as scalar rows (groupCol, pos, value)
    * — the shuffle-friendly long form; `centroids` re-assembles it.
    * 0-based `pos` matches Spark's `posexplode`.
    */
  def centroidDims(df: DataFrame, groupCol: String, vecCol: String): DataFrame =
    df.select(col(groupCol), posexplode(col(vecCol)).as(Seq("pos", "__v")))
      .groupBy(col(groupCol), col("pos"))
      .agg(avg(col("__v")).as("value"))

  /** Cross-engine-REPRODUCIBLE nearest-centroid assignment: squared-L2
    * distances accumulated as exact decimals (each (x−c)² double is
    * cast to DECIMAL(38,18) before summing, so the total is independent
    * of summation order — the non-associativity of double addition is
    * what makes `IvfSearch.trainKMeans` honestly non-deterministic),
    * argmin tie-broken by cluster id. `centroids` must be pre-rounded
    * (see `lloydIterExact`) so both engines compare against
    * bit-identical prototypes. Map-side only: the centroid table rides
    * into the closure as a literal.
    *
    * Input-magnitude contract: decimal(28,18) holds 10 integer digits,
    * so each squared distance must stay < 1e10 (embedding coordinates
    * roughly |x| < 3e4 at dim ~1k — every real embedding space is
    * orders of magnitude inside this). Overflow casts to NULL under
    * non-ANSI mode, and a null distance would sort FIRST in array_min —
    * silently assigning the wrong cluster — so a null distance (from
    * overflow, a null vector, or a null element) raises instead.
    */
  def assignExact(vec: Column, centroids: Seq[(Int, Array[Double])]): Column = {
    // Interpreted REFERENCE formulation (k·dim boxed decimal HOF ops per
    // row — it is the decimal fold the DuckDB oracle mirrors, in Column
    // form); production paths use the bit-identical compiled twin
    // [[graft.functions.NativeHash.assignExact]] — NativeHashSpec pins
    // the two equal.
    // scale 18 with headroom precision: (28,18)+(28,18) promotes to
    // (29,18) — same scale, so the cast back to the accumulator type is
    // lossless (at precision 38 Spark would CAP and shave the scale)
    val zero = lit(new java.math.BigDecimal(0)).cast("decimal(28,18)")
    val dists = centroids.map { case (cid, c) =>
      val d2 = aggregate(
        zip_with(vec, typedLit(c), (x, cc) => (x - cc) * (x - cc)),
        zero,
        (acc, d) => (acc + d.cast("decimal(28,18)")).cast("decimal(28,18)"))
      // overflow guard via coalesce, NOT when(d2.isNull, …).otherwise(d2):
      // CaseWhen evaluates the branch predicate and the otherwise arm
      // separately, so the interpreted decimal fold would run TWICE per
      // centroid per row (measured 2× on the kmeans_iter gate); coalesce
      // evaluates d2 once and only reaches raise_error on null
      val d2Checked = coalesce(d2, raise_error(lit(
        s"assignExact: null squared distance to cluster $cid — decimal(28,18) " +
          "overflow (squared distance must stay < 1e10) or null vector/element"))
        .cast("decimal(28,18)"))
      struct(d2Checked.as("d"), lit(cid).as("cid"))
    }
    array_min(array(dists: _*)).getField("cid")
  }

  /** SemDeDup-style semantic dedup (Abbas et al., arXiv:2303.09540,
    * the LAION curation method): partition the corpus by nearest
    * centroid, then drop every document that has a SMALLER-id neighbor
    * in the same cluster with cosine ≥ `threshold`. Output: the kept
    * rows as (id, cluster).
    *
    * This is the embedding-space sibling of the MinHash family, and the
    * clustering is the entire scale argument: all-pairs cosine is
    * Ω(n²), but within-cluster pairs cost Σ_c |c|² on a co-partitioned
    * equi-join over the cluster id — at 100 TB you grow k with the
    * corpus so |c| stays bounded, exactly how the paper runs it on
    * LAION. A runaway cluster is the method's known failure mode and
    * shows up as one skewed join key; AQE skew-join splits it, and the
    * fix is a larger k, not a different plan.
    *
    * Determinism, cross-engine: assignment is [[assignExact]] over
    * pre-rounded centroids (decimal-exact distances, id tie-break), and
    * cosine is [[graft.functions.Vectors.cosine]]'s left-to-right
    * double fold — the same evaluation order DuckDB's
    * list_cosine_similarity uses, the established `cosine_near_dup`
    * contract. The keep rule (min-id representative per ε-neighborhood,
    * rather than the paper's random/centroid-distance pick) makes the
    * kept set a pure function of the data.
    *
    * The assigned frame is cut eagerly: three consumers (both join
    * sides + the anti-join probe) would otherwise re-run assignment
    * k·dim decimal folds per row each — and the blocks are narrow
    * (id, vec, cluster).
    */
  def semanticDedup(
      vecs: DataFrame, idCol: String, vecCol: String,
      centroids: Seq[(Int, Array[Double])],
      threshold: Double): DataFrame = {
    val assigned = Par.cut(Par.widen(vecs)
      .select(col(idCol).as("id"), col(vecCol).as("__v"))
      .withColumn("cluster",
        graft.functions.NativeHash.assignExact(col("__v"), centroids)))
    val dupIds = assigned.as("a").join(assigned.as("b"),
        col("a.cluster") === col("b.cluster") && col("a.id") < col("b.id"))
      .where(graft.functions.Vectors.cosine(col("a.__v"), col("b.__v"))
        >= threshold)
      .select(col("b.id").as("id")).distinct()
    // seal (the ClusterDedup/OverlapJoin discipline): cut the narrow
    // final output, then release the assigned cut's blocks — without
    // the free, every invocation in a long-lived session parks a
    // corpus-sized (id, vec, cluster) frame in the block manager until
    // a Par.sweepBlocks or session end
    val out = Par.cut(assigned.join(dupIds, Seq("id"), "left_anti")
      .select(col("id"), col("cluster")))
    Par.free(assigned)
    out
  }

  /** One exact Lloyd iteration: assign with `assignExact`, recompute
    * per-cluster per-dim means from DECIMAL-exact sums (one double
    * division of order-free operands — plain avg() would re-admit the
    * partition-summation-order dependence assignExact exists to kill),
    * ROUND to 6 dp (the cross-engine contract: the next iteration's
    * inputs are bit-identical on any engine reproducing the rounded
    * means), and collect the k×dim table (bounded — same driver-side
    * posture as IvfSearch's quantizer training). Clusters that lose
    * all members drop out (k may shrink).
    */
  def lloydIterExact(
      vecs: DataFrame, vecCol: String,
      centroids: Seq[(Int, Array[Double])]): Seq[(Int, Array[Double])] = {
    val assigned = vecs.select(
      graft.functions.NativeHash.assignExact(col(vecCol), centroids).as("cluster"), col(vecCol))
    assigned.select(col("cluster"), posexplode(col(vecCol)).as(Seq("pos", "__v")))
      .groupBy(col("cluster"), col("pos"))
      .agg((sum(col("__v").cast("decimal(28,12)")).cast("double")
        / count(lit(1)).cast("double")).as("value"))
      .select(col("cluster"), col("pos"), round(col("value"), 6).as("value"))
      .collect()
      .groupBy(_.getInt(0))
      .map { case (cid, rows) =>
        val dims = rows.map(r => r.getInt(1) -> r.getDouble(2)).sortBy(_._1).map(_._2)
        cid -> dims.toArray
      }
      .toSeq.sortBy(_._1)
  }
}
