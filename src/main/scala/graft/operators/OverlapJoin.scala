package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.NativeHash

/** Absolute set-overlap join (|A∩B| ≥ k pairs) with a
  * replication-proof candidate path — the [[ClusterDedup]] treatment
  * applied to [[JaccardDedup.overlapJoin]]'s semantics.
  *
  * The direct operator's prefix self-join costs Σ_e df(e)² over prefix
  * element frequencies. On boilerplate-heavy corpora g near-identical
  * copies multiply every df by g → candidates grow g² (the r13 10×
  * soak measured 29.7× wall on 10× data — the one super-linear query
  * in the suite). Here candidates are generated at CLUSTER granularity
  * and only verified member pairs pay doc-level work:
  *
  *   1. EXACT-SET COLLAPSE — docs with identical element sets share
  *      identical overlaps against everything; each group contracts to
  *      its min-id representative and fans back out at the end
  *      (intra-group pairs have overlap = |set| ≥ k by the size
  *      filter, so every one qualifies).
  *   2. LSH STAR CONTRACTION — MinHash band buckets over
  *      representatives; bucket pairs are exact-verified at overlap ≥ k
  *      and each rep contracts to min(id, min verified neighbor).
  *      Unlike the Jaccard-components case no semantic validity is
  *      needed: ANY partition of reps is correct (steps 3-5 enumerate
  *      all cluster pairs losslessly and verify every member pair) —
  *      clustering quality only buys pruning power.
  *   3. CLUSTER POSTINGS — elements in ascending global document
  *      frequency (the PPJoin rarity order the direct operator's scale
  *      note calls for; the prefix proof needs only SOME fixed order):
  *      per doc the first n−k+1 elements, projected to (element,
  *      cluster) DISTINCT with the positional filter relaxed soundly
  *      to mr = max over members of (n − pos). g collapsed copies post
  *      each prefix element once — the g² term is gone.
  *   4. UNION BOUND — |A∩B| ≤ |U_A ∩ U_B| for the member-set unions,
  *      so a cluster pair whose unions share < k elements retires in
  *      one merge walk. Singleton-singleton pairs bypass (the bound
  *      walk IS the verify walk); over-`unionCap` unions skip the
  *      prune (bound unavailable ≠ bound failed).
  *   5. VERIFY — surviving cluster pairs expand to member pairs,
  *      intra-cluster member pairs are enumerated directly (they are
  *      output-shaped: the cluster exists because its members overlap),
  *      and every pair runs the same early-exit sorted merge walk as
  *      the direct operator. Results fan out through the collapse.
  *
  * Contract: `setCol` must be a sorted-distinct `array<long>` (e.g.
  * [[NativeHash.shingleHashes]] output) — same as the direct operator.
  * Output is row-identical to `overlapJoin(df, idCol, setCol, k)`:
  * (id_a < id_b, overlap).
  */
object OverlapJoin {

  def pairsClustered(
      df: DataFrame,
      idCol: String,
      setCol: Column,
      minOverlap: Int,
      numHashes: Int = 64,
      numBands: Int = 16,
      unionCap: Int = 1 << 15): DataFrame = {
    require(minOverlap >= 1, "minOverlap must be >= 1")
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val k = minOverlap

    // size filter AFTER the widen exchange (the documented pushdown
    // trap: a deterministic filter on the derived set would sink below
    // the repartition and serialize the set computation on one core)
    val base = Par.widen(df)
      .select(col(idCol).as("id"), setCol.as("__set"))
      .select(col("id"), col("__set"), coalesce(size(col("__set")), lit(0)).as("n"))
      .where(col("n") >= k) // shorter sets cannot reach overlap k
      .persist(MEMORY_AND_DISK)

    // ---- 1. exact-set collapse (see ClusterDedup on why Par.cut and
    // not persist: the analyzer re-walks duplicated subtrees otherwise)
    val docRep = Par.cut(base.select(col("id"), col("n"),
      min(col("id")).over(Window.partitionBy(col("__set"))).as("rep")))
    val reps = Par.cut(
      base.join(docRep.where(col("id") === col("rep")).select("id"), Seq("id")))

    // ---- 2. LSH star contraction over representatives ----
    val buckets = reps.select(col("id"),
      posexplode(NativeHash.minhashBandBucketsHashed(col("__set"), numHashes, numBands))
        .as(Seq("band", "bucket")))
    val lshCand = buckets.select(col("band"), col("bucket"), col("id").as("id_a"))
      .join(buckets.select(col("band"), col("bucket"), col("id").as("id_b")),
        Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    val edges1 = lshCand
      .join(reps.select(col("id").as("id_a"), col("__set").as("__sa")), Seq("id_a"))
      .join(reps.select(col("id").as("id_b"), col("__set").as("__sb")), Seq("id_b"))
      .withColumn("c", NativeHash.sortedIntersectAtLeast(
        col("__sa"), col("__sb"), lit(k)))
      .filter(col("c") >= 0)
      .select("id_a", "id_b")
    val nbrMin = edges1.select(col("id_a").as("id"), col("id_b").as("nb"))
      .union(edges1.select(col("id_b").as("id"), col("id_a").as("nb")))
      .groupBy("id").agg(min("nb").as("__nbmin"))
    val repCluster = Par.cut(reps.select(col("id"))
      .join(nbrMin, Seq("id"), "left")
      .select(col("id"),
        least(col("id"), coalesce(col("__nbmin"), col("id"))).as("cl")))

    // ---- 3. cluster postings in rarity order ----
    val index = reps.select(col("id"), explode(col("__set")).as("s"), col("n"))
    val member = Par.cut(reps.join(repCluster, Seq("id"))) // (id, __set, n, cl)
    val cStats = member.groupBy("cl").agg(count(lit(1)).as("nm"))
    val dfreq = index.groupBy("s").agg(count(lit(1)).as("df"))
    val wDoc = Window.partitionBy(col("id")).orderBy(col("df").asc, col("s").asc)
    val cpost = Par.cut(index.join(dfreq, Seq("s"))
      .withColumn("pos", row_number().over(wDoc))
      .filter(col("pos") <= col("n") - k + 1)
      .join(repCluster, Seq("id"))
      .groupBy(col("s"), col("cl"))
      .agg(max(col("n") - col("pos")).as("mr"))
      .join(cStats, Seq("cl")))
    // a qualifying pair shares a prefix element e* with
    // 1 + min(n_a−p_a, n_b−p_b) ≥ k; mr ≥ n−p per member, so the
    // relaxed positional filter below is lossless
    val candCl = cpost.select(col("s").as("__sa"), col("cl").as("cl_a"),
        col("mr").as("__mra"), col("nm").as("__nma"))
      .join(cpost.select(col("s").as("__sb"), col("cl").as("cl_b"),
          col("mr").as("__mrb"), col("nm").as("__nmb")),
        col("__sa") === col("__sb") &&
        col("cl_a") < col("cl_b") &&
        lit(1) + least(col("__mra"), col("__mrb")) >= lit(k))
      .select(col("cl_a"), col("cl_b"), col("__nma"), col("__nmb"))
      .distinct()

    // ---- 4. union-set bound prune ----
    val exploded = member
      .join(cStats.where(col("nm") > 1).select("cl"), Seq("cl"))
      .select(col("cl"), explode(col("__set")).as("s")).distinct()
      .persist(MEMORY_AND_DISK)
    val uSize = exploded.groupBy("cl").agg(count(lit(1)).as("usz"))
    val unions = exploded
      .join(uSize.where(col("usz") <= unionCap).select("cl"), Seq("cl"))
      .groupBy("cl").agg(sort_array(collect_list(col("s"))).as("u"))
    val pruned = candCl
      .join(unions.select(col("cl").as("cl_a"), col("u").as("u_a")), Seq("cl_a"), "left")
      .join(unions.select(col("cl").as("cl_b"), col("u").as("u_b")), Seq("cl_b"), "left")
      .filter((col("__nma") === 1 && col("__nmb") === 1) ||
        col("u_a").isNull || col("u_b").isNull ||
        NativeHash.sortedIntersectCount(col("u_a"), col("u_b")) >= lit(k))
      .select("cl_a", "cl_b")

    // ---- 5. verify: cross-cluster member pairs + intra-cluster pairs
    def verified(pairs: DataFrame): DataFrame = pairs
      .withColumn("c", NativeHash.sortedIntersectAtLeast(
        col("__sa"), col("__sb"), lit(k)))
      .filter(col("c") >= 0)
      .select(least(col("ra"), col("rb")).as("ra"),
        greatest(col("ra"), col("rb")).as("rb"), col("c").cast("long").as("overlap"))
    val cross = verified(pruned
      .join(member.select(col("cl").as("cl_a"), col("id").as("ra"), col("__set").as("__sa")), Seq("cl_a"))
      .join(member.select(col("cl").as("cl_b"), col("id").as("rb"), col("__set").as("__sb")), Seq("cl_b")))
    val intra = verified(member.select(col("cl"), col("id").as("ra"), col("__set").as("__sa"))
      .join(member.select(col("cl"), col("id").as("rb"), col("__set").as("__sb")), Seq("cl"))
      .filter(col("ra") < col("rb")))
    val repPairs = Par.cut(cross.union(intra))

    // ---- fan out through the exact-set collapse ----
    val groups = docRep.select(col("id"), col("n"), col("rep"))
    val crossGroups = repPairs
      .join(groups.select(col("rep").as("ra"), col("id").as("ia")), Seq("ra"))
      .join(groups.select(col("rep").as("rb"), col("id").as("ib")), Seq("rb"))
      .select(least(col("ia"), col("ib")).as("id_a"),
        greatest(col("ia"), col("ib")).as("id_b"), col("overlap"))
    // identical-set pairs: overlap = |set| = n, qualifying by the size
    // filter — no walk needed
    val intraGroups = groups.select(col("rep"), col("id").as("id_a"), col("n"))
      .join(groups.select(col("rep"), col("id").as("id_b")), Seq("rep"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("n").cast("long").as("overlap"))
    val out = Par.cut(crossGroups.union(intraGroups))

    Seq(base, exploded).foreach(_.unpersist(false))
    Seq(docRep, reps, repCluster, member, cpost, repPairs).foreach(Par.free)
    out
  }
}
