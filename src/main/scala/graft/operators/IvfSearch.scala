package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Shims
import org.apache.spark.sql.types._

import graft.functions.Vectors

/** IVF-style approximate nearest neighbor: coarse quantization into
  * `nLists` inverted lists, queries probe the `nProbe` nearest lists.
  * The complement to SRP-LSH (SimilaritySearch.srpTopK): IVF partitions
  * by data geometry (centroids) instead of random hyperplanes, which
  * wins when the corpus is clustered.
  *
  * Scale shape:
  *   - "training" = one driver-side collect of `nLists` seeded sample
  *     vectors (IVF's coarse quantizer is always tiny relative to the
  *     corpus; real IVF runs k-means on a sample the same way);
  *   - assignment is a native codegen expression (one compiled
  *     nLists×dim loop per row) — the corpus is scanned once, never
  *     shuffled except by its list id;
  *   - the probe join is an equi-join on list id: corpus×queries work
  *     is |list| × nProbe, not |corpus| × |queries|.
  */
object IvfSearch {

  /** Nearest-centroid ids (ascending by L2 distance), `nProbe` of them. */
  final class CentroidHelper(centroids: Array[Array[Float]], nProbe: Int) extends Serializable {
    private val c = centroids.length
    def compute(vec: ArrayData): ArrayData = {
      val dim = centroids(0).length
      val n = math.min(dim, vec.numElements())
      val d2 = new Array[Double](c)
      var ci = 0
      while (ci < c) {
        val w = centroids(ci)
        var acc = 0.0
        var j = 0
        while (j < n) { val d = vec.getFloat(j) - w(j); acc += d * d; j += 1 }
        d2(ci) = acc
        ci += 1
      }
      // selection of nProbe smallest (c is small; simple partial selection)
      val ids = Array.tabulate(c)(identity)
      val out = new Array[Int](math.min(nProbe, c))
      var k = 0
      while (k < out.length) {
        var best = k
        var i = k + 1
        while (i < c) { if (d2(ids(i)) < d2(ids(best))) best = i; i += 1 }
        val t = ids(k); ids(k) = ids(best); ids(best) = t
        out(k) = ids(k)
        k += 1
      }
      new GenericArrayData(out)
    }
  }

  case class NearestCentroidsExpr(child: Expression, centroids: Array[Array[Float]], nProbe: Int)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes = Seq(ArrayType(FloatType))
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    @transient private lazy val helper = new CentroidHelper(centroids, nProbe)
    override def nullSafeEval(input: Any): Any = helper.compute(input.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val h = ctx.addReferenceObj("centroidHelper", helper, classOf[CentroidHelper].getName)
      defineCodeGen(ctx, ev, c => s"$h.compute($c)")
    }
    override protected def withNewChildInternal(newChild: Expression): NearestCentroidsExpr =
      copy(child = newChild)
    override def prettyName: String = "nearest_centroids"
  }

  private[operators] def nearestCentroids(vec: Column, centroids: Array[Array[Float]], nProbe: Int): Column =
    Shims.column(NearestCentroidsExpr(Shims.expression(vec), centroids, nProbe))

  /** Deterministic coarse quantizer: the `nLists` corpus vectors with the
    * smallest xxhash64(id) — a seeded uniform sample (`trainKMeans`
    * refines it; the list structure and query path are identical).
    */
  def trainCentroids(corpus: DataFrame, nLists: Int): Array[Array[Float]] =
    corpus.withColumn("__h", xxhash64(col("id")))
      .orderBy("__h").limit(nLists)
      .select("vec").collect()
      .map(_.getSeq[Float](0).toArray)

  /** Lloyd-refined quantizer: start from the seeded sample and iterate
    * assign (native nearest-centroid, map-side) → recompute means
    * (Embeddings.centroids — a narrow distributed aggregate) → collect
    * the nLists×dim table (bounded, same size as the sample). Each
    * iteration is two Spark jobs over the corpus; a handful suffices
    * for a coarse quantizer. Seeded start and deterministic assignment;
    * the distributed means are exact up to floating-point summation
    * order (double addition is non-associative across partitions), so a
    * vector near-equidistant between centroids can in principle flip
    * lists between runs — irrelevant for a coarse quantizer, but do not
    * expect bit-identical centroids across builds. Lists that lose all
    * members keep their previous centroid (k never shrinks).
    */
  def trainKMeans(corpus: DataFrame, nLists: Int, iters: Int = 3): Array[Array[Float]] = {
    var cents = trainCentroids(corpus, nLists)
    var it = 0
    while (it < iters) {
      val assigned = corpus
        .select(element_at(nearestCentroids(col("vec"), cents, 1), 1).as("list"), col("vec"))
      val means = Embeddings.centroids(assigned, "list", "vec")
        .collect()
        .map(r => r.getAs[Int]("list") -> r.getSeq[Double](1).map(_.toFloat).toArray)
        .toMap
      cents = Array.tabulate(cents.length)(i => means.getOrElse(i, cents(i)))
      it += 1
    }
    cents
  }

  /** Materialized IVF index: the coarse quantizer plus the corpus's list
    * assignment. Build ONCE per corpus snapshot (persist `assigned` as a
    * list-partitioned table in production), then `probe` arbitrarily
    * many query batches without rescanning or reassigning the corpus —
    * the serving-path analog of MinHashDedup.bandIndex. The cached
    * assignment is corpus-sized: call `release()` when done with the
    * index or the block manager holds it for the session's lifetime.
    */
  final case class IvfIndex(centroids: Array[Array[Float]], assigned: DataFrame) {
    def release(): Unit = { assigned.unpersist(); () }
  }

  def buildIndex(corpus: DataFrame, nLists: Int = 64, kmeansIters: Int = 0): IvfIndex =
    buildIndexInternal(corpus, nLists, kmeansIters, cache = true)

  private def buildIndexInternal(
      corpus: DataFrame, nLists: Int, kmeansIters: Int, cache: Boolean): IvfIndex = {
    val cents =
      if (kmeansIters > 0) trainKMeans(corpus, nLists, kmeansIters)
      else trainCentroids(corpus, nLists)
    val assigned = Par.widen(corpus)
      .withColumn("list", element_at(nearestCentroids(col("vec"), cents, 1), 1))
    // probe-many-times is the index's point — cache the assignment (the
    // one-shot ivfTopK path skips it: a single consumer would only leak
    // a corpus-sized cache entry per call)
    IvfIndex(cents,
      if (cache) assigned.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else assigned)
  }

  /** Top-k by cosine among the probed inverted lists of a built index. */
  def probe(index: IvfIndex, queries: DataFrame, k: Int, nProbe: Int = 8): DataFrame = {
    val probes = queries
      .withColumn("list", explode(nearestCentroids(col("qvec"), index.centroids, nProbe)))
    // no pair-dedup aggregate: assignment is single-list (nearestCentroids
    // take-1), so a (qid, id) pair meets in exactly one list and the
    // scored stream is already pair-unique. Beyond being needless, a
    // groupBy here would force a full candidate exchange AND defeat the
    // WindowGroupLimit rank pushdown below (row_number <= k runs a
    // map-side per-partition top-k, so only ~k rows per (qid, partition)
    // ever reach the window exchange — measured 6.1 GB -> MBs on the
    // 10x-replicated knn soak).
    val scored = index.assigned.join(broadcast(probes), Seq("list"))
      .select(col("qid"), col("id"), graft.functions.NativeHash.cosine(col("qvec"), col("vec")).as("score"))
    // should the per-task sort under this WindowGroupLimit ever dominate
    // (it does on pair-listing-sized streams — see TopKAgg's measured
    // A/B), graft.functions.TopKAgg is the drop-in sort-free plan; at
    // the scales these ANN rows run, scoring compute dominates and the
    // pushdown's map-side top-k already bounds the exchange
    val w = Window.partitionBy("qid").orderBy(col("score").desc, col("id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Top-k by cosine among the probed inverted lists (one-shot: builds
    * the index inline). corpus: (id, vec array<float>), queries:
    * (qid, qvec array<float>).
    */
  def ivfTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      nLists: Int = 64,
      nProbe: Int = 8): DataFrame =
    probe(buildIndexInternal(corpus, nLists, kmeansIters = 0, cache = false), queries, k, nProbe)

  /** k-NN SELF-join: every corpus vector's k nearest neighbors (self
    * excluded) among the probed inverted lists — the SemDeDup-style
    * neighborhood pass of embedding curation. Unlike [[probe]], the
    * query side here IS the corpus, so nothing is broadcast: list
    * assignments and list probes meet in a co-partitioned equi-join on
    * the 4-byte `list` key, scoring runs list-locally, and the only
    * wide rows (vectors) ship exactly once per (probe, list) pair.
    * Candidate volume is Σ_q nProbe·|list| ≈ nProbe·n²/nLists — size
    * nLists ~ √n (and nProbe ≪ nLists) to keep it far under the exact
    * join's n². With nProbe = nLists the candidate set is the full
    * corpus and the result is structurally exact (the `ann_ivf` oracle
    * pattern); partial probing trades recall for that volume.
    */
  def knnJoinIvf(
      corpus: DataFrame, // (id, vec)
      k: Int,
      nLists: Int = 64,
      nProbe: Int = 8): DataFrame = {
    val (lazyOut, index) = knnJoinIvfPlan(corpus, k, nLists, nProbe)
    val out = Par.cut(lazyOut)
    index.release()
    out
  }

  /** The un-cut [[knnJoinIvf]] output frame (plus the resource-owning
    * index) so PlanShapeSpec can pin the scoring path's shape — the
    * public entry point eagerly cuts, which reduces its visible plan to
    * a checkpoint scan. Probe callers own the cleanup.
    */
  private[graft] def knnJoinIvfPlan(
      corpus: DataFrame, k: Int, nLists: Int, nProbe: Int): (DataFrame, IvfIndex) = {
    val index = buildIndexInternal(corpus, nLists, kmeansIters = 0, cache = true)
    val probes = corpus
      .select(col("id").as("qid"), col("vec").as("qvec"))
      .withColumn("list", explode(nearestCentroids(col("qvec"), index.centroids, nProbe)))
    // pair-unique without dedup (single-list assignment — see probe), so
    // the stream flows straight into the rank pushdown
    val scored = index.assigned.join(probes, Seq("list"))
      .filter(col("qid") =!= col("id"))
      .select(col("qid"), col("id"),
        graft.functions.NativeHash.cosine(col("qvec"), col("vec")).as("score"))
    val w = Window.partitionBy("qid").orderBy(col("score").desc, col("id").asc)
    (scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k), index)
  }
}
