package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{NativeHash, Pq}

/** Product-quantization ANN: compressed-corpus scan + exact rerank.
  *
  * The 100 TB layout: the corpus is stored once as PQ codes (m small
  * ints per vector — a 16-64× shrink of the embedding column), the ADC
  * scan streams those codes map-side against a broadcast query-LUT set
  * (m lookups per vector·query instead of d multiplies), and only the
  * per-query shortlist — `shortlist`·|queries| rows, not the corpus —
  * ever touches the full-precision vectors again for the exact cosine
  * rerank. No shuffle of corpus-sized data anywhere: the only
  * exchanges are the two query-partitioned top-k windows over
  * shortlist-sized frames.
  *
  * Codebook training is sample-based (`sampleCap` vectors to the
  * driver, Lloyd per subspace) exactly like the IVF centroid sample —
  * bounded, and standard practice for PQ systems.
  */
object PqSearch {

  final case class PqModel(codebooks: Array[Array[Array[Float]]]) {
    lazy val helper = new Pq.PqHelper(codebooks)
  }

  /** Train m per-subspace codebooks of `k` centroids on a bounded,
    * seeded sample of the corpus.
    */
  def train(
      corpus: DataFrame, vecCol: String, dim: Int,
      m: Int = 16, k: Int = 64,
      sampleCap: Int = 4096, iters: Int = 10, seed: Long = 42L,
      corpusSize: Option[Long] = None): PqModel = {
    require(dim % m == 0, s"dim $dim must divide into $m subspaces")
    val subdim = dim / m
    // same escape hatch as SimilaritySearch.srpTopK: pass the known
    // cardinality (table stats / cached count) to skip the count scan
    val n = corpusSize.getOrElse(corpus.count())
    val base =
      if (n > sampleCap) corpus.sample(sampleCap.toDouble / n, seed) else corpus
    val sample = base.select(vecCol).limit(sampleCap).collect()
      .map(_.getSeq[Float](0).toArray)
    require(sample.nonEmpty, "PQ training needs a non-empty corpus")
    val cb = Array.tabulate(m) { s =>
      val pts = sample.map(v => java.util.Arrays.copyOfRange(v, s * subdim, (s + 1) * subdim))
      kmeans(pts, k, iters, seed + s)
    }
    PqModel(cb)
  }

  /** Plain Lloyd with seeded distinct-point init; an emptied cluster
    * keeps its previous centroid. Deterministic for a given seed.
    */
  private def kmeans(
      pts: Array[Array[Float]], k: Int, iters: Int, seed: Long): Array[Array[Float]] = {
    val rng = new scala.util.Random(seed)
    val kk = math.min(k, pts.length)
    val cents = rng.shuffle(pts.indices.toList).take(kk).map(i => pts(i).clone).toArray
    val sd = pts(0).length
    val assign = new Array[Int](pts.length)
    var it = 0
    while (it < iters) {
      var p = 0
      while (p < pts.length) {
        var best = 0; var bd = Double.MaxValue; var c = 0
        while (c < kk) {
          val ct = cents(c); val pt = pts(p); var d = 0.0; var i = 0
          while (i < sd) { val t = pt(i) - ct(i); d += t * t; i += 1 }
          if (d < bd) { bd = d; best = c }
          c += 1
        }
        assign(p) = best; p += 1
      }
      val sums = Array.fill(kk)(new Array[Double](sd))
      val cnt = new Array[Int](kk)
      p = 0
      while (p < pts.length) {
        val a = assign(p); cnt(a) += 1; var i = 0
        while (i < sd) { sums(a)(i) += pts(p)(i); i += 1 }
        p += 1
      }
      var c = 0
      while (c < kk) {
        if (cnt(c) > 0) { var i = 0; while (i < sd) { cents(c)(i) = (sums(c)(i) / cnt(c)).toFloat; i += 1 } }
        c += 1
      }
      it += 1
    }
    cents
  }

  /** IVF-PQ: the standard billion-scale composition (faiss IVFPQ shape)
    * of the two scale paths implemented separately here — the IVF
    * coarse quantizer prunes each query to `nProbe` inverted lists, the
    * ADC scan scores ONLY the probed candidates from PQ codes (m
    * lookups per pair), and full vectors are touched just for the
    * exact-cosine shortlist rerank. vs `pqTopK` the scored product
    * shrinks ~nProbe/nLists; vs `IvfSearch.ivfTopK` the probed
    * candidates are scored from the compressed column, not the
    * embeddings. Probe selection reuses IvfSearch's CentroidHelper
    * (same L2 metric, same tie order) driver-side for the bounded
    * query set.
    */
  def ivfPqTopK(
      corpus: DataFrame, queries: DataFrame, k: Int, dim: Int,
      nLists: Int = 32, nProbe: Int = 28,
      m: Int = 16, kCent: Int = 64, shortlist: Int = 100,
      model: Option[PqModel] = None, seed: Long = 42L,
      corpusSize: Option[Long] = None): DataFrame = {
    val cents = IvfSearch.trainCentroids(corpus, nLists)
    val mod = model.getOrElse(
      train(corpus, "vec", dim, m, kCent, seed = seed, corpusSize = corpusSize))
    val codec = mod.helper
    // one corpus scan emits (id, list, codes): coarse assignment and PQ
    // encoding fused, both codegen'd expressions
    val codes = corpus.select(col("id"),
      element_at(IvfSearch.nearestCentroids(col("vec"), cents, 1), 1).as("list"),
      Pq.encode(col("vec"), codec).as("codes"))
    val qRows = queries.select("qid", "qvec").collect()
    require(qRows.iterator.map(_.getLong(0)).toSet.size == qRows.length,
      "duplicate qid in queries: probe/score pairs would double and corrupt ranks")
    val luts = qRows.map { r =>
      r.getLong(0) -> codec.buildLut(r.getSeq[Float](1).toArray)
    }.toMap
    val adc = new Pq.PqAdcHelper(codec, luts)
    val probeHelper = new IvfSearch.CentroidHelper(cents, nProbe)
    val spark = corpus.sparkSession
    import spark.implicits._
    val probes = qRows.flatMap { r =>
      val qid = r.getLong(0)
      val pl = probeHelper.compute(new org.apache.spark.sql.catalyst.util.GenericArrayData(
        r.getSeq[Float](1).toArray))
      pl.toIntArray().map(list => (qid, list))
    }.toSeq.toDF("qid", "list")
    // a corpus row lives in exactly one list and (qid, list) probes are
    // distinct, so the join emits each scored pair at most once
    val scored = codes.join(broadcast(probes), Seq("list"))
      .select(col("qid"), col("id"), Pq.adcScore(col("codes"), col("qid"), adc).as("adc"))
    val wS = Window.partitionBy("qid").orderBy(col("adc").desc, col("id").asc)
    val short = scored.withColumn("__r", row_number().over(wS))
      .filter(col("__r") <= shortlist).select("qid", "id")
    val rerank = short.join(corpus, Seq("id"))
      .join(broadcast(queries), Seq("qid"))
      .select(col("qid"), col("id"),
        NativeHash.cosine(col("qvec"), col("vec")).as("score"))
    val w = Window.partitionBy("qid").orderBy(col("score").desc, col("id").asc)
    rerank.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Top-k by exact cosine over a PQ-ADC shortlist. `corpus` = (id,
    * vec), `queries` = (qid, qvec); queries are a bounded serving set
    * (collected once for LUT construction, broadcast for the rerank).
    */
  def pqTopK(
      corpus: DataFrame, queries: DataFrame, k: Int, dim: Int,
      m: Int = 16, kCent: Int = 64, shortlist: Int = 100,
      model: Option[PqModel] = None, seed: Long = 42L,
      corpusSize: Option[Long] = None): DataFrame = {
    val mod = model.getOrElse(
      train(corpus, "vec", dim, m, kCent, seed = seed, corpusSize = corpusSize))
    val codec = mod.helper
    val codes = corpus.select(col("id"), Pq.encode(col("vec"), codec).as("codes"))
    val qRows = queries.select("qid", "qvec").collect()
    require(qRows.iterator.map(_.getLong(0)).toSet.size == qRows.length,
      "duplicate qid in queries: probe/score pairs would double and corrupt ranks")
    val luts = qRows.map { r =>
      r.getLong(0) -> codec.buildLut(r.getSeq[Float](1).toArray)
    }.toMap
    val adc = new Pq.PqAdcHelper(codec, luts)
    val spark = corpus.sparkSession
    import spark.implicits._
    val qids = qRows.map(_.getLong(0)).toSeq.toDF("qid")
    // corpus × queries, each scored in m lookups; candidates cut to the
    // per-query shortlist before any full vector is touched
    val scored = codes.crossJoin(broadcast(qids))
      .select(col("qid"), col("id"), Pq.adcScore(col("codes"), col("qid"), adc).as("adc"))
    val wS = Window.partitionBy("qid").orderBy(col("adc").desc, col("id").asc)
    val short = scored.withColumn("__r", row_number().over(wS))
      .filter(col("__r") <= shortlist).select("qid", "id")
    val rerank = short.join(corpus, Seq("id"))
      .join(broadcast(queries), Seq("qid"))
      .select(col("qid"), col("id"),
        NativeHash.cosine(col("qvec"), col("vec")).as("score"))
    val w = Window.partitionBy("qid").orderBy(col("score").desc, col("id").asc)
    rerank.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
