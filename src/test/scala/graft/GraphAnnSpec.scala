package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.GraphAnn

/** Sharded HNSW: the exhaustive arm (efSearch = 0) must be EXACT — the
  * layer-0 insertion chain makes every shard graph connected, so the
  * unbounded beam visits every node — and the production beam must
  * reach high recall on a plain random corpus. Determinism (levels
  * from id hashes, (score DESC, id ASC) everywhere) is pinned by
  * re-running.
  */
class GraphAnnSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def mkCorpus(n: Int, dim: Int, seed: Long): Seq[(Long, Array[Float])] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map(i => i.toLong -> Array.fill(dim)(rnd.nextFloat() * 2f - 1f))
  }

  /** Reference: exact cosine top-k with the same fold and tie-break. */
  private def bruteTopK(corpus: Seq[(Long, Array[Float])],
      q: Array[Float], k: Int): Seq[Long] = {
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < math.min(a.length, b.length)) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
    }
    corpus.map { case (id, v) => (id, cos(q, v)) }
      .sortBy { case (id, s) => (-s, id) }.take(k).map(_._1)
  }

  test("exhaustive arm equals brute force exactly, any shard count") {
    val corpus = mkCorpus(300, 16, seed = 11)
    val queries = corpus.take(4).map { case (id, v) => (id + 1000L, v) }
    val cdf = corpus.toDF("id", "vec")
    val qdf = queries.toDF("qid", "qvec")
    for (shards <- Seq(1, 4)) {
      val got = GraphAnn.hnswTopK(cdf, qdf, k = 7, m = 6, efConstruction = 24,
          efSearch = 0, nShards = shards)
        .select("qid", "id", "rank").as[(Long, Long, Int)].collect()
        .groupBy(_._1).map { case (q, rows) => q -> rows.sortBy(_._3).map(_._2).toSeq }
      queries.foreach { case (qid, qv) =>
        val expect = bruteTopK(corpus, qv, 7)
        assert(got(qid) == expect, s"shards=$shards qid=$qid")
      }
    }
  }

  test("production beam reaches high recall on a random corpus") {
    val corpus = mkCorpus(500, 16, seed = 23)
    val queries = mkCorpus(20, 16, seed = 29).map { case (id, v) => (id + 5000L, v) }
    val got = GraphAnn.hnswTopK(corpus.toDF("id", "vec"),
        queries.toDF("qid", "qvec"), k = 10, m = 8, efConstruction = 48,
        efSearch = 48, nShards = 2)
      .select("qid", "id").as[(Long, Long)].collect()
      .groupBy(_._1).map { case (q, rows) => q -> rows.map(_._2).toSet }
    val recalls = queries.map { case (qid, qv) =>
      val truth = bruteTopK(corpus, qv, 10).toSet
      (truth intersect got(qid)).size.toDouble / truth.size
    }
    val mean = recalls.sum / recalls.length
    assert(mean >= 0.85, s"mean recall@10 = $mean (per-query: $recalls)")
  }

  test("results are deterministic across runs") {
    val corpus = mkCorpus(200, 8, seed = 37).toDF("id", "vec")
    val queries = mkCorpus(5, 8, seed = 41).toDF("qid", "qvec")
    def run() = GraphAnn.hnswTopK(corpus, queries, k = 5, m = 4,
        efConstruction = 16, efSearch = 8, nShards = 3)
      .select("qid", "id", "rank").as[(Long, Long, Int)].collect().sorted.toSeq
    assert(run() == run())
  }

  test("corpus-derived sharding: autoShards math pinned, auto arm stays exact") {
    // the per-shard build holds the shard in task memory (rows.toArray)
    // — shard count must grow with the corpus, not sit on a fixed knob
    assert(GraphAnn.autoShards(0L, 1 << 16) == 1)
    assert(GraphAnn.autoShards(1L, 1 << 16) == 1)
    assert(GraphAnn.autoShards((1L << 16), 1 << 16) == 1)
    assert(GraphAnn.autoShards((1L << 16) + 1, 1 << 16) == 2)
    assert(GraphAnn.autoShards(10_000_000L, 1 << 16) == 153)
    assert(GraphAnn.autoShards(300L, 100) == 3)
    // nShards = 0 (the default): derived count, exhaustive arm still
    // exact — sharding never affects the exact merge's result
    val corpus = mkCorpus(250, 16, seed = 53)
    val queries = corpus.take(3).map { case (id, v) => (id + 1000L, v) }
    val got = GraphAnn.hnswTopK(corpus.toDF("id", "vec"),
        queries.toDF("qid", "qvec"), k = 6, m = 6, efConstruction = 24,
        efSearch = 0, maxShardRows = 100) // → 3 shards derived
      .select("qid", "id", "rank").as[(Long, Long, Int)].collect()
      .groupBy(_._1).map { case (q, rows) => q -> rows.sortBy(_._3).map(_._2).toSeq }
    queries.foreach { case (qid, qv) =>
      assert(got(qid) == bruteTopK(corpus, qv, 6), s"qid=$qid")
    }
  }

  test("recall gate machinery reports < k on a genuinely lossy beam") {
    import graft.operators.SimilaritySearch
    // a deliberately starved beam (efSearch=1, m=2) on a random corpus
    // misses true neighbors — the measured-recall row must SAY so
    // (recalled < k), not paper over it; the exhaustive arm under the
    // same measurement reports full k (the control)
    val corpus = mkCorpus(400, 16, seed = 61)
    val queries = mkCorpus(10, 16, seed = 67).map { case (id, v) => (id + 9000L, v) }
    val cdf = corpus.toDF("id", "vec")
    val qdf = queries.toDF("qid", "qvec")
    val exact = SimilaritySearch.bruteForceTopK(cdf, qdf, 8)
    val lossy = GraphAnn.hnswTopK(cdf, qdf, k = 8, m = 2, efConstruction = 2,
      efSearch = 1, nShards = 1)
    val rLossy = SimilaritySearch.recall(exact, lossy, 8)
      .as[(Long, Int, Int)].collect().toSeq
    assert(rLossy.length == 10 && rLossy.forall(r => r._2 == 8 && r._3 <= 8))
    assert(rLossy.map(_._3).sum < 10 * 8,
      s"starved beam should drop recall somewhere: $rLossy")
    val full = GraphAnn.hnswTopK(cdf, qdf, k = 8, m = 8, efConstruction = 32,
      efSearch = 0, nShards = 2)
    val rFull = SimilaritySearch.recall(exact, full, 8)
      .as[(Long, Int, Int)].collect().toSeq
    assert(rFull.forall(_._3 == 8), s"exhaustive control must be full recall: $rFull")
  }

  test("tiny and degenerate shards: singleton corpus, zero vectors, k > n") {
    val corpus = Seq(1L -> Array.fill(4)(0f), 2L -> Array(1f, 0f, 0f, 0f))
      .toDF("id", "vec")
    val queries = Seq(9L -> Array(1f, 0f, 0f, 0f)).toDF("qid", "qvec")
    val got = GraphAnn.hnswTopK(corpus, queries, k = 5, m = 2,
        efConstruction = 4, efSearch = 0, nShards = 2)
      .select("qid", "id", "rank").as[(Long, Long, Int)].collect().sortBy(_._3)
    // zero-norm vector scores 0.0 (the cosine contract); both rows rank
    assert(got.toSeq.map(r => (r._2, r._3)) == Seq((2L, 1), (1L, 2)))
  }
}
