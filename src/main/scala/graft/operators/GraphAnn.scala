package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Graph-based ANN (HNSW — Malkov & Yashunin, "Efficient and robust
  * approximate nearest neighbor search using Hierarchical Navigable
  * Small World graphs", TPAMI 2018), Spark-native as a SHARDED index:
  * the corpus hash-partitions into `nShards` shards, each shard builds
  * an in-memory HNSW inside one task (bounded by shard size — the
  * standard distributed-HNSW serving layout), every query searches
  * every shard, and the global top-k is the exact merge of per-shard
  * top-ks. A SINGLE global HNSW would need mutable cross-executor
  * state (parameter-server territory) — that is the documented
  * boundary; sharding trades one log factor (searches run per shard)
  * for embarrassing parallelism and zero coordination.
  *
  * Determinism (the oracle-gating requirement): vertex levels derive
  * from a splitmix64 of the EXTERNAL id (not RNG state), insertion
  * order is ascending id within a shard, and every comparison ranks by
  * (cosine DESC, id ASC) — ties cannot reorder between runs or
  * engines. Cosine is the same left-to-right float→double fold as
  * [[graft.functions.NativeHash.cosine]] / DuckDB's
  * list_cosine_similarity (the established cross-engine contract).
  *
  * Exactness of the gate arm: `efSearch = 0` means EXHAUSTIVE search
  * within each shard. Layer 0 always contains the insertion-chain
  * edges (node i ↔ node i−1, exempt from neighbor pruning), so the
  * layer-0 graph is connected by construction; best-first search with
  * an unbounded result set therefore visits every node of the shard —
  * per-shard top-k is exact by exhaustion, and the exact merge of
  * exact shard top-ks is the exact global top-k. That is why
  * `ann_hnsw` shares the brute-force oracle VERBATIM while exercising
  * the full graph machinery (level assignment, descent, beam,
  * neighbor pruning). The production knob (`efSearch` ≥ k, small) is
  * the approximate arm — navigability is not a per-row structural
  * property, so it is recall-pinned in GraphAnnSpec rather than
  * hash-gated (the IVF-partial trick has no analogue here).
  *
  * Scale shape: the corpus shuffles ONCE by an 8-byte id hash into
  * shards; queries broadcast (bounded query table, the bruteForceTopK
  * stance); the merge exchange carries ≤ nShards·k (qid, id, score)
  * triples per query — never embeddings. Build is one pass per shard;
  * memory is O(shard · M) int links beside the vectors.
  */
object GraphAnn {

  /** The per-shard build materializes its shard in task memory
    * (`rows.toArray` + O(M) int links per node), so SHARD size — never
    * corpus size — is the operator's memory ceiling. 64k rows ≈ 200 MB
    * of float vectors at dim 768; raise only with executor memory to
    * back it.
    */
  val DefaultMaxShardRows: Int = 1 << 16

  /** Corpus-derived shard count (the IVF nLists-from-corpus stance):
    * the smallest count keeping every hash-balanced shard under
    * `maxShardRows`. Monotone in n, never 0.
    */
  private[graft] def autoShards(n: Long, maxShardRows: Int): Int = {
    require(maxShardRows >= 1, s"maxShardRows must be >= 1, got $maxShardRows")
    math.min(math.max(1L, (n + maxShardRows - 1) / maxShardRows), 1L << 20).toInt
  }

  /** Per-query top-k by cosine through the sharded HNSW. Output
    * (qid, id, score, rank). `efSearch = 0` → exhaustive (exact);
    * otherwise the layer-0 beam holds max(efSearch, k) entries.
    * `nShards = 0` (the default) derives the shard count from a corpus
    * count via [[autoShards]] — at 100 TB a fixed shard knob either
    * overshoots (needless merge width) or blows the per-task
    * `rows.toArray` ceiling as the corpus grows under it; pass an
    * explicit positive value only when the caller already knows the
    * corpus scale (the count costs one narrow aggregate pass).
    */
  def hnswTopK(
      corpus: DataFrame, // (id, vec: array<float>)
      queries: DataFrame, // (qid, qvec: array<float>)
      k: Int,
      m: Int = 8,
      efConstruction: Int = 64,
      efSearch: Int = 0,
      nShards: Int = 0,
      maxShardRows: Int = DefaultMaxShardRows): DataFrame = {
    require(k >= 1 && m >= 2 && efConstruction >= m && nShards >= 0,
      s"bad hnsw params k=$k m=$m efC=$efConstruction shards=$nShards")
    val spark = corpus.sparkSession
    import spark.implicits._
    val shards =
      if (nShards > 0) nShards else autoShards(corpus.count(), maxShardRows)
    // bounded collect: the query table (the bruteForceTopK stance)
    val qs = queries.select(col("qid").cast("long"), col("qvec"))
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    val bq = spark.sparkContext.broadcast(qs)
    val ef = efSearch
    val (mm, efc, kk) = (m, efConstruction, k)
    val perShard = corpus.select(col("id").cast("long"), col("vec"))
      .repartition(shards, col("id"))
      .as[(Long, Array[Float])]
      .mapPartitions { rows =>
        val items = rows.toArray.sortBy(_._1) // ascending-id insertion: deterministic
        if (items.isEmpty) Iterator.empty
        else {
          val index = new HnswIndex(mm, efc)
          items.foreach { case (id, v) => index.insert(id, v) }
          bq.value.iterator.flatMap { case (qid, qv) =>
            index.searchTopK(qv, kk, ef).map { case (id, score) => (qid, id, score) }
          }
        }
      }
      .toDF("qid", "id", "score")
    // exact merge of the per-shard survivors: ≤ nShards·k rows per qid
    // reach the window exchange, row_number plans as WindowGroupLimit
    val w = Window.partitionBy("qid").orderBy(col("score").desc, col("id").asc)
    perShard.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** One shard's HNSW. Internal indices are insertion positions; the
    * insertion chain (i ↔ i−1) is an implicit layer-0 neighbor pair
    * exempt from pruning, guaranteeing layer-0 connectivity (the
    * exhaustive-search exactness hinge).
    */
  private[operators] final class HnswIndex(m: Int, efConstruction: Int) {
    private val mL = 1.0 / math.log(m.toDouble)
    private val vecs = scala.collection.mutable.ArrayBuffer.empty[Array[Float]]
    private val extIds = scala.collection.mutable.ArrayBuffer.empty[Long]
    private val nodeLevels = scala.collection.mutable.ArrayBuffer.empty[Int]
    // links(node)(layer) = neighbor internal indices
    private val links =
      scala.collection.mutable.ArrayBuffer.empty[Array[scala.collection.mutable.ArrayBuffer[Int]]]
    private var entry = -1
    private var topLevel = -1

    /** Same fold as NativeHash.CosineHelper — the cross-engine cosine
      * contract (left-to-right, float read as double, 0.0 on zero norm).
      */
    private def cos(a: Array[Float], b: Array[Float]): Double = {
      val n = math.min(a.length, b.length)
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < n) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y
        i += 1
      }
      if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
    }

    /** splitmix64 of the external id → u ∈ (0,1] → geometric level.
      * Deterministic across runs/partitionings, unlike RNG state.
      */
    private def levelOf(id: Long): Int = {
      var z = id + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z = z ^ (z >>> 31)
      val u = ((z >>> 11) + 1).toDouble / (1L << 53).toDouble // (0, 1]
      math.floor(-math.log(u) * mL).toInt
    }

    /** better(a, b) under (score DESC, extId ASC). */
    @inline private def better(sa: Double, ia: Int, sb: Double, ib: Int): Boolean =
      sa > sb || (sa == sb && extIds(ia) < extIds(ib))

    private def layerNeighbors(idx: Int, layer: Int): Iterator[Int] = {
      val explicit = links(idx)(layer).iterator
      if (layer > 0) explicit
      else { // the insertion chain, never pruned
        val chain = scala.collection.mutable.ArrayBuffer.empty[Int]
        if (idx > 0) chain += idx - 1
        if (idx + 1 < vecs.length) chain += idx + 1
        explicit ++ chain.iterator
      }
    }

    /** Greedy descent at one layer: move to the best-scoring neighbor
      * while it beats the current node (ties by id — deterministic).
      */
    private def greedy(q: Array[Float], start: Int, layer: Int): Int = {
      var cur = start
      var curScore = cos(q, vecs(cur))
      var improved = true
      while (improved) {
        improved = false
        layerNeighbors(cur, layer).foreach { nb =>
          val s = cos(q, vecs(nb))
          if (better(s, nb, curScore, cur)) { cur = nb; curScore = s; improved = true }
        }
      }
      cur
    }

    /** Best-first beam at one layer. `ef <= 0` → unbounded result set:
      * the loop only ends when the candidate heap drains, which on the
      * connected layer-0 graph means every node was visited (the
      * exhaustive-exactness argument). Returns (idx, score) best-first.
      */
    private def searchLayer(
        q: Array[Float], start: Int, ef: Int, layer: Int): Array[(Int, Double)] = {
      val bounded = ef > 0
      val visited = new java.util.BitSet(vecs.length)
      // candidates: best first; results: worst first (for O(log) eviction)
      val bestFirst = new java.util.Comparator[(Int, Double)] {
        def compare(a: (Int, Double), b: (Int, Double)): Int =
          if (better(a._2, a._1, b._2, b._1)) -1
          else if (better(b._2, b._1, a._2, a._1)) 1 else 0
      }
      val cand = new java.util.PriorityQueue[(Int, Double)](bestFirst)
      val res = new java.util.PriorityQueue[(Int, Double)](bestFirst.reversed())
      val s0 = cos(q, vecs(start))
      visited.set(start); cand.add((start, s0)); res.add((start, s0))
      while (!cand.isEmpty) {
        val c = cand.poll()
        // bounded mode stops once the best remaining candidate cannot
        // enter the full result set
        if (bounded && res.size() >= ef && !better(c._2, c._1, res.peek()._2, res.peek()._1)) {
          cand.clear()
        } else {
          layerNeighbors(c._1, layer).foreach { nb =>
            if (!visited.get(nb)) {
              visited.set(nb)
              val s = cos(q, vecs(nb))
              if (!bounded || res.size() < ef ||
                  better(s, nb, res.peek()._2, res.peek()._1)) {
                cand.add((nb, s)); res.add((nb, s))
                if (bounded && res.size() > ef) res.poll()
              }
            }
          }
        }
      }
      val out = new Array[(Int, Double)](res.size())
      var i = out.length - 1
      while (i >= 0) { out(i) = res.poll(); i -= 1 } // worst-first heap → reverse
      out
    }

    def insert(id: Long, vec: Array[Float]): Unit = {
      val lvl = levelOf(id)
      val idx = vecs.length
      vecs += vec; extIds += id; nodeLevels += lvl
      links += Array.fill(lvl + 1)(scala.collection.mutable.ArrayBuffer.empty[Int])
      if (entry < 0) { entry = idx; topLevel = lvl; return }
      var cur = entry
      var l = topLevel
      while (l > lvl) { cur = greedy(vec, cur, l); l -= 1 }
      l = math.min(lvl, topLevel)
      while (l >= 0) {
        // the beam can see the just-inserted node (cos 1.0 with itself,
        // reachable through the chain at layer 0) — exclude it both
        // from neighbor selection AND as the next descent anchor, else
        // a lower layer starts at a node with no links there yet
        val found = searchLayer(vec, cur, efConstruction, l)
          .filter(_._1 != idx)
        val neighbors = found.take(m)
        val mMax = if (l == 0) 2 * m else m
        neighbors.foreach { case (nb, _) =>
          links(idx)(l) += nb
          links(nb)(l) += idx
          if (links(nb)(l).length > mMax) {
            // prune to the mMax best neighbors OF nb (ties by id)
            val kept = links(nb)(l)
              .map(x => (x, cos(vecs(nb), vecs(x))))
              .sortWith((a, b) => better(a._2, a._1, b._2, b._1))
              .take(mMax).map(_._1)
            links(nb)(l).clear(); links(nb)(l) ++= kept
          }
        }
        if (found.nonEmpty) cur = found.head._1
        l -= 1
      }
      if (lvl > topLevel) { entry = idx; topLevel = lvl }
    }

    /** Top-k (extId, score) for one query; `ef <= 0` → exhaustive. */
    def searchTopK(q: Array[Float], k: Int, ef: Int): Seq[(Long, Double)] = {
      if (vecs.isEmpty) return Nil
      var cur = entry
      var l = topLevel
      while (l > 0) { cur = greedy(q, cur, l); l -= 1 }
      val beam = if (ef <= 0) 0 else math.max(ef, k)
      searchLayer(q, cur, beam, 0).iterator.take(k)
        .map { case (idx, s) => (extIds(idx), s) }.toSeq
    }
  }
}
