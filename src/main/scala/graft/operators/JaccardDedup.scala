package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Text

/** Exact n-gram Jaccard near-duplicate pairs WITHOUT an all-pairs join.
  *
  * Candidate generation uses PREFIX FILTERING on a global rarity order
  * (the PPJoin family — Xiao, Wang, Lin & Yu, "Efficient Similarity
  * Joins for Near Duplicate Detection", WWW 2008): J(a,b) ≥ t implies
  * an overlap c ≥ ⌈t·|a|⌉ (and ≥ ⌈t·|b|⌉), and if sets are sorted by a
  * global order, any pair with overlap ≥ α must share an element within
  * the first |x| − α + 1 elements of EACH side. So only each document's
  * rarest n − ⌈t·n⌉ + 1 shingles (by corpus document frequency, ties on
  * hash) enter the candidate self-join. Candidates are then verified
  * with an exact intersection count through the full index:
  *     J = c / (n_a + n_b − c)
  * — lossless at every threshold, no arrays through any shuffle.
  *
  * Scale shape: the naive inverted-index join costs Σ_s df(s)² over
  * shingle document-frequencies, and one viral shingle ("of the",
  * df = 10⁶) alone contributes 10¹² join rows. Under prefix filtering a
  * viral shingle ranks LAST in the rarity order and falls out of almost
  * every prefix, so the candidate join costs Σ_s dfP(s)² over prefix
  * frequencies — the hot tail self-prunes, with zero recall loss (the
  * `hot-shingle corpus` DedupSpec case pins candidates = 0 where the
  * naive join would produce all pairs).
  *
  * Two further PPJoin prunes run INSIDE the candidate join, before the
  * pair-distinct exchange:
  *   - size filter: t·max(|a|,|b|) ≤ min(|a|,|b|);
  *   - POSITIONAL filter: J ≥ t needs overlap c ≥ α = ⌈t·(n_a+n_b)/(1+t)⌉,
  *     and both docs' shingle lists sort by the SAME global order, so
  *     the first shared element (positions i, j in the full sorted
  *     lists) bounds c ≤ 1 + min(n_a−i, n_b−j). Rows failing
  *     1 + min(n_a−i, n_b−j) ≥ α are pruned; a qualifying pair always
  *     survives through its first-shared-element row, which maximizes
  *     the bound — lossless.
  * All pruning bounds are computed a hair conservative (±1e-9) against
  * fp rounding of t·n products: a boundary-exact pair is then verified
  * by the exact intersection count rather than silently pruned.
  * `maxDocFreq` remains as an OPTIONAL extra cap for adversarial
  * corpora; unlike prefix filtering it can lose pairs, so it stays off
  * by default.
  */
object JaccardDedup {

  def nearDupPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      nGram: Int = 2,
      threshold: Double = 0.3,
      maxDocFreq: Option[Long] = None): DataFrame =
    nearDupPairsByHashes(df, idCol,
      graft.functions.NativeHash.shingleHashes(Text.tokens(col(textCol)), nGram),
      threshold, maxDocFreq)

  /** Char-n-gram flavor — for short or unsegmented text (e.g. zh) where
    * word tokenization is meaningless.
    */
  def nearDupPairsByChars(
      df: DataFrame,
      idCol: String,
      textCol: String,
      nChars: Int = 3,
      threshold: Double = 0.3): DataFrame =
    nearDupPairsByHashes(df, idCol,
      graft.functions.NativeHash.charShingleHashes(col(textCol), nChars), threshold, None)

  /** Guard band against fp rounding of t·n products in pruning bounds
    * (e.g. 0.07·100 = 7.000000000000001 → ceil 8 would shrink a prefix
    * by one and could silently drop a boundary-exact pair). Every prune
    * subtracts/adds this so boundary cases are verified, not pruned.
    */
  private val Eps = 1e-9

  /** Prefix index: each document's rarest n − ⌈t·n⌉ + 1 shingle hashes
    * under the global (document-frequency asc, hash asc) order, each
    * carrying its position `pos` in the doc's FULL sorted shingle list
    * (for the positional filter). Any pair with J ≥ t shares at least
    * one shingle in BOTH prefixes (see object doc), so a self-join on
    * this index is a lossless candidate generator. Exposed
    * package-private so DedupSpec can pin the hot-shingle fan-out bound
    * directly.
    */
  private[graft] def prefixIndex(index: DataFrame, idCol: String, threshold: Double,
      keep: Seq[String] = Nil): DataFrame = {
    // df as a combiner AGGREGATE + join-back, not a count window over an
    // s-partitioned exchange (r18, guide §2.3/§2.5/§3.1). The r17 window
    // form shuffled the ENTIRE exploded index by shingle and sorted
    // every partition so the whole-partition count window could buffer
    // each shingle group — a hot shingle (a stopword n-gram at corpus
    // scale) ships every posting into ONE window buffer in one task,
    // the straggler-maker the r17 verdict flagged, and the 32 concurrent
    // partition sorts were the prime suspect for dedup_canonical's
    // 32-core GC pathology. The aggregate does map-side partial
    // aggregation, so a hot shingle accumulates in O(1) combiner state
    // and the df shuffle carries (s, partial count) rows —
    // distinct-shingle-sized, not index-sized. The join-back is
    // AQE-planned: at gate scale the aggregated dfreq is a few MB and
    // broadcasts, so the index is NEVER exchanged by s at all (one
    // exchange — by doc — where the window form paid two; measured
    // 0.55 s vs 0.89 s warm at sf0.1); at corpus scale dfreq outgrows
    // the broadcast threshold and AQE falls back to a shuffled join,
    // where — unlike a window — AQE's skew-join splitting can still
    // carve up a hot shingle's oversized partition.
    // The join on s is null-rejecting: a null shingle drops here,
    // matching the pre-r17 groupBy+join semantics (inert today — the
    // shingle-hash arrays are containsNull=false).
    val dfreq = index.groupBy(col("s")).agg(count(lit(1)).as("df"))
    // explicit width on the per-doc exchange: AQE's advisory-size
    // coalescing shrank this window to a SINGLE task at gate scale
    // (sub-64MB shuffle), serializing the row_number pass. The width is
    // data-size-aware with a cores floor (Par.scaleWidth, r18): cores
    // locally, estimated-bytes/advisory-size at 100 TB — the r17 blind
    // defaultParallelism would cap parallelism there.
    val wDoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("df").asc, col("s").asc)
    index.join(dfreq, Seq("s"))
      .repartition(Par.scaleWidth(index), col(idCol))
      .withColumn("pos", row_number().over(wDoc))
      .filter(col("pos") <= col("n") - ceil(col("n") * threshold - lit(Eps)) + 1)
      .select((Seq("s", idCol, "n", "pos") ++ keep).map(col): _*)
  }

  /** Candidate (id_a < id_b) pairs from the prefix self-join. The size
    * and positional filters run inside the join condition — pruned rows
    * never reach the pair-distinct exchange. The prefix index is
    * persisted: a self-join re-evaluates its subtree per side, and the
    * df + per-doc-window pipeline is the expensive part. Lazy persist,
    * NOT an eager cut: the sides' concurrent AQE stages can race the
    * materialization and duplicate some work, but at 32 cores that
    * overlap rides otherwise-idle cores — the r18 A/B measured the
    * eager-cut form 1.8× SLOWER on this operator (2.1 s → 3.9 s,
    * serializing the probe-side build behind the checkpoint write).
    * The routed cores are the opposite case (heavier chains, saturated
    * cores) and keep their sequential cut.
    */
  private[graft] def prefixCandidates(index: DataFrame, idCol: String, threshold: Double): DataFrame = {
    val prefix = prefixIndex(index, idCol, threshold)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = prefix.select(col("s").as("__sa"), col(idCol).as("id_a"),
      col("n").as("__na"), col("pos").as("__pa"))
    val b = prefix.select(col("s").as("__sb"), col(idCol).as("id_b"),
      col("n").as("__nb"), col("pos").as("__pb"))
    // minimum overlap for J ≥ t: c ≥ t·(n_a+n_b)/(1+t)
    val alpha = ceil((col("__na") + col("__nb")) * (threshold / (1.0 + threshold)) - lit(Eps))
    a.join(b,
        col("__sa") === col("__sb") &&
        col("id_a") < col("id_b") &&
        greatest(col("__na"), col("__nb")) * threshold <= least(col("__na"), col("__nb")) + lit(Eps) &&
        lit(1) + least(col("__na") - col("__pa"), col("__nb") - col("__pb")) >= alpha)
      .select("id_a", "id_b")
      .distinct()
  }

  /** Core: exact Jaccard over any shingle-array expression. Generic
    * string-shingle hatch — hashes and sorts per doc (interpreted HOF),
    * then delegates; the text/char entry points above use the native
    * codegen'd shingle-hash expressions instead.
    */
  def nearDupPairsBy(
      df: DataFrame,
      idCol: String,
      shingleExpr: Column,
      threshold: Double,
      maxDocFreq: Option[Long]): DataFrame =
    nearDupPairsByHashes(df, idCol,
      sort_array(transform(array_distinct(shingleExpr), s => xxhash64(s))),
      threshold, maxDocFreq)

  /** Core over a SORTED-distinct-hash-array expression (array<long>,
    * ascending — what NativeHash.shingleHashes/charShingleHashes emit).
    * Indexing on 64-bit hashes instead of shingle strings means joins
    * shuffle fixed-width longs; a collision (≈2⁻⁶⁴ per pair) could only
    * merge two shingle identities — far below the result's 6-decimal
    * resolution.
    */
  def nearDupPairsByHashes(
      df: DataFrame,
      idCol: String,
      hashArrExpr: Column,
      threshold: Double,
      maxDocFreq: Option[Long] = None): DataFrame = {
    require(threshold > 0, "threshold must be > 0 (candidate generation relies on a shared shingle)")
    // one persisted doc table carries the sorted hash array; it feeds
    // the exploded index (df count + prefix join) AND both verify sides
    // — the shingling pass runs once per document
    val docs = Par.widen(df)
      .select(col(idCol), hashArrExpr.as("__sh"))
      .select(col(idCol), col("__sh"), size(col("__sh")).as("n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val full = docs.select(col(idCol), explode(col("__sh")).as("s"), col("n"))
    val index = maxDocFreq.fold(full) { cap =>
      // OPTIONAL document-frequency cap (can lose pairs — off by
      // default; prefix filtering below already bounds the fan-out
      // losslessly): broadcast anti-join of the tiny hot tail
      val hot = full.groupBy("s").count().filter(col("count") > cap).select("s")
      full.join(broadcast(hot), Seq("s"), "left_anti")
    }
    // capped mode verifies over the capped shingle set (c excludes
    // capped shingles, n keeps the original size — J underestimates,
    // matching the cap's documented lossy contract); the default path
    // reuses the persisted doc arrays directly
    val verifyDocs = maxDocFreq.fold(docs) { _ =>
      index.groupBy(col(idCol))
        .agg(sort_array(collect_list(col("s"))).as("__sh"), first(col("n")).as("n"))
    }
    // verification: exact intersection count per candidate pair over the
    // per-doc sorted hash arrays — a codegen'd merge walk per row. The
    // re-join-through-the-exploded-index alternative expands to
    // Σ_cand n_a rows and then hash-aggregates them (at sf0.1's
    // adversarial tiny-vocab corpus: 6.2M candidates → 375M rows into a
    // 6.2M-group aggregate — that WAS 90% of the query's runtime); the
    // array form shuffles each doc's ~n×8-byte hash array per pair side
    // — comparable bytes — with no giant aggregate. No broadcast hint:
    // AQE broadcasts the doc-array table while it fits (a few MB here)
    // and falls back to shuffled joins at corpus scale.
    // early-exit walk: J ≥ t ⟺ c ≥ t·(n_a+n_b)/(1+t) = α (monotone in
    // c), so a walk that bails once c can no longer reach α rejects
    // exactly the sub-threshold pairs — and on the false-heavy
    // candidate streams low thresholds produce, most walks exit within
    // a few steps (measured 2.9× on the 10× soak corpus). α carries
    // the -Eps guard, so boundary-exact pairs are verified, not bailed.
    val alpha = ceil((col("n_a") + col("n_b")) * (threshold / (1.0 + threshold)) - lit(Eps))
      .cast("int")
    prefixCandidates(index, idCol, threshold)
      .join(verifyDocs.select(col(idCol).as("id_a"), col("__sh").as("__sha"), col("n").as("n_a")), Seq("id_a"))
      .join(verifyDocs.select(col(idCol).as("id_b"), col("__sh").as("__shb"), col("n").as("n_b")), Seq("id_b"))
      .withColumn("c", graft.functions.NativeHash.sortedIntersectAtLeast(
        col("__sha"), col("__shb"), alpha))
      .filter(col("c") >= 0)
      .withColumn("jaccard", col("c") / (col("n_a") + col("n_b") - col("c")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Exact J ≥ `threshold` pairs with AT LEAST ONE endpoint in `delta`,
    * over the union corpus `base ∪ delta` — the incremental-ingest
    * complement of [[nearDupPairs]]. A daily pipeline that already
    * holds labels (or pairs) for `base` only needs the edges TOUCHING
    * the new batch: base-internal pairs are a previous run's output.
    *
    * Candidate generation is the PPJoin prefix scheme under ONE global
    * rarity order computed over the UNION (the [[crossPairs]] stance —
    * the losslessness proof needs some fixed common order, and a pair
    * at J ≥ t shares a shingle inside the first n − ⌈t·n⌉ + 1 elements
    * of EACH side under any such order). Both orientations of a
    * delta-base pair are covered by joining the DELTA prefix index
    * against the full one; delta-delta pairs arrive twice and collapse
    * in the canonical least/greatest distinct. Size and positional
    * filters run inside the join condition, exactly as the self-join.
    *
    * Scale shape: the self-join's Σ_s dfP(s)² becomes
    * Σ_s dfPΔ(s)·dfP(s) — linear in the batch for bounded prefix
    * frequencies — and the full-side prefix index is first SEMI-JOINED
    * to the batch's distinct prefix shingles, so the corpus-sized side
    * ships only rows whose shingle the batch actually mentions. The
    * union df count and the prefix window remain one linear pass over
    * the corpus (the price of NOT persisting any index between
    * increments: the only state this API needs from the previous run
    * is its labels).
    *
    * REPLICATION CAVEAT (measured): doc-level frequencies multiply by
    * g under g near-identical copies on BOTH sides of the candidate
    * join, so on replica-heavy corpora this LISTING inherits the g²
    * pathology — the 10× soak measured 409 s here where a full
    * CLUSTERED recompute takes 116 s. When only labels (not the pair
    * listing) are needed, use
    * [[ClusterDedup.componentsIncremental]], which runs the same
    * incremental idea at cluster granularity and stays at
    * distinct-content cost.
    */
  def nearDupPairsIncremental(
      base: DataFrame,
      delta: DataFrame,
      idCol: String,
      textCol: String,
      nGram: Int = 2,
      threshold: Double = 0.3): DataFrame = {
    // SEALED: materialize the (output-sized) listing, then release the
    // doc/prefix persists — the lazy form would leave those
    // MEMORY_AND_DISK blocks pinned for the session lifetime on every
    // call (the semanticDedup/components per-call block-leak class).
    // Callers that need the lazy frame use the Plan variant and own the
    // release closure.
    val (pairs, release) =
      nearDupPairsIncrementalPlan(base, delta, idCol, textCol, nGram, threshold)
    val out = Par.cut(pairs)
    release()
    out
  }

  /** [[nearDupPairsIncremental]] split before its seal: the LAZY pair
    * frame plus the closure releasing the doc/prefix persists once the
    * consumer has fully materialized downstream. Consumed by the sealed
    * public wrapper; kept private[graft] for probes that want to plan
    * or time the unsealed stream (ClusterDedup.componentsIncremental
    * does NOT consume this — its final design runs its own
    * cluster-granularity path; this doc-level listing is its measured
    * A/B arm, see IncProbe).
    */
  private[graft] def nearDupPairsIncrementalPlan(
      base: DataFrame,
      delta: DataFrame,
      idCol: String,
      textCol: String,
      nGram: Int,
      threshold: Double): (DataFrame, () => Unit) = {
    require(threshold > 0, "threshold must be > 0")
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // one tagged union feeds shingling ONCE per doc (df count, prefix
    // window, verify); no derived-column filter before the persist —
    // it would be pushed below Par.widen's exchange (the documented
    // pushdown trap)
    val docs = Par.widen(
        base.select(col(idCol).as("id"), col(textCol).as("__t"), lit(false).as("__d"))
          .unionByName(
            delta.select(col(idCol).as("id"), col(textCol).as("__t"), lit(true).as("__d"))))
      .select(col("id"),
        graft.functions.NativeHash.shingleHashes(Text.tokens(col("__t")), nGram).as("__sh"),
        col("__d"))
      .select(col("id"), col("__sh"), size(col("__sh")).as("n"), col("__d"))
      .persist(MEMORY_AND_DISK)
    // shared prefix builder (combiner dfreq + AQE join-back — see
    // prefixIndex): df counted over the whole union, prefix positions
    // per doc, __d carried through. Lazy persist (the prefixCandidates
    // rationale: the concurrent materialization race rides idle cores
    // and measured faster than an eager cut at gate scale)
    val prefix = prefixIndex(
        docs.select(col("id"), explode(col("__sh")).as("s"), col("n"), col("__d")),
        "id", threshold, keep = Seq("__d"))
      .persist(MEMORY_AND_DISK)
    val dp = prefix.filter(col("__d"))
    // delta-active shingles only: the corpus-sized side of the candidate
    // join never ships a row the batch cannot match
    val fp = prefix.join(dp.select("s").distinct(), Seq("s"), "left_semi")
    val a = dp.select(col("s").as("__sa"), col("id").as("ia"),
      col("n").as("__na"), col("pos").as("__pa"))
    val b = fp.select(col("s").as("__sb"), col("id").as("ib"),
      col("n").as("__nb"), col("pos").as("__pb"))
    val alpha = ceil((col("__na") + col("__nb")) * (threshold / (1.0 + threshold)) - lit(Eps))
    val cand = a.join(b,
        col("__sa") === col("__sb") &&
        col("ia") =!= col("ib") &&
        greatest(col("__na"), col("__nb")) * threshold <=
          least(col("__na"), col("__nb")) + lit(Eps) &&
        lit(1) + least(col("__na") - col("__pa"), col("__nb") - col("__pb")) >= alpha)
      .select(least(col("ia"), col("ib")).as("id_a"),
        greatest(col("ia"), col("ib")).as("id_b"))
      .distinct()
    val alphaV = ceil((col("n_a") + col("n_b")) * (threshold / (1.0 + threshold)) - lit(Eps))
      .cast("int")
    val pairs = cand
      .join(docs.select(col("id").as("id_a"), col("__sh").as("__sha"), col("n").as("n_a")), Seq("id_a"))
      .join(docs.select(col("id").as("id_b"), col("__sh").as("__shb"), col("n").as("n_b")), Seq("id_b"))
      .withColumn("c", graft.functions.NativeHash.sortedIntersectAtLeast(
        col("__sha"), col("__shb"), alphaV))
      .filter(col("c") >= 0)
      .withColumn("jaccard", col("c") / (col("n_a") + col("n_b") - col("c")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
    (pairs, () => { docs.unpersist(false); prefix.unpersist(false); () })
  }

  /** Set-overlap self-join: every pair sharing ≥ `minOverlap` distinct
    * elements of a sorted-distinct set column (e.g. token-hash sets) —
    * the absolute-overlap sibling of the Jaccard join, used for
    * containment-style matching where a fixed amount of shared content
    * matters regardless of document length.
    *
    * Prefix filter (lossless): under ANY fixed global element order,
    * |A∩B| ≥ k forces a common element inside the first |·|−k+1
    * elements of each side — otherwise all ≥ k common elements would
    * have to sit in the last k−1 positions of one of them. So only the
    * prefixes enter the equi-join; the verify is the same codegen'd
    * sorted merge walk as the Jaccard path. Sets shorter than k cannot
    * qualify and are dropped before the explode.
    *
    * Scale note: prefixes here follow plain hash order, so a viral
    * element can sit inside prefixes and cost df² candidate rows; at
    * corpus scale switch the prefix order to ascending document
    * frequency exactly as `nearDupPairs`' PPJoin path does (rarity
    * order keeps viral elements out of every prefix — the lossless
    * proof only needs SOME fixed global order).
    */
  def overlapJoin(
      df: DataFrame, idCol: String, setCol: Column, minOverlap: Int): DataFrame = {
    require(minOverlap >= 1, "minOverlap must be >= 1")
    // NO size filter here: a deterministic filter on the derived set
    // would be pushed below Par.widen's exchange and shingle the corpus
    // on one core (the documented pushdown trap). Instead the prefix
    // length clamps to 0 for sets shorter than k — they emit no
    // candidate rows, which is the same outcome
    val base = Par.widen(df).select(col(idCol).as("id"), setCol.as("__set"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val prefix = base.select(col("id"),
      explode(slice(col("__set"), lit(1),
        greatest(lit(0), size(col("__set")) - minOverlap + 1))).as("e"))
    val cand = prefix.as("a")
      .join(prefix.as("b"), col("a.e") === col("b.e") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b")).distinct()
    cand
      .join(base.select(col("id").as("id_a"), col("__set").as("__sa")), Seq("id_a"))
      .join(base.select(col("id").as("id_b"), col("__set").as("__sb")), Seq("id_b"))
      .withColumn("overlap",
        graft.functions.NativeHash.sortedIntersectCount(col("__sa"), col("__sb")).cast("long"))
      .filter(col("overlap") >= minOverlap)
      .select("id_a", "id_b", "overlap")
  }

  /** Dedup: drop every doc that near-dups an earlier (lower-id) doc. */
  def dedup(df: DataFrame, idCol: String, textCol: String,
      nGram: Int = 2, threshold: Double = 0.3): DataFrame = {
    val losers = nearDupPairs(df, idCol, textCol, nGram, threshold)
      .select(col("id_b").as(idCol)).distinct()
    df.join(losers, Seq(idCol), "left_anti")
  }

  /** Cross-corpus contamination pairs: (left_id, right_id, jaccard) for
    * every left doc sharing ≥ threshold n-gram Jaccard with a right doc
    * — the train-vs-benchmark decontamination check of LLM pipelines.
    *
    * PPJoin-style prefix filtering, cross-corpus flavor: both sides'
    * prefixes are selected under ONE global order — ascending document
    * frequency summed across the two corpora, ties by hash — and the
    * lossless-candidate proof is the self-join's verbatim (a pair at
    * J ≥ t shares a shingle inside the first n − ⌈t·n⌉ + 1 elements of
    * each side under ANY common fixed order). The pre-prefix-filter
    * inverted-index join this replaces shipped every (shingle, left,
    * right) co-occurrence row into a pair-count exchange — Σ_s
    * dfL(s)·dfR(s) rows, ×100 under 10× near-dup replication (the r13
    * soak's 28× wall); prefixes at t = 0.5 halve each index and the
    * rarity order keeps viral shingles out of every prefix, so the
    * distinct exchange carries candidate PAIRS, not co-occurrences.
    * Verification is the same early-exit sorted merge walk as the
    * self-join — exact c, exact jaccard, identical output.
    */
  def crossPairs(
      left: DataFrame, leftId: String,
      right: DataFrame, rightId: String,
      textCol: String,
      nGram: Int = 2,
      threshold: Double = 0.3): DataFrame = {
    require(threshold > 0, "threshold must be > 0")
    // one persisted doc table per side carries the sorted hash array
    // (feeds the df count, the prefix window AND verify); no derived-
    // column filter before the persist — it would be pushed below
    // Par.widen's exchange and shingle the corpus on one core
    def docsOf(df: DataFrame, idCol: String, outId: String) = Par.widen(df)
      .select(col(idCol).as(outId),
        graft.functions.NativeHash.shingleHashes(Text.tokens(col(textCol)), nGram).as("__sh"))
      .select(col(outId), col("__sh"), size(col("__sh")).as("n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ld = docsOf(left, leftId, "left_id")
    val rd = docsOf(right, rightId, "right_id")
    // NO eager cache-materialization action: the main query's AQE
    // stages race to build the ld/rd caches and re-shingle parts of
    // the corpus, but that duplicated work overlaps on otherwise-idle
    // cores — the r18 A/B measured an explicit materialization action
    // 15-35% SLOWER across the decontaminate family (it serializes a
    // full tokenize pass the query pipeline hides).
    // the common global rarity order: df summed over BOTH corpora
    val dfreq = ld.select(explode(col("__sh")).as("s"))
      .union(rd.select(explode(col("__sh")).as("s")))
      .groupBy("s").agg(count(lit(1)).as("df"))
    def prefixOf(docs: DataFrame, idCol: String) = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col(idCol)).orderBy(col("df").asc, col("s").asc)
      docs.select(col(idCol), explode(col("__sh")).as("s"), col("n"))
        .join(dfreq, Seq("s"))
        .withColumn("pos", row_number().over(w))
        .filter(col("pos") <= col("n") - ceil(col("n") * threshold - lit(Eps)) + 1)
        .select(col("s"), col(idCol), col("n").as(s"n_$idCol"), col("pos").as(s"p_$idCol"))
    }
    // benchmark corpora are small by nature (that is the decontamination
    // use case), so the right prefix index is broadcast: the train index
    // — the 100 TB side — streams map-side and never shuffles for this
    // join; only distinct candidate pairs reach an exchange. The size
    // and positional filters run INSIDE the join condition, so pruned
    // rows never reach the pair-distinct exchange.
    val alpha = ceil((col("n_left_id") + col("n_right_id")) * (threshold / (1.0 + threshold)) - lit(Eps))
    val lp = prefixOf(ld, "left_id")
    val rp = prefixOf(rd, "right_id")
    val candidates = lp.join(broadcast(rp),
        lp("s") === rp("s") &&
        greatest(col("n_left_id"), col("n_right_id")) * threshold <=
          least(col("n_left_id"), col("n_right_id")) + lit(Eps) &&
        lit(1) + least(col("n_left_id") - col("p_left_id"),
          col("n_right_id") - col("p_right_id")) >= alpha)
      .select("left_id", "right_id")
      .distinct()
    val alphaV = ceil((col("n_l") + col("n_r")) * (threshold / (1.0 + threshold)) - lit(Eps)).cast("int")
    candidates
      .join(ld.select(col("left_id"), col("__sh").as("__shl"), col("n").as("n_l")), Seq("left_id"))
      .join(broadcast(rd.select(col("right_id"), col("__sh").as("__shr"), col("n").as("n_r"))), Seq("right_id"))
      .withColumn("c", graft.functions.NativeHash.sortedIntersectAtLeast(
        col("__shl"), col("__shr"), alphaV))
      .filter(col("c") >= 0)
      .withColumn("jaccard", col("c") / (col("n_l") + col("n_r") - col("c")))
      .filter(col("jaccard") >= threshold)
      .select(col("left_id"), col("right_id"), col("jaccard"))
  }

  /** crossPairs with a Bloom-filter pre-prune of the (huge) left/train
    * side. At 100 TB the exact benchmark shingle index is the broadcast
    * in crossPairs; when even that is uncomfortably large, a Bloom
    * filter at ~1% fpp costs ~10 bits per shingle (20-60× smaller than
    * the exact long set) and drops almost every clean train doc in the
    * scan itself, BEFORE its shingles are exploded into the join.
    *
    * The prune is provably lossless: J(a,b) = o/(n_a+n_b−o) with
    * n_b ≥ o gives J ≤ o/n_a, so J ≥ t requires overlap o ≥ t·n_a —
    * and Bloom false positives only OVERcount the apparent overlap.
    * Survivors then run the exact crossPairs verify, so the result is
    * identical to the unpruned operator (the driver gate pins this
    * against the same DuckDB oracle as `decontaminate`).
    */
  def crossPairsBloom(
      left: DataFrame, leftId: String,
      right: DataFrame, rightId: String,
      textCol: String,
      nGram: Int = 2,
      threshold: Double = 0.3,
      fpp: Double = 0.01): DataFrame = {
    require(threshold > 0, "threshold must be > 0")
    val rh = right
      .select(explode(
        graft.functions.NativeHash.shingleHashes(Text.tokens(col(textCol)), nGram)).as("s"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nShingles = math.max(rh.count(), 1L) // bounded: benchmark corpus
    val bf = rh.stat.bloomFilter("s", nShingles, fpp)
    rh.unpersist(false)
    val bbf = left.sparkSession.sparkContext.broadcast(bf)
    // one UDF doing count-and-compare so the (expensive) shingle child
    // evaluates once per row — FilterExec does no subexpression
    // elimination, so `hits(sh) >= t * size(sh)` would shingle twice.
    // o ≥ t·n_a, fp-conservative on the product like the PPJoin bounds.
    // null text ⇒ null shingle array: drop, matching explode() in the
    // exact path. asNondeterministic keeps the filter ABOVE any
    // upstream repartition (a deterministic one is pushed below
    // Par.widen's exchange and shingles the corpus on one core — the
    // documented round-4 pushdown trap).
    val keep = udf((arr: scala.collection.Seq[Long]) => {
      if (arr == null) false
      else {
        val b = bbf.value
        arr.count(b.mightContainLong).toDouble >= threshold * arr.length - 1e-9
      }
    }).asNondeterministic()
    val sh = graft.functions.NativeHash.shingleHashes(Text.tokens(col(textCol)), nGram)
    crossPairs(left.filter(keep(sh)), leftId, right, rightId, textCol, nGram, threshold)
  }

  /** Decontaminate: drop every left (train) doc contaminated by the
    * right (benchmark) corpus at the given similarity.
    */
  def decontaminate(
      train: DataFrame, trainId: String,
      benchmark: DataFrame, benchId: String,
      textCol: String,
      nGram: Int = 2,
      threshold: Double = 0.5): DataFrame = {
    val dirty = crossPairs(train, trainId, benchmark, benchId, textCol, nGram, threshold)
      .select(col("left_id").as(trainId)).distinct()
    train.join(dirty, Seq(trainId), "left_anti")
  }
}
