package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact substring-level duplicate-span detection — the sequence-level
  * dedup pass of a training-data pipeline (the intent of suffix-array
  * dedup à la Lee et al., "Deduplicating Training Data Makes Language
  * Models Better", ACL 2022), re-expressed as a Spark-shaped windowed
  * hash join instead of a monolithic suffix array.
  *
  * Fixed-length character windows are selected BY CONTENT, never by
  * position: a position-strided sample (every k-th offset) silently
  * requires the two copies of a duplicated run to sit at the same
  * offset mod k in both documents — unaligned copies, the common case,
  * are missed entirely. Content-keyed selection decides from the
  * window's bytes alone, so the two copies of any shared run select
  * the SAME relative positions no matter where the run starts. Two
  * selection schemes, same downstream pipeline:
  *
  *  - [[sampledWindows]]: keep a window iff hash(window) ≡ 0 (mod p) —
  *    the content-defined-chunking anchor rule. Expected 1/p of all
  *    windows survive; a shared run of length `window + Δ` is missed
  *    with probability (1−1/p)^(Δ+1) (p=4, Δ=40 → ~10⁻⁵). Cheapest.
  *  - [[winnowedWindows]]: winnowing (Schleimer, Wilkerson & Aiken,
  *    "Winnowing: Local Algorithms for Document Fingerprinting",
  *    SIGMOD 2004): in every run of `guard` consecutive window hashes
  *    keep the rightmost minimum. HARD guarantee: every shared run of
  *    length ≥ window + guard − 1 shares at least one fingerprint,
  *    and at most ~2/(guard+1) of windows are kept.
  *
  * Scale shape (the reason this is not a suffix array): selection runs
  * ROW-LOCALLY inside higher-order array expressions over each text —
  * nothing reaches an exchange until the ~n/p (or ~2n/guard) selected
  * fingerprints explode, and each shuffled row is only (doc_id, pos,
  * hash). Duplicate detection is a partial-agg distinct-count per
  * hash; span recovery is a semi-join back on the hash; the final
  * merge is a per-document interval-island window (the
  * [[TimeSeries.mergeIntervals]] pattern, skew bounded by document
  * length). No all-pairs join and no driver state anywhere. A suffix
  * array needs a global order over the whole corpus and cross-shard
  * stitching; this shape is one shuffle of fixed-width rows.
  *
  * Hash families: the native path selects and groups on xxhash64
  * (codegen'd; grouping adds an independent second hash — a false
  * duplicate needs a 128-bit double collision). The portable path uses
  * the md5-derived folds every SQL engine reproduces
  * ([[graft.functions.NativeHash.fold60]], the compiled twin of
  * [[SimHashDedup.portableTokenHash]]) so a DuckDB differential
  * oracle can regenerate selection AND grouping bit-for-bit — the
  * same native-vs-portable split `dedup_simhash` uses. Both families
  * run selection in compiled per-document passes, never interpreted
  * higher-order folds.
  */
object SubstringDedup {

  /** 1-based window-start positions paired with the text, for docs long
    * enough to hold at least one window.
    */
  private def withText(df: DataFrame, idCol: String, textCol: String, window: Int) = {
    require(window > 0, s"window must be positive (got $window)")
    df.filter(length(col(textCol)) >= window)
      .select(col(idCol).as("doc_id"), col(textCol).as("__t"))
  }

  /** Hash of a selected window for grouping: the portable 60-bit md5
    * fold (what the DuckDB oracle regenerates) or codegen'd xxhash64.
    * Only the ~n/p (resp. ~2n/guard) SELECTED windows pay this — the
    * per-position selection hash lives inside the native selection
    * expressions ([[graft.functions.NativeHash.SubstringSelectHelper]]).
    */
  private def windowRows(selected: DataFrame, window: Int, portable: Boolean): DataFrame = {
    val hashOf: Column => Column =
      if (portable) graft.functions.NativeHash.fold60 else (w: Column) => xxhash64(w)
    val win = col("__t").substr(col("pos"), lit(window))
    selected.select(col("doc_id"), col("pos"),
      hashOf(win).as("h1"),
      (if (portable) lit(0L) else xxhash64(win, lit(1))).as("h2"))
  }

  /** Content-mod selected windows → (doc_id, pos, h1, h2). A window at
    * 1-based `pos` survives iff hash(window) ≡ 0 (mod sampleMod); h2 is
    * the independent grouping hash on the native path (constant 0 on
    * the portable path, where the 60-bit fold itself is the group key).
    * Selection runs in one compiled pass per document
    * (`content_mod_positions`), not an interpreted per-position HOF.
    */
  def sampledWindows(
      df: DataFrame, idCol: String, textCol: String,
      window: Int, sampleMod: Int = 4, portable: Boolean = false): DataFrame = {
    require(sampleMod >= 1, s"sampleMod must be >= 1 (got $sampleMod)")
    val base = withText(df, idCol, textCol, window)
    windowRows(
      base.select(col("doc_id"),
        explode(graft.functions.NativeHash.contentModPositions(
          col("__t"), window, sampleMod, portable)).as("pos"),
        col("__t")),
      window, portable)
  }

  /** Winnowing-selected windows → (doc_id, pos, h1, h2). In every run
    * of `guard` consecutive positions the window whose 64-bit hash is
    * minimal under UNSIGNED comparison (rightmost on ties — "robust
    * winnowing") is kept; that is exactly the order of the string keys
    * `hex16(hash) ++ zeropad(10⁹ − pos)` the DuckDB oracle sorts.
    * Selection is a compiled monotone-deque sliding minimum
    * (`winnow_positions`), O(n) per document; documents shorter than
    * window+guard−1 still yield one fingerprint from their single
    * end-clipped run.
    */
  def winnowedWindows(
      df: DataFrame, idCol: String, textCol: String,
      window: Int, guard: Int = 8, portable: Boolean = false): DataFrame = {
    require(guard >= 1, s"guard must be >= 1 (got $guard)")
    val base = withText(df, idCol, textCol, window)
    windowRows(
      base.select(col("doc_id"),
        explode(graft.functions.NativeHash.winnowPositions(
          col("__t"), window, guard, portable)).as("pos"),
        col("__t")),
      window, portable)
  }

  /** Shared back half: windows whose content occurs in ≥ minDocs
    * DISTINCT documents, merged into maximal per-document spans →
    * (doc_id, span_start, span_end, span_len, n_windows).
    * Within-document repetition alone does NOT flag a span
    * (distinct-doc count, not occurrence count) — that axis is
    * [[graft.functions.Text.repetitionRatio]]'s job.
    */
  private[operators] def spansFromWindows(
      wins: DataFrame, window: Int, minDocs: Int): DataFrame = {
    require(minDocs >= 2, s"minDocs must be >= 2 (got $minDocs)")
    // wins feeds BOTH the distinct-doc aggregate and the span semi-join:
    // persist so the selection subtree executes once, and materialize
    // the (much smaller) merged-span result so the cache can be RELEASED
    // here instead of leaking for the session. Par.cut uses a reliable
    // checkpoint when the session has a checkpoint dir (production),
    // else executor-local blocks (the Components.scala caveat).
    val w = wins.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val dup = w.groupBy("h1", "h2")
        .agg(countDistinct(col("doc_id")).as("__nd"))
        .filter(col("__nd") >= minDocs)
        .select("h1", "h2")
      val spans = w.join(dup, Seq("h1", "h2"), "left_semi")
        .select(col("doc_id"), col("pos").as("span_start"),
          (col("pos") + (window - 1)).as("span_end"))
      Par.cut(TimeSeries.mergeIntervals(spans, "doc_id", "span_start", "span_end")
        .select(col("doc_id"), col("span_start"), col("span_end"),
          (col("span_end") - col("span_start") + 1L).as("span_len"),
          col("n_merged").as("n_windows")))
    } finally w.unpersist()
  }

  /** Maximal duplicated spans under content-mod sampling. */
  def duplicatedSpans(
      df: DataFrame, idCol: String, textCol: String,
      window: Int = 40, sampleMod: Int = 4, minDocs: Int = 2,
      portable: Boolean = false): DataFrame =
    spansFromWindows(
      sampledWindows(df, idCol, textCol, window, sampleMod, portable), window, minDocs)

  /** Maximal duplicated spans under winnowing — every shared run of
    * length ≥ window + guard − 1 is guaranteed to surface.
    */
  def winnowedSpans(
      df: DataFrame, idCol: String, textCol: String,
      window: Int = 30, guard: Int = 8, minDocs: Int = 2,
      portable: Boolean = false): DataFrame =
    spansFromWindows(
      winnowedWindows(df, idCol, textCol, window, guard, portable), window, minDocs)

  /** Corpus summary of a span pass: per-document duplicated character
    * mass — the "how much of my corpus is boilerplate" number a
    * curation run reports. Spans from either selection scheme.
    */
  def duplicatedCharStats(
      df: DataFrame, idCol: String, textCol: String, spans: DataFrame): DataFrame = {
    val agg = spans.groupBy("doc_id")
      .agg(sum(col("span_len")).as("dup_chars"), count(lit(1)).as("n_spans"))
    df.select(col(idCol).as("doc_id"), length(col(textCol)).cast("long").as("doc_len"))
      .join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"), col("doc_len"),
        coalesce(col("dup_chars"), lit(0L)).as("dup_chars"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"))
  }
}
