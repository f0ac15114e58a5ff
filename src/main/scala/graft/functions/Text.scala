package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for training-data pipelines. All pure
  * Column expressions — whole-stage-codegen'd, no UDFs — so they run at
  * scan speed over 100 TB of documents.
  */
object Text {

  /** Whitespace tokenizer (lowercased, empties dropped). */
  def tokens(c: Column): Column =
    filter(split(lower(c), "\\s+"), t => length(t) > 0)

  /** Token count on raw whitespace split — the "BPE-ish" variant counts
    * word pieces: runs of letters, digits, or single punctuation.
    */
  def tokenCount(c: Column): Column = size(tokens(c))

  /** Token classes: letter runs, digit runs, single non-alnum non-space
    * chars — same regex DuckDB's `regexp_extract_all` oracle uses.
    * (A lookaround `split` is wrong here: whitespace runs survive as
    * elements and inflate the count.)
    */
  def bpeishTokenCount(c: Column): Column =
    size(regexp_extract_all(c, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  /** Word n-gram shingles: contiguous n-token windows joined by a space.
    * Empty result when the doc has fewer than n tokens.
    */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) < n, array().cast("array<string>")).otherwise(
      transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))

  /** Character n-gram shingles (for short/unsegmented text, e.g. zh). */
  def charShingles(c: Column, n: Int): Column =
    when(length(c) < n, array().cast("array<string>")).otherwise(
      transform(sequence(lit(1), length(c) - n + 1), i => c.substr(i, lit(n))))

  /** n-gram Jaccard similarity between two shingle *sets*. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val union = size(array_union(a, b)).cast("double")
    when(union === 0, lit(0.0)).otherwise(inter / union)
  }

  /** Quality score in [0,1]: blend of length, alpha ratio, punctuation
    * ratio, stopword ratio, and mean word length — the standard cheap
    * pre-filter heuristics for web-scale corpus cleaning. Deterministic
    * arithmetic, SQL-expressible (oracle-checked in SparkEntry).
    */
  def qualityScore(text: Column): Column = {
    val len = length(text).cast("double")
    val nonSpace = length(regexp_replace(text, "\\s", "")).cast("double")
    val alpha = length(regexp_replace(text, "[^A-Za-z]", "")).cast("double")
    val punct = length(regexp_replace(text, "[^.,;:!?]", "")).cast("double")
    val toks = tokens(text)
    val nTok = size(toks).cast("double")
    val stop = size(filter(toks, t => t.isin(EnStopwords: _*))).cast("double")
    val lenScore = least(len / 1000.0, lit(1.0))
    val alphaRatio = when(nonSpace > 0, alpha / nonSpace).otherwise(0.0)
    val punctPenalty = when(nonSpace > 0, greatest(lit(0.0), lit(1.0) - punct * 10.0 / nonSpace)).otherwise(1.0)
    val stopRatio = when(nTok > 0, stop / nTok).otherwise(0.0)
    val meanWord = when(nTok > 0, nonSpace / nTok).otherwise(0.0)
    val wordScore = when(meanWord >= 3 && meanWord <= 10, 1.0).otherwise(0.5)
    round((lenScore * 0.3 + alphaRatio * 0.3 + punctPenalty * 0.1 +
      stopRatio * 0.2 + wordScore * 0.1), 6)
  }

  val EnStopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "are", "was",
    "it", "that", "this", "for", "on", "with", "as", "at", "by", "be")

  /** Language-ID heuristic: stopword-hit counts per language over the
    * token set; argmax with deterministic tie-break on language code.
    * (n-gram/stopword heuristics are the standard cheap langid; a real
    * deployment would swap in a fastText-style model via mapInPandas.)
    */
  def langId(text: Column): Column = {
    val toks = tokens(text)
    val scores = LangStopwords.toSeq.sortBy(_._1).map { case (lang, words) =>
      struct(size(filter(toks, t => t.isin(words: _*))).as("hits"), lit(lang).as("lang"))
    }
    // argmax by (hits, lang-reversed) — array_max picks lexicographically
    // greatest struct; negate nothing, ties break toward later lang code,
    // made deterministic by sorting input.
    array_max(array(scores: _*)).getField("lang")
  }

  val LangStopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "for", "with"),
    "fr" -> Seq("le", "la", "les", "de", "et", "un", "une", "est", "que", "pour"),
    "es" -> Seq("el", "la", "los", "de", "y", "un", "una", "es", "que", "para"),
    "de" -> Seq("der", "die", "das", "und", "ein", "eine", "ist", "zu", "mit", "von"),
    "zh" -> Seq("的", "了", "是", "在", "我", "有", "和", "就", "不", "人"))

  /** Intra-document repetition: fraction of n-gram OCCURRENCES that are
    * duplicates of an earlier one, 1 − distinct/total (0 when the doc
    * has fewer than n tokens). The standard boilerplate/spam signal in
    * corpus quality rules: high values mean the doc repeats itself.
    */
  def repetitionRatio(text: Column, n: Int): Column =
    NativeHash.shingleDupRatio(tokens(text), n)

  /** PII redaction: replace email addresses, phone-like digit runs, and
    * IPv4 literals with typed placeholder tokens — the standard cheap
    * scrub pass before corpus publication. Regex-only (deterministic,
    * SQL-expressible, oracle-checked); a production pipeline can layer an
    * NER model on top via mapInPandas, but the regex tier is what runs
    * over every byte at 100 TB. Order matters: emails first (their local
    * part would otherwise partially match the phone pattern).
    */
  def redactPii(text: Column): Column = {
    val email = regexp_replace(text,
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")
    val ip = regexp_replace(email,
      "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b", "<IP>")
    regexp_replace(ip,
      "\\+?\\d[\\d ()-]{7,}\\d", "<PHONE>")
  }

  /** Document fingerprint: polynomial rolling hash over the text's
    * codepoints, mod a 30-bit prime (no overflow at long width). One pass,
    * pure codegen. Equal texts ⟹ equal fingerprints; used for cheap
    * exact-dup detection without shipping full text through the shuffle.
    */
  def fingerprint(text: Column): Column =
    aggregate(
      transform(split(text, ""), ch => ascii(ch).cast("long")),
      lit(0L),
      (acc, cp) => pmod(acc * 31L + cp, lit(1000000007L)))
}
