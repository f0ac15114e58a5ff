package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Shims
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding token counts — the tokenizer-ACCURATE arm of the
  * text family (`text_tokens`/`pack_sequences` count whitespace/regex
  * tokens; a training pipeline budgets sequence packing in BPE tokens).
  *
  * Algorithm (Sennrich, Haddow & Birch, "Neural Machine Translation of
  * Rare Words with Subword Units", ACL 2016; the GPT-2 runtime form):
  * pre-tokenize into words, start each word as characters, repeatedly
  * merge the best-ranked adjacent pair (ALL occurrences, left to
  * right) until no pair in the merges table remains. The merges table
  * here is a deterministic FIXTURE (common English bigrams) with the
  * CONSTITUENTS-FIRST property every learned BPE table has by
  * construction — each side of a pair is a single character or the
  * product of a strictly earlier merge. That property is load-bearing
  * for the oracle: it makes "merge all occurrences of the best pair"
  * equivalent to "merge the leftmost best-pair occurrence, one at a
  * time, re-selecting the global best each step" (a newly created
  * token's pairs always rank AFTER the merge that created it, so the
  * one-at-a-time walk keeps draining the same pair's occurrences left
  * to right — including the overlap-skip, since a consumed occurrence
  * disappears for both forms). The DuckDB oracle iterates the
  * one-at-a-time form in a recursive CTE; the engine runs the
  * all-at-once loop — one truth, two evaluation orders.
  *
  * Scale shape (the dictionary plan, [[tokenCounts]]): the per-word
  * merge loop runs ONCE PER DISTINCT WORD, not per occurrence — word
  * frequencies are Zipfian, so the expensive loop touches the
  * vocabulary (millions) while the corpus-sized side is a narrow
  * (word → count) equi-join Spark plans as broadcast or shuffled hash
  * by size. No driver materialization; the merges table is a tiny
  * broadcast inside the expression itself.
  */
object Bpe {

  /** Fixture merges, rank = position (1-based). Constituents-first:
    * "th"←1, "in"←3, "an"←4, "er"←5, "le"←18 are all created before
    * any pair that uses them. Mirrored VERBATIM by the DuckDB oracle's
    * VALUES list (SparkEntry `bpeSqlScaffold`) — the gate catches drift.
    */
  val FixtureMerges: Seq[(String, String)] = Seq(
    "t" -> "h", "th" -> "e", "i" -> "n", "a" -> "n", "e" -> "r",
    "o" -> "n", "r" -> "e", "in" -> "g", "o" -> "r", "e" -> "n",
    "a" -> "t", "e" -> "s", "o" -> "u", "s" -> "t", "an" -> "d",
    "a" -> "r", "a" -> "l", "l" -> "e", "c" -> "h", "o" -> "m",
    "er" -> "s", "u" -> "s", "i" -> "s", "i" -> "t", "le" -> "s")

  /** Greedy BPE over one word (pure JVM, no Spark types) — exposed for
    * the spec's reference-model checks.
    */
  def encodeWord(word: String, merges: Seq[(String, String)]): Array[String] = {
    val ranks = merges.zipWithIndex.toMap
    var toks: Array[String] = {
      val a = new Array[String](word.length)
      var i = 0
      while (i < word.length) { a(i) = String.valueOf(word.charAt(i)); i += 1 }
      a
    }
    var continue = toks.length > 1
    while (continue) {
      var best = Int.MaxValue
      var i = 0
      while (i < toks.length - 1) {
        val r = ranks.getOrElse((toks(i), toks(i + 1)), Int.MaxValue)
        if (r < best) best = r
        i += 1
      }
      if (best == Int.MaxValue) continue = false
      else {
        val (x, y) = merges(best)
        val out = new scala.collection.mutable.ArrayBuffer[String](toks.length)
        var j = 0
        while (j < toks.length) {
          if (j < toks.length - 1 && toks(j) == x && toks(j + 1) == y) {
            out += x + y; j += 2
          } else { out += toks(j); j += 1 }
        }
        toks = out.toArray
        continue = toks.length > 1
      }
    }
    toks
  }

  final class BpeHelper(merges: Seq[(String, String)]) extends Serializable {
    def tokens(word: UTF8String): ArrayData =
      new GenericArrayData(
        encodeWord(word.toString, merges).map(UTF8String.fromString(_)))
  }

  /** BPE tokens of one (pre-tokenized) word as array<string> — a
    * compiled per-row loop participating in whole-stage codegen, per
    * SURVEY §2.8's preference order (native Expression > UDF).
    */
  case class BpeTokensExpr(child: Expression, merges: Seq[(String, String)])
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes = Seq(StringType)
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    @transient private lazy val helper = new BpeHelper(merges)
    override def nullSafeEval(input: Any): Any =
      helper.tokens(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val h = ctx.addReferenceObj("bpeHelper", helper, classOf[BpeHelper].getName)
      defineCodeGen(ctx, ev, c => s"$h.tokens($c)")
    }
    override protected def withNewChildInternal(newChild: Expression): BpeTokensExpr =
      copy(child = newChild)
    override def prettyName: String = "bpe_tokens"
  }

  /** Column form over the fixture merges. */
  def bpeTokens(word: Column): Column =
    Shims.column(BpeTokensExpr(Shims.expression(word), FixtureMerges))

  /** The shared pre-tokenizer: lowercased maximal `[a-z]+` runs — the
    * word boundary both engines can express identically
    * (`regexp_extract_all`). Docs without a single run drop out (the
    * explode), matching the oracle's inner join.
    */
  private def words(df: DataFrame, idCol: String, textCol: String): DataFrame =
    graft.operators.Par.widen(df)
      .select(col(idCol),
        explode(regexp_extract_all(lower(col(textCol)), lit("[a-z]+"), lit(0))).as("w"))

  /** Per-doc BPE statistics via the DICTIONARY plan: run the merge loop
    * once per distinct word, then fan counts back through a (word →
    * n_tokens) equi-join. Output (idCol, n_words, n_bpe).
    */
  def tokenCounts(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val occ = words(df, idCol, textCol)
    val dict = occ.select(col("w")).distinct()
      .select(col("w"), size(bpeTokens(col("w"))).as("__n"))
    occ.join(dict, Seq("w"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"), sum(col("__n")).as("n_bpe"))
  }

  /** GREEDY BPE TRAINING (Sennrich et al. 2016 — the learner whose
    * output table [[FixtureMerges]] stands in for at encode time): `k`
    * merge rounds over the corpus vocabulary. Round i counts every
    * adjacent token pair across the CURRENT tokenization — weighted by
    * word frequency, overlapping occurrences counted, the standard
    * formulation — picks the (count DESC, x ASC, y ASC) argmax, and
    * merges all its occurrences left to right in every word. Output
    * (rank, x, y), rank 1-based; fewer than k rows when pairs exhaust.
    *
    * Left-to-right-fold equivalence: the per-round application folds
    * tokens with "merge when (last(acc), t) = (x, y)". This equals the
    * scan-by-index form exactly, because a just-merged token `xy` can
    * never itself re-match as the LEFT side within the same round
    * (that needs xy = x, impossible with y non-empty) — so both forms
    * consume occurrences left to right, non-overlapping. The same
    * argument makes the DuckDB oracle's one-occurrence-at-a-time
    * recursive form equal again: re-merging the leftmost remaining
    * occurrence repeatedly visits the identical positions.
    *
    * Scale shape: ONE corpus-sized pass (the word-frequency aggregate);
    * every round after that touches only the VOCABULARY (Zipf: ≪ the
    * corpus) — one narrow pair aggregate + a 1-row argmax collect per
    * round, the evolving tokenization lineage-cut per round (k rounds
    * would otherwise stack k analyzer layers) and the previous round's
    * blocks freed. The HOF pair-explode/fold lambdas are interpreted,
    * the right trade here: they run once per distinct WORD per round,
    * never per occurrence (the [[tokenCounts]] dictionary stance).
    * Exact greedy training costs k vocabulary passes by construction —
    * the classic single-machine trainer amortizes them with a mutable
    * pair-count cache, which has no shared-nothing analogue; this is
    * the exact distributed form, with k as the caller's budget knob.
    */
  def learnMerges(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    import graft.operators.Par
    val spark = df.sparkSession
    import spark.implicits._
    val wf = words(df, idCol, textCol).groupBy("w").agg(count(lit(1)).as("f"))
    var toks = Par.cut(wf.select(col("f"),
      expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))").as("ts")))
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String)]
    var round = 1
    var exhausted = false
    while (round <= k && !exhausted) {
      val best = toks.where(size(col("ts")) > 1)
        .select(col("f"), explode(expr(
          // Spark SQL array subscripts are 0-based
          "transform(sequence(0, size(ts) - 2), j -> named_struct('x', ts[j], 'y', ts[j + 1]))")).as("p"))
        .groupBy(col("p.x").as("x"), col("p.y").as("y"))
        .agg(sum(col("f")).as("cnt"))
        .orderBy(col("cnt").desc, col("x").asc, col("y").asc)
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (x, y) = (best(0).getString(0), best(0).getString(1))
        merges += ((round, x, y))
        val xL = lit(x); val yL = lit(y)
        val folded = aggregate(col("ts"), array().cast("array<string>"),
          (acc, t) => when(size(acc) > 0 &&
              acc(size(acc) - 1) === xL && t === yL, // 0-based last element
            concat(slice(acc, lit(1), size(acc) - 1), array(concat(xL, yL))))
            .otherwise(concat(acc, array(t))))
        val prev = toks
        toks = Par.cut(prev.select(col("f"), folded.as("ts")))
        Par.free(prev)
      }
      round += 1
    }
    Par.free(toks)
    merges.toSeq.toDF("rank", "x", "y")
  }

  /** Corpus-wide BPE token histogram (token → occurrences), through the
    * same dictionary: tokens explode once per DISTINCT word, occurrence
    * multiplicity arrives as a pre-aggregated per-word count — the
    * corpus-sized side never carries an array.
    */
  def tokenHistogram(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val occ = words(df, idCol, textCol)
    val wordFreq = occ.groupBy(col("w")).agg(count(lit(1)).as("__f"))
    wordFreq
      .select(explode(bpeTokens(col("w"))).as("token"), col("__f"))
      .groupBy(col("token"))
      .agg(sum(col("__f")).as("cnt"))
  }
}
