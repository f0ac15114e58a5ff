package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Bpe

/** BPE merge-loop semantics (greedy best-rank, all occurrences left to
  * right) against a one-merge-at-a-time reference model — the form the
  * DuckDB oracle iterates — plus the fixture's constituents-first
  * property that makes the two equivalent, and the dictionary plan's
  * count fan-out.
  */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** One-merge-at-a-time reference: leftmost occurrence of the
    * best-ranked applicable pair, re-selecting the global best each
    * step (the oracle's recursion, in Scala).
    */
  private def refEncode(word: String): List[String] = {
    val ranks = Bpe.FixtureMerges.zipWithIndex.toMap
    var toks = word.map(_.toString).toList
    var done = false
    while (!done) {
      val best = toks.zip(toks.drop(1))
        .flatMap(p => ranks.get(p).map(r => (r, p))).sortBy(_._1).headOption
      best match {
        case None => done = true
        case Some((_, (x, y))) =>
          val i = toks.zip(toks.drop(1)).indexWhere(p => p == (x, y))
          toks = toks.take(i) ::: (x + y) :: toks.drop(i + 2)
      }
    }
    toks
  }

  test("fixture merges have the constituents-first property") {
    val formed = scala.collection.mutable.Set.empty[String]
    Bpe.FixtureMerges.foreach { case (x, y) =>
      assert(x.length == 1 || formed(x), s"left side '$x' used before formed")
      assert(y.length == 1 || formed(y), s"right side '$y' used before formed")
      formed += (x + y)
    }
    assert(Bpe.FixtureMerges.distinct.size == Bpe.FixtureMerges.size, "duplicate pair")
  }

  test("known words tokenize as expected") {
    assert(Bpe.encodeWord("the", Bpe.FixtureMerges).toSeq == Seq("the"))
    assert(Bpe.encodeWord("thin", Bpe.FixtureMerges).toSeq == Seq("th", "in"))
    assert(Bpe.encodeWord("x", Bpe.FixtureMerges).toSeq == Seq("x"))
    assert(Bpe.encodeWord("ing", Bpe.FixtureMerges).toSeq == Seq("ing"))
    // overlap-skip: "ththe" -> th,th,e -> th,the (rank2 after rank1 pass)
    assert(Bpe.encodeWord("ththe", Bpe.FixtureMerges).toSeq == Seq("th", "the"))
  }

  test("all-occurrences form equals the one-at-a-time oracle form on random words") {
    val rnd = new scala.util.Random(7)
    val alphabet = "theinandorsgluc"
    (0 until 500).foreach { _ =>
      val w = (0 until (1 + rnd.nextInt(14)))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      val fast = Bpe.encodeWord(w, Bpe.FixtureMerges).toList
      val ref = refEncode(w)
      assert(fast == ref, s"word '$w': engine=$fast oracle-form=$ref")
      assert(fast.mkString == w, s"tokens must concatenate back to '$w'")
    }
  }

  test("tokenCounts: dictionary plan equals per-occurrence truth") {
    val df = Seq(
      1L -> "The thing in the thing",
      2L -> "sing along and ring",
      3L -> "zzz qqq zzz",
      4L -> "",
      5L -> "漢字のみ").toDF("doc_id", "text")
    val got = Bpe.tokenCounts(df, "doc_id", "text")
      .as[(Long, Long, Long)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    def truth(text: String): (Long, Long) = {
      val words = "[a-z]+".r.findAllIn(text.toLowerCase).toSeq
      (words.size.toLong,
        words.map(w => Bpe.encodeWord(w, Bpe.FixtureMerges).length.toLong).sum)
    }
    assert(got(1L) == truth("The thing in the thing"))
    assert(got(2L) == truth("sing along and ring"))
    assert(got(3L) == truth("zzz qqq zzz"))
    assert(!got.contains(4L) && !got.contains(5L), "wordless docs must drop out")
  }

  test("tokenHistogram sums occurrence multiplicity through the word dictionary") {
    val df = Seq(1L -> "the the thin", 2L -> "thin x").toDF("doc_id", "text")
    val got = Bpe.tokenHistogram(df, "doc_id", "text")
      .as[(String, Long)].collect().toMap
    // the->the (x2); thin->th,in (x2); x->x
    assert(got == Map("the" -> 2L, "th" -> 2L, "in" -> 2L, "x" -> 1L))
  }

  /** Reference greedy trainer (pure JVM): k rounds of count-all-pairs
    * (frequency-weighted, overlaps counted) → (count DESC, pair ASC)
    * argmax → left-to-right scan-merge of all occurrences.
    */
  private def refLearn(wordFreq: Map[String, Long], k: Int): List[(Int, String, String)] = {
    var toks: Map[List[String], Long] =
      wordFreq.groupMapReduce { case (w, _) => w.toList.map(_.toString) }(_._2)(_ + _)
    val out = scala.collection.mutable.ListBuffer.empty[(Int, String, String)]
    for (r <- 1 to k) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((ts, f) <- toks; Seq(a, b) <- ts.sliding(2) if ts.length > 1)
        counts((a, b)) = counts.getOrElse((a, b), 0L) + f
      if (counts.nonEmpty && out.length == r - 1) {
        val (x, y) = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        out += ((r, x, y))
        toks = toks.groupMapReduce { case (ts, _) =>
          val o = scala.collection.mutable.ListBuffer.empty[String]
          var i = 0
          while (i < ts.length) {
            if (i < ts.length - 1 && ts(i) == x && ts(i + 1) == y) { o += x + y; i += 2 }
            else { o += ts(i); i += 1 }
          }
          o.toList
        }(_._2)(_ + _)
      }
    }
    out.toList
  }

  test("learnMerges equals the reference greedy trainer on a hand corpus") {
    val df = Seq(
      1L -> "the theme thin thin", 2L -> "other the rather",
      3L -> "thin gather the").toDF("doc_id", "text")
    val wf = Map("the" -> 3L, "theme" -> 1L, "thin" -> 3L, "other" -> 1L,
      "rather" -> 1L, "gather" -> 1L)
    val want = refLearn(wf, 6)
    val got = Bpe.learnMerges(df, "doc_id", "text", 6)
      .as[(Int, String, String)].collect().toList.sortBy(_._1)
    assert(got == want, s"\n got=$got\n want=$want")
    // 'th' (9 weighted occurrences) must be the first merge
    assert(got.head == ((1, "t", "h")))
  }

  test("learnMerges equals the reference trainer on randomized corpora (ties included)") {
    val rnd = new scala.util.Random(5)
    for (trial <- 0 until 3) {
      val vocabChars = "abcd"
      val words = (0 until 12).map(_ =>
        (0 until (2 + rnd.nextInt(5))).map(_ => vocabChars(rnd.nextInt(4))).mkString)
      val docs = (0 until 8).map(i =>
        (i.toLong, (0 until (1 + rnd.nextInt(6))).map(_ => words(rnd.nextInt(words.length)))
          .mkString(" "))).toDF("doc_id", "text")
      val wf = docs.as[(Long, String)].collect()
        .flatMap(_._2.split(" ")).filter(_.nonEmpty)
        .groupBy(identity).map { case (w, o) => w -> o.length.toLong }
      val want = refLearn(wf, 5)
      val got = Bpe.learnMerges(docs, "doc_id", "text", 5)
        .as[(Int, String, String)].collect().toList.sortBy(_._1)
      assert(got == want, s"trial $trial:\n got=$got\n want=$want\n wf=$wf")
    }
  }

  test("learnMerges stops early when pairs exhaust") {
    val df = Seq(1L -> "ab ab").toDF("doc_id", "text") // one word, one pair
    val got = Bpe.learnMerges(df, "doc_id", "text", 5)
      .as[(Int, String, String)].collect().toList
    assert(got == List((1, "a", "b")), s"got=$got")
  }
}
