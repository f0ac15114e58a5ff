package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SubstringDedup

/** Substring-level duplicated-span detection: planted shared substrings
  * MUST surface as merged spans at the right offsets; within-doc
  * repetition and sub-window shares MUST NOT.
  */
class SubstringDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val boiler = "0123456789abcdefghijklmnopqrstuvwxyz" // 36 chars

  test("a planted shared run is recovered as one merged span per doc") {
    // 72-char shared run >= window + stride - 1 (20 + 5 - 1) at any offset
    val shared = boiler + boiler
    val docs = Seq(
      (1L, "AAA" + shared + "BBB"),
      (2L, "CCCCC" + shared + "DDDDDD"),
      (3L, "totally unrelated text with nothing in common here at all")
    ).toDF("doc_id", "text")
    val spans = SubstringDedup.duplicatedSpans(docs, "doc_id", "text",
        window = 20, stride = 5, minDocs = 2)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(s => (s._1, s._2))
    assert(spans.map(_._1).toSeq == Seq(1L, 2L), s"one span per planted doc: ${spans.toSeq}")
    // spans live inside the planted region (1-based offsets)
    val s1 = spans(0)
    assert(s1._2 >= 4 && s1._3 <= 3 + shared.length,
      s"doc 1 span must sit inside the planted run: $s1")
    val s2 = spans(1)
    assert(s2._2 >= 6 && s2._3 <= 5 + shared.length,
      s"doc 2 span must sit inside the planted run: $s2")
    // stride guarantee: hit length >= run - 2*(stride-1) chars of the run
    assert(s1._4 >= shared.length - 2 * 4, s"span covers the run minus edge slack: $s1")
  }

  test("within-doc repetition alone does not flag (distinct-doc count)") {
    val docs = Seq(
      (1L, boiler + "===middle===" + boiler), // repeats itself, no partner doc
      (2L, "another doc that shares nothing with the first one at all..")
    ).toDF("doc_id", "text")
    val spans = SubstringDedup.duplicatedSpans(docs, "doc_id", "text",
      window = 20, stride = 5, minDocs = 2)
    assert(spans.count() == 0)
  }

  test("docs shorter than the window never emit windows or spans") {
    val docs = Seq((1L, "short"), (2L, "short")).toDF("doc_id", "text")
    assert(SubstringDedup.windowHashes(docs, "doc_id", "text", 20, 5).count() == 0)
    assert(SubstringDedup.duplicatedSpans(docs, "doc_id", "text", 20, 5).count() == 0)
  }

  test("duplicatedCharStats zero-fills clean docs and bounds dup_chars by doc_len") {
    val shared = boiler + boiler
    val docs = Seq(
      (1L, shared), (2L, shared + "tail"),
      (3L, "clean document with no duplicate content anywhere inside it")
    ).toDF("doc_id", "text")
    val stats = SubstringDedup.duplicatedCharStats(docs, "doc_id", "text",
        window = 20, stride = 5, minDocs = 2)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(stats.map(_._1).toSeq == Seq(1L, 2L, 3L))
    assert(stats(2)._3 == 0L && stats(2)._4 == 0L, s"clean doc zero-filled: ${stats(2)}")
    stats.foreach(s => assert(s._3 <= s._2, s"dup_chars <= doc_len: $s"))
    assert(stats(0)._3 == shared.length, s"doc 1 is fully duplicated: ${stats(0)}")
  }

  test("three-way duplicates flag in every participating doc") {
    val shared = boiler + boiler
    val docs = (1L to 3L).map(i => (i, s"prefix$i" + shared)).toDF("doc_id", "text")
    val spans = SubstringDedup.duplicatedSpans(docs, "doc_id", "text",
      window = 20, stride = 5, minDocs = 2)
    assert(spans.select("doc_id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
    // raising minDocs above the multiplicity empties the result
    val none = SubstringDedup.duplicatedSpans(docs, "doc_id", "text",
      window = 20, stride = 5, minDocs = 4)
    assert(none.count() == 0)
  }
}
