package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SubstringDedup

/** Substring-level duplicated-span detection: planted shared substrings
  * MUST surface as merged spans at the right offsets regardless of
  * alignment (content-keyed selection), within-doc repetition and
  * sub-window shares MUST NOT.  Pins the NATIVE xxhash64 path that the
  * driver gate (portable-oracle rows) does not exercise.
  */
class SubstringDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val boiler = "0123456789abcdefghijklmnopqrstuvwxyz" // 36 chars
  private val shared = boiler + boiler // 72-char planted run

  test("sampleMod=1 keeps every window: planted run recovered exactly, unaligned offsets") {
    // Copies sit at offsets 4 and 6 (1-based) — different alignment on purpose.
    val docs = Seq(
      (1L, "AAA" + shared + "BBB"),
      (2L, "CCCCC" + shared + "DDDDDD"),
      (3L, "totally unrelated text with nothing in common here at all")
    ).toDF("doc_id", "text")
    val spans = SubstringDedup.duplicatedSpans(docs, "doc_id", "text",
        window = 20, sampleMod = 1, minDocs = 2)
      .select("doc_id", "span_start", "span_end", "span_len", "n_windows")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(s => (s._1, s._2))
    assert(spans.map(_._1).toSeq == Seq(1L, 2L), s"one span per planted doc: ${spans.toSeq}")
    // Every window kept => the merged span covers the planted run exactly.
    assert(spans(0) == ((1L, 4L, 4L + shared.length - 1, shared.length.toLong,
      (shared.length - 20 + 1).toLong)), s"doc 1 exact span: ${spans(0)}")
    assert(spans(1)._2 == 6L && spans(1)._4 == shared.length.toLong,
      s"doc 2 exact span: ${spans(1)}")
  }

  test("winnowing guarantee: run >= window+guard-1 always surfaces, span inside the run") {
    val docs = Seq(
      (1L, "x" + shared),               // run at offset 2
      (2L, shared + "yyyyyyyyyyyyyyy"), // run at offset 1 — unaligned vs doc 1
      (3L, "completely different content that matches none of the others")
    ).toDF("doc_id", "text")
    // 72 >= 20 + 5 - 1, so at least one shared fingerprint is guaranteed.
    val spans = SubstringDedup.winnowedSpans(docs, "doc_id", "text",
        window = 20, guard = 5, minDocs = 2)
      .select("doc_id", "span_start", "span_end")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(spans.map(_._1).toSeq == Seq(1L, 2L), s"both planted docs flag: ${spans.toSeq}")
    assert(spans(0)._2 >= 2 && spans(0)._3 <= 1 + shared.length,
      s"doc 1 span inside the planted run: ${spans(0)}")
    assert(spans(1)._2 >= 1 && spans(1)._3 <= shared.length,
      s"doc 2 span inside the planted run: ${spans(1)}")
  }

  test("winnowing density: at most one fingerprint per guard-length run, >= 1 per doc") {
    val doc = Seq((1L, shared + shared + shared)).toDF("doc_id", "text")
    val n = SubstringDedup.winnowedWindows(doc, "doc_id", "text",
      window = 20, guard = 8).count()
    val positions = 3 * shared.length - 20 + 1
    assert(n >= 1, "every long-enough doc yields at least one fingerprint")
    assert(n <= positions - 8 + 1, s"selection is a subset of the slices: $n")
    // Winnowing keeps ~2/(guard+1) of windows — far fewer than all of them.
    assert(n < positions / 2, s"winnowing must thin the windows: $n of $positions")
  }

  test("within-doc repetition alone does not flag (distinct-doc count)") {
    val docs = Seq(
      (1L, shared + "===middle===" + shared), // repeats itself, no partner doc
      (2L, "another doc that shares nothing with the first one at all..")
    ).toDF("doc_id", "text")
    assert(SubstringDedup.duplicatedSpans(docs, "doc_id", "text",
      window = 20, sampleMod = 1, minDocs = 2).count() == 0)
    assert(SubstringDedup.winnowedSpans(docs, "doc_id", "text",
      window = 20, guard = 5, minDocs = 2).count() == 0)
  }

  test("docs shorter than the window never emit windows; truncated slice still fingerprints") {
    val docs = Seq((1L, "short"), (2L, "short")).toDF("doc_id", "text")
    assert(SubstringDedup.sampledWindows(docs, "doc_id", "text", 20, sampleMod = 1).count() == 0)
    assert(SubstringDedup.winnowedWindows(docs, "doc_id", "text", 20, guard = 5).count() == 0)
    assert(SubstringDedup.duplicatedSpans(docs, "doc_id", "text", 20, 1, 2).count() == 0)
    // length in [window, window+guard-2]: the single truncated slice yields one fingerprint
    val barely = Seq((1L, boiler.take(22))).toDF("doc_id", "text")
    assert(SubstringDedup.winnowedWindows(barely, "doc_id", "text", 20, guard = 8).count() == 1)
  }

  test("duplicatedCharStats zero-fills clean docs and bounds dup_chars by doc_len") {
    val docs = Seq(
      (1L, shared), (2L, shared + "tail"),
      (3L, "clean document with no duplicate content anywhere inside it")
    ).toDF("doc_id", "text")
    val spans = SubstringDedup.duplicatedSpans(docs, "doc_id", "text",
      window = 20, sampleMod = 1, minDocs = 2)
    val stats = SubstringDedup.duplicatedCharStats(docs, "doc_id", "text", spans)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(stats.map(_._1).toSeq == Seq(1L, 2L, 3L))
    assert(stats(2)._3 == 0L && stats(2)._4 == 0L, s"clean doc zero-filled: ${stats(2)}")
    stats.foreach(s => assert(s._3 <= s._2, s"dup_chars <= doc_len: $s"))
    assert(stats(0)._3 == shared.length, s"doc 1 is fully duplicated: ${stats(0)}")
  }

  test("three-way duplicates flag in every participating doc; minDocs above multiplicity empties") {
    val docs = (1L to 3L).map(i => (i, s"prefix$i" + shared)).toDF("doc_id", "text")
    val spans = SubstringDedup.duplicatedSpans(docs, "doc_id", "text",
      window = 20, sampleMod = 1, minDocs = 2)
    assert(spans.select("doc_id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
    assert(SubstringDedup.duplicatedSpans(docs, "doc_id", "text",
      window = 20, sampleMod = 1, minDocs = 4).count() == 0)
  }

  test("portable and native paths agree on spans when every window is kept") {
    // sampleMod=1 makes selection hash-independent, so the two hash
    // families must produce identical merged spans.
    val docs = Seq(
      (1L, "aa" + shared + "zz"),
      (2L, shared),
      (3L, "no overlap with anything else in this tiny corpus at all!!")
    ).toDF("doc_id", "text")
    def run(portable: Boolean) =
      SubstringDedup.duplicatedSpans(docs, "doc_id", "text",
          window = 20, sampleMod = 1, minDocs = 2, portable = portable)
        .select("doc_id", "span_start", "span_end")
        .as[(Long, Long, Long)].collect().sortBy(s => (s._1, s._2)).toSeq
    assert(run(portable = false) == run(portable = true))
  }
}
