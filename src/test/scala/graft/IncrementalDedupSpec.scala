package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame

import graft.operators.{ClusterDedup, JaccardDedup}

/** Incremental (daily-ingest) cluster dedup: base labels + only the
  * delta-touching exact pairs must reproduce `components(base ∪ delta)`
  * row-identically. The cases cover the connectivity shapes that
  * distinguish incremental from full recompute: a delta doc BRIDGING
  * two existing base clusters, a delta-only new cluster, exact
  * duplicates of base docs, empty-text isolation, and batches that
  * interleave ids below existing minima (label ownership must move).
  */
class IncrementalDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def df(rows: Seq[(Long, String)]): DataFrame = rows.toDF("id", "text")

  /** Full recompute vs incremental over the same split; asserts
    * row-identity and returns the labeling for case-specific checks.
    */
  private def check(base: Seq[(Long, String)], delta: Seq[(Long, String)],
      threshold: Double = 0.3): Map[Long, Long] = {
    val full = ClusterDedup.components(df(base ++ delta), "id", "text",
        nGram = 2, threshold = threshold)
      .as[(Long, Long)].collect().toMap
    val baseLabels = ClusterDedup.components(df(base), "id", "text",
      nGram = 2, threshold = threshold)
    val inc = ClusterDedup.componentsIncremental(baseLabels, df(base), df(delta),
        "id", "text", nGram = 2, threshold = threshold)
      .as[(Long, Long)].collect().toMap
    assert(inc == full,
      s"incremental labels diverge from full recompute:\n inc=$inc\n full=$full")
    // ROUTING IDENTITY: the adaptive probe (r17) picks a plan, never a
    // result — the forced-clustered arm must label identically (at spec
    // scale the probe routes DIRECT, so this is the clustered arm's
    // only coverage on these shapes)
    val clustered = ClusterDedup.componentsIncremental(baseLabels, df(base), df(delta),
        "id", "text", nGram = 2, threshold = threshold, adaptive = false)
      .as[(Long, Long)].collect().toMap
    assert(clustered == full,
      s"forced-clustered incremental diverges:\n clustered=$clustered\n full=$full")
    inc
  }

  // near-dup families: shared bigram vocabulary within a family,
  // disjoint across families
  private def doc(fam: String, salt: Int): String =
    (0 until 10).map(i => s"$fam${(i + salt) % 12}").mkString(" ")

  test("a delta doc bridges two base clusters into one component") {
    val base = Seq(
      1L -> doc("alpha", 0), 2L -> doc("alpha", 1),
      10L -> doc("beta", 0), 11L -> doc("beta", 1))
    // half alpha-vocab, half beta-vocab: edges into BOTH base clusters
    val bridgeText = (0 until 6).map(i => s"alpha$i").mkString(" ") + " " +
      (0 until 6).map(i => s"beta$i").mkString(" ")
    val got = check(base, Seq(20L -> bridgeText))
    assert(got.values.toSet == Set(1L), s"bridge failed to merge: $got")
  }

  test("a delta-only batch forms its own new cluster; base labels untouched") {
    val base = Seq(1L -> doc("alpha", 0), 2L -> doc("alpha", 1))
    val delta = Seq(30L -> doc("gamma", 0), 31L -> doc("gamma", 1),
      32L -> "unrelated lone words entirely distinct vocabulary")
    val got = check(base, delta)
    assert(got(1L) == 1L && got(2L) == 1L)
    assert(got(30L) == 30L && got(31L) == 30L && got(32L) == 32L)
  }

  test("delta ids below the base minimum take over label ownership") {
    val base = Seq(5L -> doc("alpha", 0), 6L -> doc("alpha", 1))
    val got = check(base, Seq(1L -> doc("alpha", 0))) // exact dup of 5
    assert(got == Map(1L -> 1L, 5L -> 1L, 6L -> 1L))
  }

  test("empty-text delta docs stay isolated singletons") {
    val base = Seq(1L -> doc("alpha", 0), 2L -> doc("alpha", 1))
    val got = check(base, Seq(40L -> "", 41L -> "single"))
    assert(got(40L) == 40L && got(41L) == 41L)
  }

  test("randomized corpus split: incremental equals full recompute") {
    val rnd = new scala.util.Random(42)
    val fams = Array("apple", "banana", "cherry", "date", "elder")
    val corpus = (0L until 60L).map { i =>
      val fam = fams(rnd.nextInt(fams.length))
      i -> doc(fam, rnd.nextInt(4))
    }
    val (delta, base) = corpus.partition(_._1 % 7 == 0)
    check(base, delta)
  }

  test("replicated corpus (the soak shape): near-identical copies on both sides") {
    // every doc carries 5 near-dup replicas with a tiny suffix edit —
    // the boilerplate-crawl shape whose g² candidate growth the
    // cluster-granularity incremental arm exists to avoid; exactness
    // must hold regardless
    val fams = Array("apple", "banana", "cherry")
    val corpus = for {
      f <- 0 until 3
      r <- 0 until 5
    } yield (f * 100L + r) -> (doc(fams(f), 0) + s" rep$r marker")
    val (delta, base) = corpus.partition(_._1 % 7 == 0)
    check(base, delta)
  }

  test("incremental pair stream lists exactly the delta-touching exact pairs") {
    val base = Seq(1L -> doc("alpha", 0), 2L -> doc("alpha", 1),
      3L -> doc("beta", 0))
    val delta = Seq(9L -> doc("alpha", 0), 10L -> doc("alpha", 2))
    val all = df(base ++ delta)
    val expected = JaccardDedup.nearDupPairs(all, "id", "text", 2, 0.3)
      .as[(Long, Long, Double)].collect().toSet
      .filter(p => p._1 == 9L || p._1 == 10L || p._2 == 9L || p._2 == 10L)
    val got = JaccardDedup.nearDupPairsIncremental(df(base), df(delta),
        "id", "text", 2, 0.3)
      .as[(Long, Long, Double)].collect().toSet
    assert(got == expected, s"\n got=$got\n expected=$expected")
    assert(got.nonEmpty, "fixture produced no delta-touching pairs")
  }

  test("incremental releases its persisted internals after labeling") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val base = Seq(1L -> doc("alpha", 0), 2L -> doc("alpha", 1))
    val baseLabels = ClusterDedup.components(df(base), "id", "text", 2, 0.3)
    ClusterDedup.componentsIncremental(baseLabels, df(base),
      df(Seq(9L -> doc("alpha", 2))), "id", "text", 2, 0.3).count()
    val leaked = (spark.sparkContext.getPersistentRDDs.keySet -- before).size
    // the two surviving checkpoints are the base-label and result cuts;
    // the incremental doc/prefix caches must NOT be among the leftovers
    assert(leaked <= 2, s"leaked $leaked persisted RDDs beyond the label cuts")
  }
}
