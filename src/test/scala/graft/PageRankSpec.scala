package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.PageRank

class PageRankSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ranks(edges: Seq[(String, String, Double)], iters: Int = 10): Map[String, Double] =
    PageRank.run(edges.toDF("src", "dst", "w"), iterations = iters)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

  test("two-node cycle is stationary at 1/2 each from the first iteration") {
    val r = ranks(Seq(("a", "b", 1.0), ("b", "a", 1.0)), iters = 3)
    assert(math.abs(r("a") - 0.5) < 1e-12 && math.abs(r("b") - 0.5) < 1e-12)
  }

  test("edge weight skews rank toward the heavier target; no dangling -> mass conserved") {
    // a splits 3:1 between b and c; b and c return to a
    val r = ranks(Seq(("a", "b", 3.0), ("a", "c", 1.0), ("b", "a", 1.0), ("c", "a", 1.0)))
    assert(r("b") > r("c"))
    assert(math.abs(r.values.sum - 1.0) < 1e-9) // stochastic graph keeps total mass 1
  }

  test("dangling sink drops mass (documented semantics) and outranks its source") {
    val r = ranks(Seq(("a", "b", 1.0)))
    assert(r("b") > r("a"))
    assert(r.values.sum < 1.0) // b's mass leaks out of the system
  }

  test("uniform directed cycle converges to the uniform distribution") {
    val n = 5
    val edges = (0 until n).map(i => (s"v$i", s"v${(i + 1) % n}", 1.0))
    val r = ranks(edges, iters = 25)
    r.values.foreach(v => assert(math.abs(v - 1.0 / n) < 1e-6))
  }

  test("local arm (r17 adaptive) agrees with the distributed arm to fp tolerance") {
    // localThreshold = 0 forces the distributed rounds; the default
    // routes this graph local — same ranks up to double-summation
    // order (consumers round to 6 dp)
    val edges = Seq(("a", "b", 3.0), ("a", "c", 1.0), ("b", "a", 1.0),
      ("c", "a", 2.0), ("c", "b", 1.0), ("d", "a", 1.0)).toDF("src", "dst", "w")
    val loc = PageRank.run(edges, iterations = 10)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val dist = PageRank.run(edges, iterations = 10, localThreshold = 0)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(loc.keySet == dist.keySet)
    loc.foreach { case (k, v) => assert(math.abs(v - dist(k)) < 1e-12, s"node $k") }
  }
}
