package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Triangles

/** Degree-oriented triangle counting against hand-countable graphs. */
class TrianglesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def stats(edges: Seq[(Long, Long)]) =
    Triangles.stats(edges.toDF("a", "b"), "a", "b")
      .as[(Long, Long, Long, Long, Option[Double])].collect().head

  test("K4 has 4 triangles, 12 wedges, cc 1.0") {
    val k4 = for { i <- 1L to 4L; j <- (i + 1) to 4L } yield (i, j)
    assert(stats(k4) == ((4L, 6L, 12L, 4L, Some(1.0))))
  }

  test("a star has wedges but no triangles; cc 0") {
    // center 0 with 5 leaves: wedges = C(5,2) = 10, triangles = 0
    val star = (1L to 5L).map(i => (0L, i))
    assert(stats(star) == ((6L, 5L, 10L, 0L, Some(0.0))))
  }

  test("triangle + pendant: 1 triangle; canonicalization collapses dupes/reversals/loops") {
    // {1,2,3} triangle, edge 3-4; plus noise: reversed dup (2,1),
    // exact dup (1,3), self-loop (2,2) — all must collapse
    val raw = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (2L, 1L), (1L, 3L), (2L, 2L))
    // degrees: 1:2, 2:2, 3:3, 4:1 -> wedges = 1+1+3+0 = 5
    assert(stats(raw) == ((4L, 4L, 5L, 1L, Some(0.6))))
  }

  test("two triangles sharing an edge") {
    // {1,2,3} and {2,3,4}: 5 edges, degrees 1:2 2:3 3:3 4:2 -> wedges 1+3+3+1=8
    val g = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L))
    assert(stats(g) == ((4L, 5L, 8L, 2L, Some(0.75))))
  }

  test("shuffle fallback (broadcastEdgeLimit=0) matches the broadcast arm exactly") {
    // the billion-edge code path: degree + adjacency joins fall back to
    // shuffles on the vertex key instead of driver broadcasts. A seeded
    // G(60, 0.15) graph is big enough to exercise multi-partition
    // shuffles and rich enough that an orientation/counting bug in the
    // fallback arm can't cancel out.
    val rnd = new scala.util.Random(7)
    val g = for { i <- 1L to 60L; j <- (i + 1) to 60L if rnd.nextDouble() < 0.15 }
      yield (i, j)
    val edges = g.toDF("a", "b").repartition(8)
    val viaBroadcast = Triangles.stats(edges, "a", "b")
      .as[(Long, Long, Long, Long, Option[Double])].collect().head
    val viaShuffle = Triangles.stats(edges, "a", "b", broadcastEdgeLimit = 0L)
      .as[(Long, Long, Long, Long, Option[Double])].collect().head
    assert(viaShuffle == viaBroadcast)
    assert(viaBroadcast._4 > 0L) // the fixture actually has triangles
  }
}
