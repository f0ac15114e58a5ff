package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Embeddings

/** Exact-decimal Lloyd step: assignment is argmin of order-free decimal
  * distance sums with id tie-break; the iteration converges on an
  * obviously-clustered fixture.
  */
class EmbeddingsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val near0 = Seq(Array(0.1, 0.0), Array(-0.1, 0.1), Array(0.0, -0.1))
  private val near9 = Seq(Array(9.1, 9.0), Array(8.9, 9.1), Array(9.0, 8.9))

  test("assignExact sends points to the nearer centroid, ties to the lower id") {
    val df = (near0 ++ near9).zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val cents = Seq(0 -> Array(0.0, 0.0), 1 -> Array(9.0, 9.0))
    val got = df.select(col("id"), Embeddings.assignExact(col("v"), cents).as("c"))
      .as[(Long, Int)].collect().toMap
    assert((0L to 2L).forall(got(_) == 0) && (3L to 5L).forall(got(_) == 1))
    // exact tie: (4.5, 4.5) is equidistant -> cluster 0 by id tie-break
    val tie = Seq((0L, Array(4.5, 4.5))).toDF("id", "v")
      .select(Embeddings.assignExact(col("v"), cents)).as[Int].collect().head
    assert(tie == 0)
  }

  test("semanticDedup: min-id keep rule within clusters, no cross-cluster drops") {
    // two well-separated blobs plus one far outlier. Within each blob
    // all cosines are ~1 (same direction); across blobs directions
    // differ. The min-id member of each cluster survives; everything
    // with a smaller-id near-parallel neighbor in ITS cluster drops.
    val vecs = Seq(
      0L -> Array(1.0, 0.01), 1L -> Array(1.0, 0.02), 2L -> Array(0.99, 0.0),
      3L -> Array(0.01, 1.0), 4L -> Array(0.0, 0.98), 5L -> Array(0.02, 1.0),
      6L -> Array(-1.0, -1.0)).toDF("id", "v")
    val cents = Seq(0 -> Array(1.0, 0.0), 1 -> Array(0.0, 1.0), 2 -> Array(-1.0, -1.0))
    val got = Embeddings.semanticDedup(vecs, "id", "v", cents, threshold = 0.9)
      .as[(Long, Int)].collect().toSet
    // quadratic truth in plain Scala: same assignment (nearest centroid,
    // well-separated so no decimal subtlety), same left-to-right cosine
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.foldLeft(0.0)(_ + _)
      val na = math.sqrt(a.map(x => x * x).foldLeft(0.0)(_ + _))
      val nb = math.sqrt(b.map(x => x * x).foldLeft(0.0)(_ + _))
      if (na * nb == 0) 0.0 else d / (na * nb)
    }
    val all = Seq(
      0L -> Array(1.0, 0.01), 1L -> Array(1.0, 0.02), 2L -> Array(0.99, 0.0),
      3L -> Array(0.01, 1.0), 4L -> Array(0.0, 0.98), 5L -> Array(0.02, 1.0),
      6L -> Array(-1.0, -1.0))
    def assign(v: Array[Double]): Int = cents.minBy { case (cid, c) =>
      (v.zip(c).map { case (x, y) => (x - y) * (x - y) }.sum, cid)
    }._1
    val truth = all.filter { case (id, v) =>
      !all.exists { case (jd, w) =>
        jd < id && assign(w) == assign(v) && cos(v, w) >= 0.9
      }
    }.map { case (id, v) => (id, assign(v)) }.toSet
    assert(got == truth)
    // the shape the rule promises: ids 0, 3, 6 survive (cluster minima),
    // 1, 2, 4, 5 drop as semantic dups of a smaller-id neighbor
    assert(got == Set((0L, 0), (3L, 1), (6L, 2)))
  }

  test("lloydIterExact recomputes 6dp-rounded means and drops emptied clusters") {
    val df = (near0 ++ near9).zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    // seeds both inside the first blob: one wins everything near 0, the
    // far blob all lands on the closer seed; next means = blob means
    val cents = Seq(0 -> Array(0.0, 0.0), 1 -> Array(0.2, 0.2))
    val next = Embeddings.lloydIterExact(df, "v", cents).toMap
    // blob near 0: points (0.1,0), (-0.1,0.1), (0,-0.1) -> mean (0, 0)
    assert(next(0).toSeq == Seq(0.0, 0.0))
    // cluster 1 captured the far blob: mean (9.0, 9.0)
    assert(next(1).toSeq == Seq(9.0, 9.0))
    // a seed that captures nothing disappears
    val far = Embeddings.lloydIterExact(df, "v", cents :+ (2 -> Array(-100.0, -100.0)))
    assert(!far.exists(_._1 == 2))
  }
}
