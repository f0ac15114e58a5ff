package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Curate

/** Curation operators: determinism (the whole point of content-keyed
  * bucketing), split mass, stratified rates, and packing arithmetic.
  */
class CurateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs = (0L until 2000L).map(i => (i, s"word$i " * (i % 7 + 1).toInt))
    .toDF("doc_id", "text")

  test("splitAssign is deterministic and splits by the declared mass") {
    val a = Curate.splitAssign(docs, "doc_id").select("doc_id", "split").as[(Long, String)].collect().toMap
    val b = Curate.splitAssign(docs.repartition(7), "doc_id")
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(a == b, "assignment must not depend on partitioning")
    val frac = a.values.groupBy(identity).view.mapValues(_.size / 2000.0).toMap
    assert(math.abs(frac("test") - 0.1) < 0.03 && math.abs(frac("val") - 0.1) < 0.03,
      s"split mass off: $frac")
  }

  test("leakageSafeSplit: near-dup clusters move atomically, singletons match splitAssign on cluster id") {
    // three exact-dup cliques + a near-dup pair + independent singletons
    val corpus = (
      (0L until 30L).map(i => (i, s"alpha beta gamma delta epsilon zeta eta theta clique${i % 3}")) ++
      Seq((100L, "the quick brown fox jumps over the lazy dog tonight"),
          (101L, "the quick brown fox jumps over the lazy dog today")) ++
      (200L until 240L).map(i => (i, s"unique$i solo$i text$i body$i tail$i"))
    ).toDF("doc_id", "text")
    val out = Curate.leakageSafeSplit(corpus, "doc_id", "text")
      .select("doc_id", "cluster_id", "split").as[(Long, Long, String)].collect()
    // no cluster straddles a split boundary — the leakage guarantee
    val byCluster = out.groupBy(_._2).view.mapValues(_.map(_._3).distinct.toSeq).toMap
    assert(byCluster.values.forall(_.size == 1),
      s"cluster split leakage: ${byCluster.filter(_._2.size > 1)}")
    // the near-dup pair shares a cluster and therefore a split
    val m = out.map(r => r._1 -> (r._2, r._3)).toMap
    assert(m(100L) == m(101L))
    // singleton docs (own cluster = own id) reduce exactly to splitAssign
    val plain = Curate.splitAssign(corpus.filter(col("doc_id") >= 200), "doc_id")
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    (200L until 240L).foreach { i =>
      assert(m(i)._1 == i && m(i)._2 == plain(i), s"singleton $i diverges")
    }
    // both components plans assign identically — the scalable arm is a
    // drop-in for the direct one (the driver row runs direct, the
    // 100-TB default is scalable)
    val direct = Curate.leakageSafeSplit(corpus, "doc_id", "text", scalable = false)
      .select("doc_id", "cluster_id", "split").as[(Long, Long, String)].collect()
    assert(direct.sortBy(_._1).sameElements(out.sortBy(_._1)), "plan arms diverge")
  }

  test("stratifiedSample keeps roughly the per-stratum rate and is a pure filter") {
    val strat = docs.withColumn("lang", when(col("doc_id") % 2 === 0, "en").otherwise("de"))
    val kept = Curate.stratifiedSample(strat, "doc_id", "lang", Map("en" -> 0.25), defaultRate = 0.75)
    val byLang = kept.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(math.abs(byLang("en") / 1000.0 - 0.25) < 0.06, s"en rate ${byLang("en") / 1000.0}")
    assert(math.abs(byLang("de") / 1000.0 - 0.75) < 0.06, s"de rate ${byLang("de") / 1000.0}")
    // a sample is a subset of the input, same schema, no new rows
    assert(kept.join(strat, Seq("doc_id"), "left_anti").count() == 0)
  }

  test("packSequences: pack boundaries follow the in-shard token prefix sum") {
    val packed = Curate.packSequences(docs, "doc_id", "text", budget = 10, shards = 4)
      .as[(Long, Long, Int, Long)].collect() // (doc_id, shard, n_tokens, pack_id)
    assert(packed.length == 2000)
    packed.groupBy(_._2).foreach { case (_, rows) =>
      val inOrder = rows.sortBy(_._1)
      var cum = 0L
      inOrder.foreach { case (id, _, n, pack) =>
        assert(pack == cum / 10, s"doc $id: pack $pack != ${cum / 10}")
        cum += n
      }
    }
    // shard-local: every doc keeps its pmod shard
    assert(packed.forall { case (id, shard, _, _) => shard == id % 4 })
  }
}
