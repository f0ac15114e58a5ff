package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.{ClusterDedup, Par}

/** One-shot measurement probe for the incremental-dedup scale claim:
  * on a (possibly replicated) documents table split base/delta by
  * doc_id % 7, measure SEPARATELY
  *   - wall_base: labeling the base corpus from scratch (yesterday's
  *     run — amortized across increments in production),
  *   - wall_inc:  componentsIncremental(baseLabels, base, delta) — the
  *     per-increment cost the operator exists to bound,
  *   - wall_full: components(base ∪ delta) from scratch — what a
  *     pipeline WITHOUT the incremental arm pays every day,
  *   - wall_inc_direct (with `--direct`): the doc-level
  *     nearDupPairsIncremental + components arm — the A/B evidence for
  *     why the incremental path runs at CLUSTER granularity (g² in
  *     replication; measured 409 s at 10× where the clustered full
  *     recompute takes 116 s — do NOT pass --direct at 100×).
  * Prints one JSON line. The claim being measured: wall_inc ≪
  * wall_full, with the gap widening as the corpus grows while the
  * batch stays proportional.
  *
  *   SPARK_GRAFT_CPUS=16 SPARK_DRIVER_MEM=48g \
  *     sbt -batch "runMain graft.tools.IncProbe /tmp/graft_soak10x --direct"
  */
object IncProbe {
  def main(args: Array[String]): Unit = {
    val positional = args.filterNot(_ == "--direct")
    val dir = positional.headOption.getOrElse("/tmp/graft_soak10x")
    // delta = doc_id % mod == 0: mod 7 is the adversarial gate split
    // (every replica family touched); mod 70 approximates a realistic
    // ~1.4% daily batch
    val mod = positional.drop(1).headOption.map(_.toInt).getOrElse(7)
    val runDirect = args.contains("--direct")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = GraftSession.tuned(
        SparkSession.builder().master(s"local[$cpus]"), cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val base = docs.filter(pmod(col("doc_id"), lit(mod)) =!= 0)
    val delta = docs.filter(pmod(col("doc_id"), lit(mod)) === 0)
    def timed[T](body: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }
    val (baseLabels, wallBase) = timed {
      val l = ClusterDedup.components(base, "doc_id", "text", 2, 0.3)
      l.count() // sealed result is already cut; count forces nothing new
      l
    }
    val ((incCount, incComponents), wallInc) = timed {
      val inc = ClusterDedup.componentsIncremental(baseLabels, base, delta,
        "doc_id", "text", 2, 0.3)
      val n = inc.count()
      val c = inc.select(countDistinct(col("component"))).head().getLong(0)
      Par.free(inc)
      (n, c)
    }
    val (directCount, wallIncDirect) =
      if (!runDirect) (-1L, -1.0)
      else timed {
        val pairs = graft.operators.JaccardDedup.nearDupPairsIncremental(
          base, delta, "doc_id", "text", 2, 0.3)
        val star = baseLabels.select(col("id").as("id_a"), col("component").as("id_b"))
          .where(col("id_a") =!= col("id_b"))
        val verts = base.select(col("doc_id").as("id"))
          .unionByName(delta.select(col("doc_id").as("id")))
        val labs = graft.operators.Components.connectedComponents(
          star.unionByName(pairs.select(col("id_a"), col("id_b"))),
          "id_a", "id_b", Some(verts))
        val n = labs.count()
        Par.free(labs)
        n
      }
    Par.free(baseLabels)
    Par.sweepBlocks(spark)
    val ((fullCount, fullComponents), wallFull) = timed {
      val full = ClusterDedup.components(docs, "doc_id", "text", 2, 0.3)
      val n = full.count()
      val c = full.select(countDistinct(col("component"))).head().getLong(0)
      Par.free(full)
      (n, c)
    }
    require(incCount == fullCount && incComponents == fullComponents,
      s"incremental diverged: inc=($incCount,$incComponents) full=($fullCount,$fullComponents)")
    require(!runDirect || directCount == fullCount,
      s"direct incremental diverged: $directCount vs $fullCount")
    val directField = if (runDirect) f""","wall_inc_direct":$wallIncDirect%.1f""" else ""
    println(f"""{"metric":"inc_probe","dir":"$dir","mod":$mod,"rows":$fullCount,"components":$fullComponents,"wall_base":$wallBase%.1f,"wall_inc":$wallInc%.1f,"wall_full":$wallFull%.1f$directField}""")
    spark.stop()
  }
}
