package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for pathological key skew.
  *
  * AQE's skew-join (enabled in GraftSession) splits oversized shuffle
  * partitions at runtime and covers moderate skew for free. Salting is
  * the explicit remedy for the remaining case: a single key so hot its
  * rows exceed what one task should hold even after AQE splitting, or a
  * build side that must stay hash-partitioned (no AQE rewrite possible).
  *
  * Mechanics: every big-side row gets a deterministic salt in
  * [0, salts) derived from the whole row (stable across task retries —
  * `rand()` would not be); the small side is replicated `salts` times;
  * the join key becomes (keys…, salt). A hot key's rows now spread
  * across `salts` reducers. Each (big, small) match meets exactly once
  * — on the big row's salt — so inner and left-outer results are
  * multiset-identical to the unsalted join (pinned in SkewVectorsSpec).
  */
object SkewJoin {

  def saltedEquiJoin(
      big: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      salts: Int = 16,
      joinType: String = "inner"): DataFrame = {
    require(salts > 0, "salts must be positive")
    require(Seq("inner", "left", "left_outer").contains(joinType),
      "salting supports inner/left joins (salt lives on the big side)")
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(struct(big.columns.map(col): _*)), lit(salts)).cast("int"))
    val saltedSmall = small
      .withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
    saltedBig.join(saltedSmall, keys :+ "__salt", joinType).drop("__salt")
  }
}
