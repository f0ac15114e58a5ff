package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType

/** Skew-safe global running aggregates.
  *
  * `sum(x) OVER (ORDER BY o)` with no PARTITION BY moves EVERY row to
  * one task (Spark logs the "No Partition Defined for Window" warning
  * and serializes) — the classic scale cliff of global cumulative
  * metrics. The standard fix, expressed Spark-first: split the order
  * domain into chunks at sampled quantile boundaries, run the running
  * sum WITHIN each chunk in parallel (ordinary partitioned window),
  * then add each chunk's prefix offset — the cumulative total of all
  * earlier chunks, a ≤`chunks`-row driver computation broadcast back.
  * Total cost: one approx-quantile pass, one chunk-partitioned
  * window, one tiny aggregate — no single-task sort of the corpus.
  * The input is persisted only for the eager probe passes and released
  * before returning (no corpus-sized cache outlives the call); the
  * lazy result re-scans the input once, so the input lineage must be
  * deterministic (a source scan or any deterministic plan — callers
  * with nondeterministic lineage persist upstream themselves).
  *
  * Chunk assignment is order-monotone (count of boundaries strictly
  * below the row's order value), so within-chunk rank + offset equals
  * the global running sum EXACTLY; rows tied on a boundary value land
  * in the same chunk. Contract: `orderCol` must be a NUMERIC total
  * order over rows (epoch-cast timestamps first; for float keys it
  * must be NaN-free — NaN sorts last in Spark but matches no quantile
  * boundary). Null handling matches the sequential window: nulls in
  * `valueCol` are skipped, and rows before the first non-null value
  * get a null running sum.
  */
object SkewWindow {

  /** Output adds a `running` decimal(38,6) column. Accumulation is
    * exact decimal throughout — double addition is grouping-sensitive,
    * and the two-phase sum MUST equal the sequential sum bit-for-bit
    * for the differential gate (same reason as SparkEntry's dsum).
    */
  def globalRunningSum(
      df: DataFrame, orderCol: String, valueCol: String, chunks: Int = 32): DataFrame = {
    require(chunks >= 1, "need at least one chunk")
    Seq("running", "__chunk", "__run", "__seen").foreach(c =>
      require(!df.columns.contains(c), s"input already has a '$c' column"))
    require(df.schema(orderCol).dataType.isInstanceOf[NumericType],
      s"orderCol '$orderCol' must be numeric — cast timestamps/dates to epoch first")
    // persisted for the two EAGER passes below (quantile probe + chunk
    // totals) so they read one consistent snapshot, then RELEASED before
    // returning — a corpus-sized MEMORY_AND_DISK cache must not outlive
    // the call (round-6 verdict: every invocation leaked one). The lazy
    // result re-scans the input once at consumption; chunk ids and
    // offsets are already frozen as literals, so with a deterministic
    // input lineage (any source scan / deterministic plan — the
    // documented contract) the re-scan reproduces the offsets exactly.
    val in = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val probs = (1 until chunks).map(_.toDouble / chunks).toArray
      val bounds =
        if (probs.isEmpty) Array.empty[Double]
        else in.stat.approxQuantile(orderCol, probs, 0.001).distinct.sorted
      // monotone map-side chunk id: #boundaries strictly below the value
      val chunkId = bounds.foldLeft(lit(0)) { (acc, b) =>
        acc + when(col(orderCol) > lit(b), 1).otherwise(0)
      }
      val zero = java.math.BigDecimal.ZERO
      // nulls accumulate as 0 but are COUNTED separately, so the
      // before-first-non-null prefix can be nulled like the sequential
      // window does
      val dec = coalesce(col(valueCol).cast("decimal(28,6)"), lit(zero).cast("decimal(28,6)"))
      val nn = when(col(valueCol).isNotNull, 1L).otherwise(0L)
      val chunked = in.withColumn("__chunk", chunkId)
      val w = Window.partitionBy("__chunk").orderBy(col(orderCol))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val within = chunked
        .withColumn("__run", sum(dec).over(w))
        .withColumn("__seen", sum(nn).over(w))
      // prefix offsets: cumulative totals / non-null counts of earlier
      // chunks (bounded rows; chunks are nonempty by construction, and
      // dec is null-free, so the collected sums are never null)
      val totals = chunked.groupBy("__chunk")
        .agg(sum(dec).as("__tot"), sum(nn).as("__n"))
        .collect().map(r => (r.getInt(0), r.getDecimal(1), r.getLong(2))).sortBy(_._1)
      val sumOffsets = totals.scanLeft(zero) { case (acc, (_, t, _)) => acc.add(t) }.init
      val cntOffsets = totals.scanLeft(0L) { case (acc, (_, _, n)) => acc + n }.init
      def chain[T](pairs: Array[(Int, T)], zeroLit: org.apache.spark.sql.Column) =
        pairs.foldLeft(zeroLit) { case (acc, (c, o)) =>
          when(col("__chunk") === c, lit(o)).otherwise(acc)
        }
      val offCol = chain(totals.map(_._1).zip(sumOffsets), lit(zero))
      val cntCol = chain(totals.map(_._1).zip(cntOffsets), lit(0L))
      within.withColumn("running",
          when(col("__seen") + cntCol > 0, (col("__run") + offCol).cast("decimal(38,6)"))
            .otherwise(lit(null).cast("decimal(38,6)")))
        .drop("__chunk", "__run", "__seen")
    } finally in.unpersist()
  }

  /** Global dense row numbering without the one-task sort: adds a
    * `rank` column equal to `row_number() OVER (ORDER BY orderCol
    * [DESC], tieBreak…)`. Chunking is monotone w.r.t. the primary
    * order direction and boundary ties share a chunk, so within-chunk
    * row numbers + broadcast chunk-count offsets reproduce the global
    * numbering exactly. `tieBreak` must totally order rows with equal
    * primary values (same caller duty as any deterministic window).
    */
  def globalRank(
      df: DataFrame, orderCol: String, descending: Boolean = false,
      tieBreak: Seq[org.apache.spark.sql.Column] = Nil, chunks: Int = 32): DataFrame = {
    require(chunks >= 1, "need at least one chunk")
    Seq("rank", "__chunk", "__rn").foreach(c =>
      require(!df.columns.contains(c), s"input already has a '$c' column"))
    require(df.schema(orderCol).dataType.isInstanceOf[NumericType],
      s"orderCol '$orderCol' must be numeric — cast timestamps/dates to epoch first")
    // persist for the eager probe/count passes, release before returning
    // (see globalRunningSum — same leak-vs-one-extra-scan trade)
    val in = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val probs = (1 until chunks).map(_.toDouble / chunks).toArray
      val bounds =
        if (probs.isEmpty) Array.empty[Double]
        else in.stat.approxQuantile(orderCol, probs, 0.001).distinct.sorted
      // primary-direction-monotone chunk id (0 = first in output order)
      val chunkId = bounds.foldLeft(lit(0)) { (acc, b) =>
        if (descending) acc + when(col(orderCol) < lit(b), 1).otherwise(0)
        else acc + when(col(orderCol) > lit(b), 1).otherwise(0)
      }
      val primary = if (descending) col(orderCol).desc else col(orderCol).asc
      val chunked = in.withColumn("__chunk", chunkId)
      val w = Window.partitionBy("__chunk").orderBy(primary +: tieBreak: _*)
      val within = chunked.withColumn("__rn", row_number().over(w))
      val counts = chunked.groupBy("__chunk").agg(count(lit(1)).as("__n"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
      val offs = counts.scanLeft(0L) { case (acc, (_, n)) => acc + n }.init
      val offCol = counts.map(_._1).zip(offs).foldLeft(lit(0L)) { case (acc, (c, o)) =>
        when(col("__chunk") === c, lit(o)).otherwise(acc)
      }
      within.withColumn("rank", col("__rn") + offCol).drop("__chunk", "__rn")
    } finally in.unpersist()
  }

  /** `globalRank` for STRING order keys (approxQuantile is
    * numeric-only): chunk boundaries come from a sorted driver-side
    * key sample instead — the RangePartitioner trick — then the same
    * monotone-chunk + within-chunk row_number + broadcast-offset
    * scheme. Exactness does NOT depend on sample quality (a bad sample
    * only skews chunk sizes); rows with key equal to a boundary all
    * land in the earlier chunk, so ties never split.
    */
  def globalRankBySample(
      df: DataFrame, orderCol: String,
      tieBreak: Seq[org.apache.spark.sql.Column], chunks: Int = 32,
      seed: Long = 42L): DataFrame = {
    require(chunks >= 1, "need at least one chunk")
    Seq("rank", "__chunk", "__rn").foreach(c =>
      require(!df.columns.contains(c), s"input already has a '$c' column"))
    require(df.schema(orderCol).dataType == org.apache.spark.sql.types.StringType,
      s"orderCol '$orderCol' must be string — use globalRank for numeric keys")
    // null keys take chunk 0 and sort first (Spark's asc default) —
    // callers mirroring an engine that sorts NULLS LAST must filter
    // persist for the eager sample/count passes, release before returning
    // (see globalRunningSum — same leak-vs-one-extra-scan trade)
    val in = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val total = in.count()
      val frac = math.min(1.0, (chunks * 200.0) / math.max(total, 1L))
      val sample = in.select(col(orderCol)).filter(col(orderCol).isNotNull)
        .sample(withReplacement = false, frac, seed)
        .collect().map(_.getString(0)).sorted
      val bounds =
        if (sample.isEmpty || chunks == 1) Array.empty[String]
        else (1 until chunks).flatMap(i => sample.lift(i * sample.length / chunks))
          .distinct.sorted.toArray
      val chunkId = bounds.foldLeft(lit(0)) { (acc, b) =>
        acc + when(col(orderCol) > lit(b), 1).otherwise(0)
      }
      val chunked = in.withColumn("__chunk", chunkId)
      val w = Window.partitionBy("__chunk").orderBy(col(orderCol).asc +: tieBreak: _*)
      val within = chunked.withColumn("__rn", row_number().over(w))
      val counts = chunked.groupBy("__chunk").agg(count(lit(1)).as("__n"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
      val offs = counts.scanLeft(0L) { case (acc, (_, n)) => acc + n }.init
      val offCol = counts.map(_._1).zip(offs).foldLeft(lit(0L)) { case (acc, (c, o)) =>
        when(col("__chunk") === c, lit(o)).otherwise(acc)
      }
      within.withColumn("rank", col("__rn") + offCol).drop("__chunk", "__rn")
    } finally in.unpersist()
  }

  /** Skew-safe `max(value) OVER (ORDER BY order RANGE BETWEEN UNBOUNDED
    * PRECEDING AND 1 PRECEDING)` — the running max over STRICTLY
    * EARLIER order values (the Pareto-frontier/skyline shape). Adds a
    * `running_max` column, null while no strictly-earlier non-null
    * value exists, exactly like the sequential window.
    *
    * Same chunking scheme as [[globalRunningSum]]: order-monotone chunk
    * ids from sampled quantile boundaries (boundary ties share a
    * chunk, so every row in an EARLIER chunk has a strictly smaller
    * order value), a chunk-partitioned range window within, and a
    * broadcast prefix — here the cumulative max of earlier chunks'
    * maxima, computed by a ≤`chunks`-row window. Max is idempotent
    * and order-insensitive, so chunked == sequential exactly (no
    * decimal dance needed — this is an order statistic, not an
    * accumulation).
    *
    * Contract: `orderCol` must be an INTEGRAL numeric total order
    * (the `RANGE … AND -1` frame means "order value ≤ current − 1",
    * which equals "strictly earlier" only on integral domains —
    * epoch-cast dates/timestamps first).
    */
  def globalRunningMax(
      df: DataFrame, orderCol: String, valueCol: String, chunks: Int = 32): DataFrame = {
    require(chunks >= 1, "need at least one chunk")
    Seq("running_max", "__chunk", "__mx", "__pre").foreach(c =>
      require(!df.columns.contains(c), s"input already has a '$c' column"))
    require(Seq("byte", "short", "int", "long", "integer", "bigint", "smallint", "tinyint")
        .contains(df.schema(orderCol).dataType.typeName),
      s"orderCol '$orderCol' must be integral — cast dates/timestamps to epoch first")
    val valueType = df.schema(valueCol).dataType
    // persist for the eager probe passes, release before returning
    // (see globalRunningSum — same leak-vs-one-extra-scan trade)
    val in = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val probs = (1 until chunks).map(_.toDouble / chunks).toArray
      val bounds =
        if (probs.isEmpty) Array.empty[Double]
        else in.stat.approxQuantile(orderCol, probs, 0.001).distinct.sorted
      val chunkId = bounds.foldLeft(lit(0)) { (acc, b) =>
        acc + when(col(orderCol) > lit(b), 1).otherwise(0)
      }
      val chunked = in.withColumn("__chunk", chunkId)
      val wIn = Window.partitionBy("__chunk").orderBy(col(orderCol))
        .rangeBetween(Window.unboundedPreceding, -1)
      val within = chunked.withColumn("__mx", max(col(valueCol)).over(wIn))
      // prefix maxima: cumulative max of earlier chunks' maxima — a
      // bounded (≤ chunks rows) window, then a broadcast literal chain
      val prefixes = chunked.groupBy("__chunk").agg(max(col(valueCol)).as("__cm"))
        .withColumn("__pre", max(col("__cm")).over(
          Window.orderBy("__chunk").rowsBetween(Window.unboundedPreceding, -1)))
        .select("__chunk", "__pre").collect()
        .map(r => r.getInt(0) -> r.get(1))
      val preCol = prefixes.foldLeft(lit(null).cast(valueType)) { case (acc, (c, v)) =>
        when(col("__chunk") === c, lit(v).cast(valueType)).otherwise(acc)
      }
      // greatest() skips nulls: null within-chunk + non-null prefix (or
      // vice versa) resolves to the non-null side; both null = a true
      // "no earlier value" — matching the sequential frame
      within.withColumn("running_max", greatest(col("__mx"), preCol))
        .drop("__chunk", "__mx")
    } finally in.unpersist()
  }

  /** Skew-safe `ntile(n) OVER (ORDER BY …)`: global rank via
    * `globalRank`, then the ANSI ntile bucket formula (first `N mod n`
    * buckets take the extra row) applied as a plain expression — adds
    * an `ntile` column identical to the one-task window's.
    */
  def globalNtile(
      df: DataFrame, orderCol: String, n: Int, descending: Boolean = false,
      tieBreak: Seq[org.apache.spark.sql.Column] = Nil, chunks: Int = 32): DataFrame = {
    require(n >= 1, "ntile needs n >= 1")
    require(!df.columns.contains("ntile"), "input already has an 'ntile' column")
    // persist only for the eager total-count pass, release before
    // returning (see globalRunningSum — same trade)
    val ranked = globalRank(df, orderCol, descending, tieBreak, chunks)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val total = ranked.count()
      val q = total / n
      val rem = total % n
      // ANSI ntile: ranks 1..rem*(q+1) fall in the (q+1)-sized buckets,
      // the rest in q-sized ones; q=0 (n > N) degenerates to bucket=rank
      val r = col("rank")
      val bucket =
        if (q == 0) r
        else when(r <= lit(rem * (q + 1)), ceil(r / lit((q + 1).toDouble)))
          .otherwise(lit(rem) + ceil((r - lit(rem * (q + 1))) / lit(q.toDouble)))
      ranked.withColumn("ntile", bucket.cast("int")).drop("rank")
    } finally ranked.unpersist()
  }
}
