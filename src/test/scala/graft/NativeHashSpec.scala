package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.NativeHash

/** The native codegen expressions must be bit-identical to the HOF
  * Column formulas they replaced (the fixture-pinned dedup results
  * depend on the hash family). The old formulas are reconstructed here
  * inline as the reference.
  */
class NativeHashSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    Seq("the quick", "quick brown", "brown fox"),
    Seq("lone"),
    Seq.empty[String]
  ).toDF("sh")

  test("native minhash signature equals the HOF aggregate formula") {
    // old formula: h = pmod(xxhash64(s), 2^31); sig_i = min (a_i*h+b_i) mod P
    val P = 4294967311L
    val rng = new scala.util.Random(42L)
    val aMax = (1L << 31) - 1
    val ps = Seq.fill(64)((rng.nextLong().abs % aMax + 1, rng.nextLong().abs % P))
    def permHashes(h: org.apache.spark.sql.Column) =
      array(ps.map { case (a, b) => pmod(h * a + b, lit(P)) }: _*)
    val oldSig = aggregate(
      transform(col("sh"), s => pmod(xxhash64(s), lit(1L << 31))),
      array_repeat(lit(Long.MaxValue), 64),
      (acc, h) => zip_with(acc, permHashes(h), (x, y) => least(x, y)))
    val rows = docs.select(
      NativeHash.minhashSig(col("sh"), 64, 42L).as("nw"), oldSig.as("old"))
      .as[(Seq[Long], Seq[Long])].collect()
    rows.foreach { case (nw, old) => assert(nw == old) }
  }

  test("native simhash equals the HOF vote formula") {
    val votes = aggregate(
      transform(col("sh"), t => xxhash64(t)),
      array_repeat(lit(0L), 64),
      (acc, h) => zip_with(
        acc,
        transform(sequence(lit(0), lit(63)),
          i => when(call_function("shiftright", h, i).bitwiseAND(1) === 1, 1L).otherwise(-1L)),
        (x, y) => x + y))
    val oldSig = aggregate(
      zip_with(votes, sequence(lit(0), lit(63)),
        (v, i) => when(v > 0, call_function("shiftleft", lit(1L), i)).otherwise(0L)),
      lit(0L), (a, x) => a.bitwiseOR(x))
    val rows = docs.select(NativeHash.simhash64(col("sh")).as("nw"), oldSig.as("old"))
      .as[(Long, Long)].collect()
    rows.foreach { case (nw, old) => assert(nw == old) }
  }

  test("native srp bits equal the HOF plane-dot formula") {
    val dim = 8; val nPlanes = 24; val seed = 7L
    val vecs = Seq(Seq(1f, 0f, -1f, 2f, 0.5f, 0f, 0f, 3f), Seq.fill(8)(0f)).toDF("vec")
    val rng = new scala.util.Random(seed)
    val planes = Seq.fill(nPlanes)(Seq.fill(dim)(rng.nextGaussian()))
    val vd = transform(col("vec"), _.cast("double"))
    val oldBits = {
      val planesLit = typedlit(planes)
      transform(planesLit, p =>
        when(aggregate(zip_with(vd, p, _ * _), lit(0.0), _ + _) >= 0, lit(1L)).otherwise(lit(0L)))
    }
    val rows = vecs
      .withColumn("vd2", vd)
      .select(NativeHash.srpBits(col("vec"), dim, nPlanes, seed).as("nw"), oldBits.as("old"))
      .as[(Seq[Long], Seq[Long])].collect()
    rows.foreach { case (nw, old) => assert(nw == old) }
  }

  test("fused srp_band_buckets equals the srpBits + srpFoldBuckets reference chain") {
    import graft.functions.Vectors
    val dim = 8; val bits = 4; val tables = 6; val seed = 9L
    val vecs = Seq(Seq(1f, 0f, -1f, 2f, 0.5f, 0f, 0f, 3f), Seq(0.1f, -0.2f, 0.3f, -0.4f, 0.5f, -0.6f, 0.7f, -0.8f))
      .toDF("vec")
    val fused = vecs
      .select(posexplode(NativeHash.srpBuckets(col("vec"), dim, bits, tables, seed))
        .as(Seq("tbl", "bucket")))
      .as[(Int, Long)].collect().toSeq
    val reference = vecs
      .withColumn("__bits", NativeHash.srpBits(col("vec"), dim, bits * tables, seed))
      .select(explode(Vectors.srpFoldBuckets(col("__bits"), bits, tables)).as("bb"))
      .select(col("bb.tbl"), col("bb.bucket")).as[(Int, Long)].collect().toSeq
    assert(fused == reference)
  }

  test("shingle_hashes has the same set structure as the string-shingle pipeline") {
    // the native path replaced transform(concat_ws(slice))+array_distinct
    // +xxhash64: hash VALUES differ by design, but sizes and pairwise
    // intersection counts — everything the Jaccard operators consume —
    // must agree exactly
    import graft.functions.Text
    val texts = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"),
      (3L, "a a a a a"), // repeated shingles: distinctness must hold
      (4L, "one"), // fewer tokens than n -> empty
      (5L, "")
    ).toDF("id", "text")
    for (n <- Seq(1, 2, 3)) {
      val both = texts.select(
        col("id"),
        NativeHash.shingleHashes(Text.tokens(col("text")), n).as("nw"),
        array_distinct(Text.shingles(Text.tokens(col("text")), n)).as("old"))
        .persist()
      assert(both.filter(size(col("nw")) =!= size(col("old"))).count() == 0, s"size mismatch n=$n")
      // sorted ascending (the merge-walk contract)
      assert(both.filter(col("nw") =!= sort_array(col("nw"))).count() == 0)
      val pairs = both.as("a").crossJoin(both.as("b")).filter(col("a.id") < col("b.id"))
        .select(
          NativeHash.sortedIntersectCount(col("a.nw"), col("b.nw")).as("cNew"),
          size(array_intersect(col("a.old"), col("b.old"))).as("cOld"))
      assert(pairs.filter(col("cNew") =!= col("cOld")).count() == 0, s"intersect mismatch n=$n")
      both.unpersist()
    }
  }

  test("char_shingle_hashes matches the substr pipeline's set structure") {
    import graft.functions.Text
    val texts = Seq((1L, "abcabc"), (2L, "abcd"), (3L, "ab"), (4L, "机器学习机器")).toDF("id", "text")
    val both = texts.select(
      col("id"),
      NativeHash.charShingleHashes(col("text"), 3).as("nw"),
      array_distinct(Text.charShingles(col("text"), 3)).as("old"))
      .persist()
    assert(both.filter(size(col("nw")) =!= size(col("old"))).count() == 0)
    val pairs = both.as("a").crossJoin(both.as("b")).filter(col("a.id") < col("b.id"))
      .select(
        NativeHash.sortedIntersectCount(col("a.nw"), col("b.nw")).as("cNew"),
        size(array_intersect(col("a.old"), col("b.old"))).as("cOld"))
    assert(pairs.filter(col("cNew") =!= col("cOld")).count() == 0)
    both.unpersist()
  }

  test("sorted_intersect_count equals array_intersect size on sorted long arrays") {
    val df = Seq(
      (Seq(1L, 3L, 5L, 9L), Seq(2L, 3L, 9L, 11L), 2),
      (Seq.empty[Long], Seq(1L), 0),
      (Seq(7L), Seq(7L), 1),
      (Seq(1L, 2L, 3L), Seq(4L, 5L), 0)
    ).toDF("a", "b", "want")
    assert(df.filter(NativeHash.sortedIntersectCount(col("a"), col("b")) =!= col("want")).count() == 0)
  }

  test("sorted_diff equals array_except on sorted long arrays, output stays sorted") {
    val df = Seq(
      (Seq(1L, 3L, 5L, 9L), Seq(2L, 3L, 9L, 11L), Seq(1L, 5L)),
      (Seq.empty[Long], Seq(1L), Seq.empty[Long]),
      (Seq(7L), Seq(7L), Seq.empty[Long]),
      (Seq(1L, 2L, 3L), Seq.empty[Long], Seq(1L, 2L, 3L)),
      (Seq(1L, 2L, 3L), Seq(4L, 5L), Seq(1L, 2L, 3L))
    ).toDF("a", "b", "want")
    assert(df.filter(NativeHash.sortedDiff(col("a"), col("b")) =!= col("want")).count() == 0)
  }

  test("diff identity: __hc + adj_a + adj_b + correction equals the direct intersection count") {
    // the verify-stage reconstruction (ClusterDedup/OverlapJoin step 5):
    // random sorted-distinct sets per (anchor_a, member_a, anchor_b,
    // member_b); the assembled count must equal |S_a ∩ S_b| exactly on
    // every draw — including degenerate empty diffs (member == anchor)
    // and the intra flavor (shared anchor, adj = −|dM|)
    val rng = new scala.util.Random(7)
    def randSet(): Seq[Long] =
      (0 until (1 + rng.nextInt(40))).map(_ => rng.nextInt(60).toLong).distinct.sorted
    def mutate(h: Seq[Long]): Seq[Long] = rng.nextInt(4) match {
      case 0 => h // exact copy: both diffs empty
      case _ => ((h.filter(_ => rng.nextInt(10) > 1) ++
        (0 until rng.nextInt(6)).map(_ => 100L + rng.nextInt(30))).distinct).sorted
    }
    val rows = (0 until 300).map { _ =>
      val hA = randSet(); val hB = randSet()
      (hA, mutate(hA), hB, mutate(hB))
    } ++ (0 until 100).map { _ => // intra flavor: one shared anchor
      val h = randSet()
      (h, mutate(h), h, mutate(h))
    }
    val df = rows.toDF("ha", "sa", "hb", "sb")
      .withColumn("want", NativeHash.sortedIntersectCount(col("sa"), col("sb")))
      .withColumn("__hc", NativeHash.sortedIntersectCount(col("ha"), col("hb")))
      .withColumn("dma", NativeHash.sortedDiff(col("ha"), col("sa")))
      .withColumn("dpa", NativeHash.sortedDiff(col("sa"), col("ha")))
      .withColumn("dmb", NativeHash.sortedDiff(col("hb"), col("sb")))
      .withColumn("dpb", NativeHash.sortedDiff(col("sb"), col("hb")))
      .withColumn("got", col("__hc") +
        NativeHash.anchorAdjust(col("dma"), col("dpa"), col("hb")) +
        NativeHash.anchorAdjust(col("dmb"), col("dpb"), col("ha")) +
        NativeHash.diffCorrection(col("dma"), col("dpa"), col("dmb"), col("dpb")))
    assert(df.filter(col("got") =!= col("want")).count() == 0)
    // the count bound the verify prunes on must never under-estimate
    assert(df.filter(col("__hc") + size(col("dpa")) + size(col("dpb")) <
      col("want")).count() == 0)
  }

  test("shingle_dup_ratio matches the HOF 1 - distinct/total formula") {
    import graft.functions.Text
    val texts = Seq(
      (1L, "a b a b a b"),           // 3-grams: aba bab aba bab -> 2/4 dup
      (2L, "a a a a a"),             // all windows identical
      (3L, "one two three four"),    // no repeats
      (4L, "one two"),               // fewer tokens than n -> 0.0
      (5L, "")
    ).toDF("id", "text")
    val both = texts.select(
      col("id"),
      NativeHash.shingleDupRatio(Text.tokens(col("text")), 3).as("nw"),
      {
        val all = Text.shingles(Text.tokens(col("text")), 3)
        val total = size(all).cast("double")
        when(total > 0, lit(1.0) - size(array_distinct(all)) / total)
          .otherwise(0.0).as("old")
      })
    assert(both.filter(abs(col("nw") - col("old")) > 1e-12).count() == 0)
    val m = both.as[(Long, Double, Double)].collect().map(r => r._1 -> r._2).toMap
    assert(m(1L) == 0.5 && m(2L) == 1.0 - 1.0 / 3.0 && m(3L) == 0.0 && m(4L) == 0.0 && m(5L) == 0.0)
  }

  test("null array elements hash to a sentinel instead of NPEing (public surface)") {
    // tokens()/shingles() never emit nulls, but these are public
    // functions over arbitrary array<string> columns (round-5 advice)
    val df = Seq(Seq("a", null, "a", null)).toDF("sh")
    val r = df.select(
      NativeHash.minhashSig(col("sh"), 8, 42L).as("mh"),
      NativeHash.simhash64(col("sh")).as("sh64"),
      NativeHash.shingleHashes(col("sh"), 2).as("shh"),
      NativeHash.shingleDupRatio(col("sh"), 2).as("dup")).head()
    assert((0 to 3).forall(i => !r.isNullAt(i)))
    // null is ONE MORE value, not skipped: 2-gram windows are
    // (a,∅)(∅,a)(a,∅) -> 2 distinct of 3 -> dup ratio 1/3
    assert(math.abs(r.getDouble(3) - (1.0 - 2.0 / 3.0)) < 1e-12)
  }

  test("SQL surface: shingle_hashes / char_shingle_hashes / sorted_intersect_count resolve") {
    Seq((Seq("a", "b", "c"), "xyzw")).toDF("toks", "s").createOrReplaceTempView("nh_sh")
    val r = spark.sql(
      """SELECT size(shingle_hashes(toks, 2)) AS ns,
        |       size(char_shingle_hashes(s, 2)) AS nc,
        |       sorted_intersect_count(shingle_hashes(toks, 2), shingle_hashes(toks, 2)) AS c
        |FROM nh_sh""".stripMargin)
      .as[(Int, Int, Int)].head()
    assert(r == ((2, 3, 2)))
  }

  test("SQL surface: hashed-band, srp-band, and cosine functions resolve") {
    docs.createOrReplaceTempView("nh_docs3")
    // hashed-input band buckets match the Column API on the same hashes
    val viaSql = spark.sql(
      "SELECT minhash_band_buckets_hashed(shingle_hashes(sh, 1), 64, 16) AS bb FROM nh_docs3")
      .as[Seq[Long]].collect().toSeq
    val viaCol = docs.select(
      NativeHash.minhashBandBucketsHashed(NativeHash.shingleHashes(col("sh"), 1), 64, 16).as("bb"))
      .as[Seq[Long]].collect().toSeq
    assert(viaSql == viaCol)
    assert(viaSql.head.size == 16 && viaSql.last.isEmpty) // empty doc -> zero buckets

    Seq((Seq(1f, -2f, 0.5f, 3f), Seq(1f, -2f, 0.5f, 3f))).toDF("a", "b")
      .createOrReplaceTempView("nh_vecs2")
    val (buckets, cos) = spark.sql(
      "SELECT srp_band_buckets(a, 4, 4, 8) AS bb, cosine_sim(a, b) AS c FROM nh_vecs2")
      .as[(Seq[Long], Double)].head()
    assert(buckets.size == 8 && math.abs(cos - 1.0) < 1e-12)
  }

  test("SQL surface: minhash_sig and simhash64 resolve via GraftExtensions") {
    docs.createOrReplaceTempView("nh_docs")
    val r = spark.sql(
      "SELECT size(minhash_sig(sh)) AS k, simhash64(sh) AS sh64 FROM nh_docs LIMIT 1")
      .as[(Int, Long)].head()
    assert(r._1 == 64)
  }

  test("SQL surface: minhash_band_buckets and srp_bits resolve via GraftExtensions") {
    docs.createOrReplaceTempView("nh_docs2")
    // band buckets: same values as the Column API (same default seed)
    val sqlBands = spark.sql(
      "SELECT minhash_band_buckets(sh, 64, 16) AS bb FROM nh_docs2")
      .as[Seq[Long]].collect().toSeq
    val colBands = docs.select(NativeHash.minhashBandBuckets(col("sh"), 64, 16).as("bb"))
      .as[Seq[Long]].collect().toSeq
    assert(sqlBands == colBands && sqlBands.head.size == 16)

    Seq(Seq(1f, -2f, 0.5f, 3f)).toDF("vec").createOrReplaceTempView("nh_vecs")
    val bits = spark.sql("SELECT srp_bits(vec, 4, 12) AS bits FROM nh_vecs")
      .as[Seq[Long]].head()
    assert(bits.size == 12 && bits.forall(b => b == 0L || b == 1L))
  }

  test("SQL surface: md5-fold family and window-selection functions resolve") {
    docs.createOrReplaceTempView("nh_docs4")
    // each SQL call must agree with its Column-API twin, value for value
    val viaSql = spark.sql(
      """SELECT md5_fold60(concat_ws(' ', sh)) AS f,
        |       portable_simhash60(sh) AS psh,
        |       shingle_dup_ratio(sh, 2) AS dup FROM nh_docs4""".stripMargin)
      .as[(Long, Long, Double)].collect().toSeq
    val viaCol = docs.select(
        NativeHash.fold60(concat_ws(" ", col("sh"))).as("f"),
        NativeHash.portableSimhash60(col("sh")).as("psh"),
        NativeHash.shingleDupRatio(col("sh"), 2).as("dup"))
      .as[(Long, Long, Double)].collect().toSeq
    assert(viaSql == viaCol)

    Seq("abcdefghij abcdefghij abcdefghij xyz").toDF("txt")
      .createOrReplaceTempView("nh_txt")
    val (cmp, cmpNative, win, winNative) = spark.sql(
      """SELECT content_mod_positions(txt, 8, 4) AS cmp,
        |       content_mod_positions(txt, 8, 4, false) AS cmp_native,
        |       winnow_positions(txt, 8, 4) AS win,
        |       winnow_positions(txt, 8, 4, false) AS win_native FROM nh_txt""".stripMargin)
      .as[(Seq[Long], Seq[Long], Seq[Long], Seq[Long])].head()
    val expected = spark.table("nh_txt").select(
        NativeHash.contentModPositions(col("txt"), 8, 4, portable = true).as("cmp"),
        NativeHash.contentModPositions(col("txt"), 8, 4, portable = false).as("cmp_native"),
        NativeHash.winnowPositions(col("txt"), 8, 4, portable = true).as("win"),
        NativeHash.winnowPositions(col("txt"), 8, 4, portable = false).as("win_native"))
      .as[(Seq[Long], Seq[Long], Seq[Long], Seq[Long])].head()
    assert((cmp, cmpNative, win, winNative) == expected)
    assert(cmp.nonEmpty && win.nonEmpty)
    assert(win == win.distinct.sorted) // winnow contract: distinct ascending
  }

  // texts covering multi-byte code points, repeats, and short/empty edges
  private lazy val selTexts = Seq(
    "the quick brown fox jumps over the lazy dog and keeps on running far",
    "abcabcabcabcabcabcabcabc",
    "汉字文本的窗口选择必须按码点对齐汉字文本的窗口选择必须按码点对齐",
    "mixed 汉字 and ascii in one document to cross byte widths 的 here",
    "tiny",
    ""
  ).toDF("t")

  test("md5_fold60 equals the interpreted hex-split fold (portableTokenHash)") {
    val rows = selTexts.filter(length(col("t")) > 0).select(
      NativeHash.fold60(col("t")).as("nw"),
      graft.operators.SimHashDedup.portableTokenHash(col("t")).as("old"))
      .as[(Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (nw, old) => assert(nw == old) }
  }

  test("portable_simhash60 equals the interpreted per-token fold + vote chain") {
    val toks = Seq(
      Seq("the", "quick", "brown", "fox", "the", "the"),
      Seq("汉字", "文本", "汉字"),
      Seq("lone"),
      Seq.empty[String]
    ).toDF("tk")
    val rows = toks.select(
      NativeHash.portableSimhash60(col("tk")).as("nw"),
      graft.operators.SimHashDedup.portableSimhash(
        transform(col("tk"), t => graft.operators.SimHashDedup.portableTokenHash(t))).as("old"))
      .as[(Long, Long)].collect()
    rows.foreach { case (nw, old) => assert(nw == old) }
  }

  test("content_mod_positions equals the interpreted per-position filter, both families") {
    val window = 6
    for (portable <- Seq(true, false); m <- Seq(1, 4)) {
      val hashOf: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
        if (portable) graft.operators.SimHashDedup.portableTokenHash else c => xxhash64(c)
      val old = filter(
        sequence(lit(1), length(col("t")) - (window - 1)),
        i => pmod(hashOf(col("t").substr(i, lit(window))), lit(m.toLong)) === 0L)
      val rows = selTexts.filter(length(col("t")) >= window).select(
        NativeHash.contentModPositions(col("t"), window, m, portable).as("nw"),
        transform(old, p => p.cast("long")).as("old"))
        .as[(Seq[Long], Seq[Long])].collect()
      assert(rows.nonEmpty)
      rows.foreach { case (nw, o) => assert(nw == o, s"portable=$portable m=$m") }
    }
  }

  test("assign_exact equals the interpreted decimal-fold argmin, ties to smallest cid") {
    val rng = new scala.util.Random(7L)
    val dim = 16
    val cents: Seq[(Int, Array[Double])] =
      (0 until 5).map(i => i -> Array.fill(dim)(rng.nextGaussian() * 10))
    val vecs = (Seq.fill(40)(Array.fill(dim)(rng.nextGaussian() * 10)) ++
      Seq(cents(3)._2.clone)) // exact centroid hit
      .map(v => Tuple1(v.toSeq)).toDF("v")
      .select(col("v").cast("array<double>").as("v"))
    val rows = vecs.select(
      NativeHash.assignExact(col("v"), cents).as("nw"),
      graft.operators.Embeddings.assignExact(col("v"), cents).as("old"))
      .as[(Int, Int)].collect()
    assert(rows.length == 41)
    rows.foreach { case (nw, old) => assert(nw == old) }
    // duplicated centroid: equal distances must pick the smaller cid
    val dupCents = Seq(2 -> cents.head._2, 0 -> cents.head._2)
    val tie = vecs.limit(5).select(
      NativeHash.assignExact(col("v"), dupCents).as("nw"),
      graft.operators.Embeddings.assignExact(col("v"), dupCents).as("old"))
      .as[(Int, Int)].collect()
    tie.foreach { case (nw, old) => assert(nw == 0 && old == 0) }
    // near-ties INSIDE the double-prune bracket (r17): distance gaps at
    // ~5e-13 sit below the prune's error bound, so both centroids must
    // survive to the exact decimal fold and the fold must decide — in
    // both orders (winner first / winner last)
    val zeroVec = Seq(Tuple1(Seq(0.0, 0.0))).toDF("v")
      .select(col("v").cast("array<double>").as("v"))
    for ((cNear, want) <- Seq(
        Seq(0 -> Array(1.0, 0.0), 1 -> Array(1.0 + 5e-13, 0.0), 2 -> Array(2.0, 0.0)) -> 0,
        Seq(0 -> Array(1.0, 0.0), 1 -> Array(1.0 - 5e-13, 0.0), 2 -> Array(2.0, 0.0)) -> 1)) {
      val got = zeroVec.select(
        NativeHash.assignExact(col("v"), cNear).as("nw"),
        graft.operators.Embeddings.assignExact(col("v"), cNear).as("old"))
        .as[(Int, Int)].head()
      assert(got == ((want, want)), s"near-tie: got $got want $want")
    }
  }

  test("assign_exact raises on null elements and on overflow, like the guarded fold") {
    val cents = Seq(0 -> Array(0.0, 0.0))
    val nullVec = Seq(Tuple1(Seq[java.lang.Double](1.0, null))).toDF("v")
      .select(col("v").cast("array<double>").as("v"))
    val e1 = intercept[Exception] {
      nullVec.select(NativeHash.assignExact(col("v"), cents)).collect()
    }
    assert(e1.getMessage != null)
    // squared distance 1e12 per element overflows decimal(28,18)'s 10
    // integer digits
    val big = Seq(Tuple1(Seq(1e6, 1e6))).toDF("v")
      .select(col("v").cast("array<double>").as("v"))
    val e2 = intercept[Exception] {
      big.select(NativeHash.assignExact(col("v"), cents)).collect()
    }
    assert(e2.getMessage != null)
  }

  test("winnow_positions equals the interpreted key-slice formulation, both families") {
    val window = 6
    for (portable <- Seq(true, false); guard <- Seq(1, 4, 8, 64)) {
      val keyOf: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
        if (portable) w => substring(md5(w.cast("binary")), 1, 16)
        else w => lpad(hex(xxhash64(w)), 16, "0")
      val nw = length(col("t")) - (window - 1)
      val keys = transform(sequence(lit(1), nw), i =>
        concat(keyOf(col("t").substr(i, lit(window))),
          lpad((lit(1000000000) - i).cast("string"), 10, "0")))
      val sel = array_distinct(transform(
        sequence(lit(1), greatest(nw - (guard - 1), lit(1))),
        j => array_min(slice(keys, j, lit(guard)))))
      val oldPos = array_sort(transform(sel, k =>
        lit(1000000000L) - substring(k, 17, 10).cast("long")))
      val rows = selTexts.filter(length(col("t")) >= window).select(
        NativeHash.winnowPositions(col("t"), window, guard, portable).as("nw"),
        oldPos.as("old"))
        .as[(Seq[Long], Seq[Long])].collect()
      assert(rows.nonEmpty)
      rows.foreach { case (nw, o) => assert(nw == o, s"portable=$portable guard=$guard") }
    }
  }
}
