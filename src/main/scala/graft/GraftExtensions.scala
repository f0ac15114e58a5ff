package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{BooleanType, IntegerType}

import graft.functions.{NativeHash, StringSim, Text, Vectors}
import org.apache.spark.sql.graft.Shims

/** SparkSessionExtensions entry point: exposes the engine's native
  * sketch expressions to SQL (`SELECT minhash_sig(shingles), …`).
  * Activated via `spark.sql.extensions=graft.GraftExtensions`
  * (GraftSession sets it by default).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  /** Register a 1-arg Column-composite function (graft.functions.Text
    * et al) under a SQL name: the builder lifts the argument expression
    * to a Column, applies the composition, and lowers the result back —
    * the SQL surface then covers the whole text-analysis family, not
    * just the native expressions.
    */
  private def column1(ext: SparkSessionExtensions, name: String)(
      f: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Unit =
    ext.injectFunction((
      FunctionIdentifier(name),
      new ExpressionInfo(classOf[Text.type].getName, name),
      (args: Seq[Expression]) => args match {
        case Seq(e) => Shims.catalystExpression(f(Shims.column(e)))
        case _ => throw new IllegalArgumentException(s"$name(expr) expects 1 argument")
      }))

  /** 2-arg flavor of [[column1]] (vector math, string similarity). */
  private def column2(ext: SparkSessionExtensions, name: String)(
      f: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) => org.apache.spark.sql.Column): Unit =
    ext.injectFunction((
      FunctionIdentifier(name),
      new ExpressionInfo(classOf[Vectors.type].getName, name),
      (args: Seq[Expression]) => args match {
        case Seq(a, b) => Shims.catalystExpression(f(Shims.column(a), Shims.column(b)))
        case _ => throw new IllegalArgumentException(s"$name(a, b) expects 2 arguments")
      }))

  override def apply(ext: SparkSessionExtensions): Unit = {
    // optimizer rule: full-count threshold predicates take the
    // early-exit merge walk (plans/IntersectBoundRewrite) — SQL and
    // DataFrame callers write the natural comparison, the plan runs the
    // bounded form
    ext.injectOptimizerRule(_ => graft.plans.IntersectBoundRewrite)
    column1(ext, "quality_score")(Text.qualityScore)
    column1(ext, "lang_id")(Text.langId)
    column1(ext, "token_count")(Text.tokenCount)
    column1(ext, "bpeish_token_count")(Text.bpeishTokenCount)
    column1(ext, "redact_pii")(Text.redactPii)
    column1(ext, "doc_fingerprint")(Text.fingerprint)
    // vector math (Column-composites over array<float>) + string
    // similarity (native codegen'd expressions) — same SQL surface as
    // the text family, so ANN scoring and fuzzy matching work from
    // spark.sql(...) without importing graft.functions
    column2(ext, "vec_dot")(Vectors.dot)
    column1(ext, "vec_norm")(Vectors.norm)
    column2(ext, "vec_l2_distance")(Vectors.l2Distance)
    column2(ext, "jaro")(StringSim.jaro)
    column2(ext, "jaro_winkler")(StringSim.jaroWinkler)
    ext.injectFunction((
      FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[NativeHash.MinHashSigExpr].getName, "minhash_sig"),
      (args: Seq[Expression]) => args match {
        case Seq(e) => NativeHash.MinHashSigExpr(e, 64, 42L)
        case Seq(e, Literal(k: Int, IntegerType)) => NativeHash.MinHashSigExpr(e, k, 42L)
        case _ => throw new IllegalArgumentException(
          "minhash_sig(array<string>[, numHashes]) expects 1 or 2 arguments")
      }))
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[NativeHash.SimHash64Expr].getName, "simhash64"),
      (args: Seq[Expression]) => args match {
        case Seq(e) => NativeHash.SimHash64Expr(e)
        case _ => throw new IllegalArgumentException("simhash64(array<string>) expects 1 argument")
      }))
    ext.injectFunction((
      FunctionIdentifier("minhash_band_buckets"),
      new ExpressionInfo(classOf[NativeHash.MinHashBandsExpr].getName, "minhash_band_buckets"),
      (args: Seq[Expression]) => args match {
        case Seq(e, Literal(k: Int, IntegerType), Literal(b: Int, IntegerType)) =>
          NativeHash.MinHashBandsExpr(e, k, b, 42L)
        case _ => throw new IllegalArgumentException(
          "minhash_band_buckets(array<string>, numHashes, numBands) expects literal int sizes")
      }))
    ext.injectFunction((
      FunctionIdentifier("shingle_hashes"),
      new ExpressionInfo(classOf[NativeHash.ShingleHashExpr].getName, "shingle_hashes"),
      (args: Seq[Expression]) => args match {
        case Seq(e, Literal(n: Int, IntegerType)) => NativeHash.ShingleHashExpr(e, n)
        case _ => throw new IllegalArgumentException(
          "shingle_hashes(array<string>, n) expects a literal int n")
      }))
    ext.injectFunction((
      FunctionIdentifier("char_shingle_hashes"),
      new ExpressionInfo(classOf[NativeHash.CharShingleHashExpr].getName, "char_shingle_hashes"),
      (args: Seq[Expression]) => args match {
        case Seq(e, Literal(n: Int, IntegerType)) => NativeHash.CharShingleHashExpr(e, n)
        case _ => throw new IllegalArgumentException(
          "char_shingle_hashes(string, n) expects a literal int n")
      }))
    ext.injectFunction((
      FunctionIdentifier("sorted_intersect_count"),
      new ExpressionInfo(classOf[NativeHash.SortedIntersectCountExpr].getName, "sorted_intersect_count"),
      (args: Seq[Expression]) => args match {
        case Seq(a, b) => NativeHash.SortedIntersectCountExpr(a, b)
        case _ => throw new IllegalArgumentException(
          "sorted_intersect_count(array<bigint>, array<bigint>) expects 2 arguments")
      }))
    ext.injectFunction((
      FunctionIdentifier("minhash_band_buckets_hashed"),
      new ExpressionInfo(classOf[NativeHash.MinHashBandsHashExpr].getName, "minhash_band_buckets_hashed"),
      (args: Seq[Expression]) => args match {
        case Seq(e, Literal(k: Int, IntegerType), Literal(b: Int, IntegerType)) =>
          NativeHash.MinHashBandsHashExpr(e, k, b, 42L)
        case _ => throw new IllegalArgumentException(
          "minhash_band_buckets_hashed(array<bigint>, numHashes, numBands) expects literal int sizes")
      }))
    ext.injectFunction((
      FunctionIdentifier("srp_band_buckets"),
      new ExpressionInfo(classOf[NativeHash.SrpBucketsExpr].getName, "srp_band_buckets"),
      (args: Seq[Expression]) => args match {
        case Seq(e, Literal(dim: Int, IntegerType), Literal(r: Int, IntegerType), Literal(l: Int, IntegerType)) =>
          NativeHash.SrpBucketsExpr(e, dim, r, l, 42L)
        case _ => throw new IllegalArgumentException(
          "srp_band_buckets(array<float>, dim, bitsPerTable, tables) expects literal int sizes")
      }))
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[NativeHash.CosineExpr].getName, "cosine_sim"),
      (args: Seq[Expression]) => args match {
        case Seq(a, b) => NativeHash.CosineExpr(a, b)
        case _ => throw new IllegalArgumentException(
          "cosine_sim(array<float>, array<float>) expects 2 arguments")
      }))
    // ---- portable md5-fold hash family + substring-window selection
    // (the compiled round-8 expressions; SQL names match prettyName) ----
    ext.injectFunction((
      FunctionIdentifier("md5_fold60"),
      new ExpressionInfo(classOf[NativeHash.Fold60Expr].getName, "md5_fold60"),
      (args: Seq[Expression]) => args match {
        case Seq(e) => NativeHash.Fold60Expr(e)
        case _ => throw new IllegalArgumentException("md5_fold60(string) expects 1 argument")
      }))
    ext.injectFunction((
      FunctionIdentifier("portable_simhash60"),
      new ExpressionInfo(classOf[NativeHash.PortableSimHash60Expr].getName, "portable_simhash60"),
      (args: Seq[Expression]) => args match {
        case Seq(e) => NativeHash.PortableSimHash60Expr(e)
        case _ => throw new IllegalArgumentException(
          "portable_simhash60(array<string>) expects 1 argument")
      }))
    ext.injectFunction((
      FunctionIdentifier("shingle_dup_ratio"),
      new ExpressionInfo(classOf[NativeHash.ShingleDupRatioExpr].getName, "shingle_dup_ratio"),
      (args: Seq[Expression]) => args match {
        case Seq(e, Literal(n: Int, IntegerType)) => NativeHash.ShingleDupRatioExpr(e, n)
        case _ => throw new IllegalArgumentException(
          "shingle_dup_ratio(array<string>, n) expects a literal int n")
      }))
    ext.injectFunction((
      FunctionIdentifier("content_mod_positions"),
      new ExpressionInfo(classOf[NativeHash.ContentModPositionsExpr].getName, "content_mod_positions"),
      (args: Seq[Expression]) => args match {
        case Seq(e, Literal(w: Int, IntegerType), Literal(m: Int, IntegerType)) =>
          NativeHash.ContentModPositionsExpr(e, w, m, portable = true)
        case Seq(e, Literal(w: Int, IntegerType), Literal(m: Int, IntegerType),
            Literal(p: Boolean, BooleanType)) =>
          NativeHash.ContentModPositionsExpr(e, w, m, p)
        case _ => throw new IllegalArgumentException(
          "content_mod_positions(string, window, sampleMod[, portable]) expects literal sizes")
      }))
    ext.injectFunction((
      FunctionIdentifier("winnow_positions"),
      new ExpressionInfo(classOf[NativeHash.WinnowPositionsExpr].getName, "winnow_positions"),
      (args: Seq[Expression]) => args match {
        case Seq(e, Literal(w: Int, IntegerType), Literal(g: Int, IntegerType)) =>
          NativeHash.WinnowPositionsExpr(e, w, g, portable = true)
        case Seq(e, Literal(w: Int, IntegerType), Literal(g: Int, IntegerType),
            Literal(p: Boolean, BooleanType)) =>
          NativeHash.WinnowPositionsExpr(e, w, g, p)
        case _ => throw new IllegalArgumentException(
          "winnow_positions(string, window, guard[, portable]) expects literal sizes")
      }))
    ext.injectFunction((
      FunctionIdentifier("srp_bits"),
      new ExpressionInfo(classOf[NativeHash.SrpBitsExpr].getName, "srp_bits"),
      (args: Seq[Expression]) => args match {
        case Seq(e, Literal(dim: Int, IntegerType), Literal(p: Int, IntegerType)) =>
          NativeHash.SrpBitsExpr(e, dim, p, 42L)
        case _ => throw new IllegalArgumentException(
          "srp_bits(array<float>, dim, nPlanes) expects literal int sizes")
      }))
  }
}
