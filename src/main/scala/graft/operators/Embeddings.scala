package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed vector aggregation over `array<float>` embedding columns
  * — the building block of k-means / IVF-quantizer training and
  * per-group prototype computation at corpus scale.
  *
  * Scale shape: the vector is exploded to (group, dim, value) rows, so
  * the mean is an ordinary partial-aggregatable groupBy on a narrow
  * composite key — no per-group state holds a whole vector, no driver
  * collect, and skewed groups split like any other aggregate under AQE.
  * The per-group re-assembly (collect dims, sort, project values) runs
  * on `groups × dim` rows — trivially small next to the corpus.
  */
object Embeddings {

  /** Per-group element-wise mean vector. Output: (groupCol,
    * centroid array<double>), dimensions averaged independently.
    */
  def centroids(df: DataFrame, groupCol: String, vecCol: String): DataFrame =
    centroidDims(df, groupCol, vecCol)
      .groupBy(col(groupCol))
      .agg(array_sort(collect_list(struct(col("pos"), col("value")))).as("__dm"))
      .select(col(groupCol),
        transform(col("__dm"), x => x.getField("value")).as("centroid"))

  /** Per-group per-dimension mean as scalar rows (groupCol, pos, value)
    * — the shuffle-friendly long form; `centroids` re-assembles it.
    * 0-based `pos` matches Spark's `posexplode`.
    */
  def centroidDims(df: DataFrame, groupCol: String, vecCol: String): DataFrame =
    df.select(col(groupCol), posexplode(col(vecCol)).as(Seq("pos", "__v")))
      .groupBy(col(groupCol), col("pos"))
      .agg(avg(col("__v")).as("value"))
}
