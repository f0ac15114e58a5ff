package graft.operators

import org.apache.spark.sql.DataFrame

/** Partitioning helpers for CPU-bound operators. */
object Par {

  /** Widen a narrow input before heavy per-row compute. A small parquet
    * table arrives as one split (file < `maxPartitionBytes`), which
    * serializes all downstream expression work on a single core — fatal
    * for the interpreted higher-order-function pipelines the dedup/ANN
    * operators run (shingling, minhash, plane dots). A real cluster hits
    * the same pathology whenever scan splits ≪ cores × the per-row cost.
    * No-op when the input is already at least defaultParallelism wide —
    * at 100 TB the scan is thousands of splits and this adds nothing.
    */
  def widen(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    // probe the split count via the dataset's OWN query execution:
    // `df.rdd` would build a second QueryExecution (deserializer plan)
    // and plan the subtree twice
    val splits = df.queryExecution.toRdd.getNumPartitions
    if (splits < target) df.repartition(target) else df
  }
}
