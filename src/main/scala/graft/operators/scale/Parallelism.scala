package graft.operators.scale

import org.apache.spark.sql.DataFrame

/** Local-parallelism escape hatch for heavy per-row map passes.
  *
  * Zero-shuffle scoring passes (DSIR scoring, the Gopher batteries)
  * inherit the scan's partitioning. At production scale input splits
  * provide the parallelism (a 100 TB read is tens of thousands of
  * splits), so the right default is NO added exchange. But a local run
  * over a single sub-`maxPartitionBytes` parquet file is ONE input split,
  * and a CPU-bound projection then runs on one core of 32 (measured:
  * cpu≈wall for the r10 p44/p49 isolated runs). Callers that want local
  * honesty opt in with `minParallelism = spark.sparkContext
  * .defaultParallelism`; the hatch round-robins the rows out ONLY when
  * the plan would otherwise underfill that — when the scan already
  * provides enough partitions it is a no-op and the plan keeps its
  * audited zero-shuffle shape.
  */
object Parallelism {

  /** Repartition `df` to `min` partitions iff it currently has fewer;
    * `min <= 0` (the operators' default) disables the hatch entirely.
    */
  def ensure(df: DataFrame, min: Int): DataFrame =
    if (min <= 0 || df.rdd.getNumPartitions >= min) df
    else df.repartition(min)
}
