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
    *
    * The partition probe (`df.rdd.getNumPartitions`) is only free on a
    * shuffle-free plan: under AQE it finalizes the physical plan, which
    * MATERIALIZES any upstream shuffle stages — and the later action on
    * the repartitioned frame would re-execute them. So when the plan
    * already contains a shuffle-producing operator the hatch is a no-op
    * by construction (the shuffle lands on `numShufflePartitions`
    * partitions, which is the parallelism the hatch would provide) and
    * the probe is skipped entirely. The single-input-split pathology this
    * hatch exists for (r10: cpu≈wall on sub-maxPartitionBytes local
    * files) only ever arises on scan-shaped plans.
    */
  def ensure(df: DataFrame, min: Int): DataFrame = {
    import org.apache.spark.sql.catalyst.plans.logical._
    def shuffles(p: LogicalPlan): Boolean = p.exists {
      case _: Join | _: Aggregate | _: Window | _: Distinct | _: Sort |
           _: RepartitionOperation | _: GlobalLimit | _: Deduplicate => true
      case _ => false
    }
    if (min <= 0 || shuffles(df.queryExecution.optimizedPlan)) df
    else if (df.rdd.getNumPartitions >= min) df
    else df.repartition(min)
  }
}
