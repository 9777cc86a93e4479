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

  /** Guarantee at least `min` partitions for the per-row stage the caller
    * is about to add; `min <= 0` (the operators' default) disables the
    * hatch entirely.
    *
    * Two regimes, because the cheap partition probe
    * (`df.rdd.getNumPartitions`) is only free on a shuffle-free plan —
    * under AQE it finalizes the physical plan, which MATERIALIZES any
    * upstream shuffle stages, and the later action on the repartitioned
    * frame would re-execute them:
    *
    *  - scan-shaped plan (no shuffle op): probe, and repartition only if
    *    the scan underfills `min` — the single-input-split pathology this
    *    hatch exists for (r10: cpu≈wall on sub-maxPartitionBytes local
    *    files). When the scan already provides enough splits the plan
    *    keeps its audited zero-shuffle shape.
    *  - plan containing a shuffle: repartition unconditionally. A static
    *    "the shuffle lands on numShufflePartitions" skip is unsound — AQE
    *    can coalesce a small shuffle down to ONE partition, and the
    *    caller's expensive per-row stage (e.g. a UDF encode after a
    *    groupBy) would inherit it. The unprobed round-robin exchange is
    *    the price of the guarantee; acceptable because the hatch is an
    *    opt-in LOCAL-honesty knob (production callers leave `min = 0` —
    *    input splits provide the parallelism at 100 TB), and an adjacent
    *    caller-side repartition collapses with it (CollapseRepartition).
    */
  def ensure(df: DataFrame, min: Int): DataFrame = {
    // streaming frames: `.rdd`/optimizedPlan probes are illegal at analysis
    // time on a streaming source ("must be executed with
    // writeStream.start()"), and micro-batch sizing is the trigger's job —
    // the hatch is a batch-local concept, so it is a strict no-op here
    if (min <= 0 || df.isStreaming) df
    else if (shuffles(df.queryExecution.optimizedPlan)) df.repartition(min)
    else if (df.rdd.getNumPartitions >= min) df
    else df.repartition(min)
  }

  private def shuffles(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Boolean = {
    import org.apache.spark.sql.catalyst.plans.logical._
    p.exists {
      case _: Join | _: Aggregate | _: Window | _: Distinct | _: Sort |
           _: RepartitionOperation | _: GlobalLimit | _: Deduplicate => true
      case _ => false
    }
  }

}
