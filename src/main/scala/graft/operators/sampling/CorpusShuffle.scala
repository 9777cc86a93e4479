package graft.operators.sampling

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic global corpus shuffle — the training-order
  * randomization step before sequence packing ("shuffle the corpus, then
  * stream it"). The order key is the same identity-keyed md5 draw as
  * [[CorpusMix]]/[[CorpusSplit]]/[[GroupCap]] (ties broken by id), so
  * the permutation is a pure function of (row identity, seed):
  * reproducible across cluster sizes, partitionings, retries, and
  * re-runs, and re-seeding gives an independent epoch permutation
  * without touching the data.
  *
  * Scale shape: `orderBy` is Spark's distributed sort — range partition
  * on sampled key boundaries, then per-partition sort; no single-point
  * task at any size (this is the same path a 100 TB `ORDER BY` takes).
  * Because the key is md5-uniform, the range boundaries are uniform too,
  * so the sorted output is balance-guaranteed even when the input is
  * badly skewed by ingest order. Downstream writers preserve the order
  * per output file, and [[graft.operators.text.SequencePack]] consumes
  * the shuffled order via its own range repartition on the same key.
  *
  * No reference counterpart (closest: TableRepartition, which
  * re-buckets but does not order); builder-prompt north-star extension.
  */
object CorpusShuffle {

  /** uniform draw, identical construction to [[CorpusMix.mix]] (shared
    * with [[ShardExport]]). */
  private[sampling] def draw(idCol: String, seed: Long): Column =
    conv(substring(md5(concat_ws(":",
        col(idCol).cast("string"), lit(seed.toString))), 1, 8), 16, 10)
      .cast("long").cast("double") / lit(4294967296.0)

  /** Returns `df` totally ordered by the seeded draw. No position column
    * is materialized — a global row_number would single-partition; when a
    * downstream stage needs positions, [[graft.operators.text.SequencePack]]'s
    * two-phase prefix sum derives them from the same key distributively.
    */
  def shuffle(df: DataFrame, idCol: String, seed: Long = 42L): DataFrame =
    df.orderBy(draw(idCol, seed), col(idCol))
}
