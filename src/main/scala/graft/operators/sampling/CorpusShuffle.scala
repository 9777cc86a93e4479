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

  /** THE portable uniform draw — one construction, one place (shared by
    * CorpusMix, ShardExport, TokenBudget, GroupCap, ImportanceSelect's
    * Gumbel mode): md5-hex prefix [1..8] parsed base-16, over 2^32. Every
    * DuckDB oracle replays it bit-exactly
    * (`CAST(CONCAT('0x', SUBSTR(MD5(id || ':' || seed), 1, 8)) AS UBIGINT)
    * / 4294967296.0`), so any change here must change them all.
    * `plusHalf = true` shifts the numerator by +0.5 — u strictly inside
    * (0,1), exactly representable — for consumers that take log(u).
    */
  private[graft] def draw(idCol: String, seed: Long,
                          plusHalf: Boolean = false): Column =
    draw(col(idCol).cast("string"), seed, plusHalf)

  /** Column-keyed variant for computed draw keys (CorpusSplit's
    * group/component keys). */
  private[graft] def draw(key: Column, seed: Long, plusHalf: Boolean): Column = {
    val raw = conv(substring(md5(concat_ws(":",
        key, lit(seed.toString))), 1, 8), 16, 10)
      .cast("long").cast("double")
    (if (plusHalf) raw + lit(0.5) else raw) / lit(4294967296.0)
  }

  /** Returns `df` totally ordered by the seeded draw. No position column
    * is materialized — a global row_number would single-partition; when a
    * downstream stage needs positions, [[graft.operators.text.SequencePack]]'s
    * two-phase prefix sum derives them from the same key distributively.
    */
  def shuffle(df: DataFrame, idCol: String, seed: Long = 42L): DataFrame =
    df.orderBy(draw(idCol, seed), col(idCol))
}
