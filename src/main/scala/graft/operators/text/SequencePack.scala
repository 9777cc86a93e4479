package graft.operators.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** GPT-style training-sequence layout — "concatenate and chunk": the
  * corpus is laid out in a deterministic document order, token counts are
  * prefix-summed, and the concatenated token stream is cut into
  * fixed-`seqLen` windows. Each document learns its global token offset
  * and which chunks its tokens span; a downstream writer can then emit
  * sequence `c` by taking every doc with `first_chunk <= c <= last_chunk`
  * (an equi-join on chunk id after an explode of the chunk range).
  *
  * No reference counterpart (the reference has no tokenizer/packing
  * stage); builder-prompt north-star extension.
  *
  * Scale: the naive formulation is `sum(tokens) over (order by id)` — a
  * GLOBAL ordered window, which Spark plans as a single-partition sort: a
  * scale-killer at 100 TB. This implementation is the classic two-phase
  * distributed prefix sum instead: range-partition by id, per-partition
  * subtotals (numPartitions rows) collected and cumulated on the driver,
  * broadcast back as per-partition bases, then a WITHIN-partition ordered
  * window adds the base — every stage distributed, exact, deterministic.
  */
object SequencePack {

  /** Most recent cached projection — released by the next call (same
    * single-consumer contract as CosineSimilarity.lastAssignmentCache):
    * the cache pins the range-partitioner's sampled boundaries so the
    * subtotal collect and the returned plan see the SAME partitioning.
    */
  private val lastCache =
    new java.util.concurrent.atomic.AtomicReference[DataFrame](null)

  /** Per-document chunk layout: (id, n_tokens, tok_start, first_chunk,
    * last_chunk, offset_in_chunk), ordered by `idCol`. `tokenCol` must be
    * a positive token count (rows with `tokenCol <= 0` or null are
    * dropped — they occupy no tokens in the stream).
    */
  def chunkLayout(df: DataFrame, idCol: String, tokenCol: String, seqLen: Int,
                  partitions: Int = 0): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    val spark = df.sparkSession
    val n = if (partitions > 0) partitions
            else spark.sessionState.conf.numShufflePartitions
    val id: Column = col(idCol)
    val ranged = df
      .select(id, col(tokenCol).cast("long").as("n_tokens"))
      .filter(col("n_tokens") > 0)
      .repartitionByRange(n, id)
      .withColumn("__pid__", spark_partition_id())
      .cache()
    graft.CacheScope.pin(ranged, lastCache)

    // per-partition subtotals: numPartitions rows — driver-sized by
    // construction, independent of corpus size
    val subtotals = ranged.groupBy("__pid__").agg(sum("n_tokens").as("t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val maxPid = if (subtotals.isEmpty) -1 else subtotals.keys.max
    val bases: Map[Int, Long] = (0 to maxPid)
      .scanLeft(0 -> 0L) { case ((_, acc), p) => p -> (acc + subtotals.getOrElse(p - 1, 0L)) }
      .toMap
    val baseOf =
      if (bases.isEmpty) lit(0L) else element_at(typedLit(bases), col("__pid__"))

    val localEnd = sum(col("n_tokens"))
      .over(Window.partitionBy(col("__pid__")).orderBy(id))
    ranged
      .withColumn("tok_end", localEnd + baseOf)
      .withColumn("tok_start", col("tok_end") - col("n_tokens"))
      .select(id, col("n_tokens"), col("tok_start"),
        floor(col("tok_start") / seqLen).as("first_chunk"),
        floor((col("tok_end") - 1) / seqLen).as("last_chunk"),
        pmod(col("tok_start"), lit(seqLen.toLong)).as("offset_in_chunk"))
  }
}
