package graft.operators.sampling

import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sharded training-data export: assign every row a global
  * rank in the seeded shuffle order (the same identity-keyed md5 draw as
  * [[CorpusShuffle]]/[[CorpusMix]]/[[CorpusSplit]]) and cut the order into
  * fixed-size shards — the "shuffle once, write N-row shards, stream them
  * round-robin" layout training loaders expect (webdataset-style, parquet
  * files instead of tars).
  *
  * Scale shape:
  *  - The global rank is NOT a single-partition `row_number()`: rows are
  *    range-partitioned on the draw key, each partition computes local
  *    ranks, and per-partition COUNTS (one long per partition — driver
  *    sized by construction) are prefix-summed into bases; rank = local
  *    rank + base. Same two-phase machinery as
  *    [[graft.operators.text.SequencePack.chunkLayout]].
  *  - Because the draw is md5-uniform, range boundaries are balanced
  *    regardless of ingest order, so shards come out uniformly sized
  *    without a skew pass.
  *  - [[write]] hash-repartitions by `shard` so each shard lands in
  *    exactly one task → exactly one parquet file per `shard=N/`
  *    directory, plus an underscore-prefixed `_manifest/` table
  *    (shard → rows, rank span) that readers and resume logic can trust
  *    without listing data files.
  *
  * No reference counterpart; beyond-reference LLM-pipeline surface per
  * the builder prompt, the output end of the CorpusShuffle →
  * SequencePack → TokenBudget chain.
  */
object ShardExport {

  // inside a script: pinned to the script's CacheScope (released at script
  // end, concurrent calls in one script coexist). Outside any scope:
  // single-flight — unpersist the previous call's ranged frame instead of
  // leaking one cache per invocation.
  private val lastCache = new AtomicReference[DataFrame](null)

  /** Input columns + (rank, shard). `rank` is the row's position in the
    * seed-`idCol` shuffle order (0-based, gap-free); `shard` =
    * rank / rowsPerShard.
    */
  def assignShards(df: DataFrame, idCol: String, rowsPerShard: Int,
                   seed: Long = 42L, partitions: Int = 0): DataFrame = {
    require(rowsPerShard > 0, "rowsPerShard must be positive")
    val spark = df.sparkSession
    val n = if (partitions > 0) partitions
            else spark.sessionState.conf.numShufflePartitions
    val id: Column = col(idCol)
    val ranged = df
      .withColumn("__d__", CorpusShuffle.draw(idCol, seed))
      .repartitionByRange(n, col("__d__"), id)
      .withColumn("__pid__", spark_partition_id())
      .cache()
    graft.CacheScope.pin(ranged, lastCache)

    // per-partition row counts: numPartitions longs, driver-sized
    val counts = ranged.groupBy("__pid__").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val maxPid = if (counts.isEmpty) -1 else counts.keys.max
    val bases: Map[Int, Long] = (0 to maxPid)
      .scanLeft(0 -> 0L) { case ((_, acc), p) => p -> (acc + counts.getOrElse(p - 1, 0L)) }
      .toMap
    val baseOf =
      if (bases.isEmpty) lit(0L) else element_at(typedlit(bases), col("__pid__"))

    val localRank = row_number()
      .over(Window.partitionBy(col("__pid__")).orderBy(col("__d__"), id))
      .cast("long") - lit(1L)
    ranged
      .withColumn("rank", localRank + baseOf)
      .withColumn("shard", floor(col("rank") / lit(rowsPerShard.toLong)))
      .drop("__d__", "__pid__")
  }

  /** Write `df` under `path` as `shard=N/part-*.parquet` (ONE file per
    * shard) plus a `_manifest/` parquet table
    * (shard, n_rows, first_rank, last_rank). Returns the manifest.
    */
  def write(df: DataFrame, path: String, idCol: String, rowsPerShard: Int,
            seed: Long = 42L): DataFrame = {
    val assigned = assignShards(df, idCol, rowsPerShard, seed)
    assigned
      .repartition(col("shard")) // one task owns each shard → one file each
      .sortWithinPartitions(col("shard"), col("rank"))
      .write.mode("overwrite").partitionBy("shard").parquet(path)
    val manifest = assigned.groupBy(col("shard"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("rank")).as("first_rank"),
        max(col("rank")).as("last_rank"))
      .orderBy(col("shard"))
    manifest.write.mode("overwrite").parquet(s"$path/_manifest")
    df.sparkSession.read.parquet(s"$path/_manifest").orderBy(col("shard"))
  }
}
