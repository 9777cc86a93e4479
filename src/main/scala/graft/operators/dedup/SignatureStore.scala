package graft.operators.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sources.VParquet

/** Incremental near-duplicate ingestion: dedup each NEW batch against the
  * accumulated corpus WITHOUT rescanning it, by keeping a persistent
  * MinHash signature store — the missing piece between one-shot
  * `minHashSelfJoin` (whole-corpus, every run) and a real rolling 100 TB
  * ingestion pipeline, where the historical corpus is orders of magnitude
  * larger than each day's batch and must never be re-shingled.
  *
  * The store is a VPARQUET table of `(doc_id, sig, n_sh)` — so updates are
  * atomic manifest commits, racing ingestion jobs get the transactional
  * claim semantics, and the signature history is time-travelable like any
  * other table. Store rows keep only the numHashes-long signature (~1 KB),
  * not text or shingles: per-batch cost is |batch| shingling + a band-key
  * equi-join against the store's posting rows, never O(corpus) text.
  *
  * Decision rule against the store: banded LSH candidate generation, then
  * the signature-overlap estimate `|{i : sigA[i]=sigB[i]}| / numHashes`
  * (an unbiased estimator of Jaccard) — exact shingle verification is
  * impossible without retaining the historical text, which is the point of
  * a signature store; the estimator's variance at numHashes=96 is ±~0.05.
  * WITHIN the batch, shingles are at hand, so the batch self-dedup uses
  * the exact-verified [[TextDedup.minHashSelfJoin]].
  *
  * No reference counterpart; builder-prompt north-star extension.
  */
object SignatureStore {

  /** Most recent batch-signature cache — released by the next call (the
    * same single-consumer contract as CosineSimilarity's assignment cache:
    * the returned plan recomputes deterministically if released early).
    */
  private val lastSigCache =
    new java.util.concurrent.atomic.AtomicReference[DataFrame](null)

  /** Batch survivors after (1) exact-verified within-batch minhash dedup
    * and (2) signature-estimate dedup against the store at `storePath`;
    * with `update=true` the survivors' signatures are appended to the
    * store in one atomic commit (re-submitting the same batch then yields
    * ZERO survivors — idempotent ingestion). A missing/empty store means
    * "first batch": only the within-batch dedup applies.
    *
    * Store maintenance: every append adds a file-per-partition tail, so
    * an unmaintained store's posting-list read degrades O(#batches) in
    * file count and its manifest log grows without bound. Every
    * `maintainEvery` committed versions the store auto-compacts (one
    * atomic rewrite of the accumulated small files) and vacuums history
    * older than `retainVersions` — keeping reads O(files-compacted) over
    * any number of ingest batches. `maintainEvery=0` disables (callers
    * owning their own maintenance window).
    */
  def dedupAgainst(batch: DataFrame, idCol: String, textCol: String,
                   storePath: String, threshold: Double,
                   bands: Int = 24, rowsPerBand: Int = 4, shingleN: Int = 3,
                   update: Boolean = true, maintainEvery: Int = 16,
                   retainVersions: Int = 8): DataFrame = {
    val spark = batch.sparkSession
    val numHashes = bands * rowsPerBand
    val sh = TextDedup.shingles(batch, idCol, textCol, shingleN)
    val sigs = sh
      .withColumn("sig", expr(s"minhash_sig(shingles, $numHashes)"))
      .select(col("doc_id"), col("sig"), size(col("shingles")).as("n_sh"))
      .cache()
    graft.CacheScope.pin(sigs, lastSigCache)

    // (1) within-batch: exact-verified pairs -> keep component minima
      val batchPairs = TextDedup.minHashSelfJoin(sh, threshold, bands, rowsPerBand)
        .select(col("a_id"), col("b_id"))
      val batchSurvivors =
        graft.ets.DedupET.keepComponentMin(batch, idCol, batchPairs)

      // (2) vs store: banded candidates, signature-overlap estimate
      val vsStore = VParquet.latestVersion(spark, storePath) match {
        case None => batchSurvivors
        case Some(_) =>
          val store = VParquet.loadVersion(spark, storePath, None, None)
          val sigLen = store.select(size(col("sig"))).head(1)
          require(sigLen.isEmpty || sigLen(0).getInt(0) == numHashes,
            s"signature store $storePath was built with ${sigLen(0).getInt(0)} " +
              s"hashes; this call uses $numHashes (bands x rowsPerBand) — " +
              "parameters are part of the store layout")
          def banded(s: DataFrame, side: String) = s.select(
            col("doc_id").as(s"${side}_id"), col("sig").as(s"${side}_sig"),
            posexplode(expr(s"transform(sequence(0, ${bands - 1}), " +
              s"b -> slice(sig, b * $rowsPerBand + 1, $rowsPerBand))"))
              .as(Seq("band", "key")))
          val dupIds = banded(sigs, "new")
            .join(banded(store, "old").drop("old_sig"), Seq("band", "key"))
            .select(col("new_id"), col("new_sig"), col("old_id")).distinct()
            .join(store.select(col("doc_id").as("old_id"), col("sig").as("old_sig")), "old_id")
            // unbiased Jaccard estimate from component agreement — one
            // codegen'd zip per surviving candidate, no text access
            .withColumn("est", size(filter(
              zip_with(col("new_sig"), col("old_sig"), (a, b) => a === b),
              x => x)).cast("double") / numHashes)
            .filter(col("est") >= threshold)
            .select(col("new_id").as("__dup__")).distinct()
          batchSurvivors.join(dupIds,
            batchSurvivors(idCol) === dupIds("__dup__"), "left_anti")
      }

      if (update) {
        val newRows = sigs.join(
          vsStore.select(col(idCol).as("doc_id")), Seq("doc_id"), "left_semi")
        // REBALANCE before the append (guide §6): output file count must
        // follow the BATCH SIZE (AQE sizes the partitions), not whatever
        // partitioning the signature computation ran at — a hatched or
        // wide upstream otherwise leaves one tiny file per partition per
        // ingest and the store's file tail outgrows the compaction cadence
        val v = VParquet.write(newRows.hint("rebalance"), storePath,
          overwrite = false)
        // cadence maintenance: fold the per-batch file tail back down and
        // drop vacuumable history so posting reads stay bounded; the
        // compact lands as version v+1, so the next trigger is N appends out
        if (maintainEvery > 0 && v > 0 && (v + 1) % maintainEvery == 0) {
          VParquet.compact(spark, storePath, targetFileSizeMB = 128)
          VParquet.vacuum(spark, storePath, retainVersions)
          ()
        }
      }
      vsStore
  }
}
