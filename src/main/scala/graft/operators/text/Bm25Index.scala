package graft.operators.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.VParquet

/** Persistent incremental BM25 index — rolling ingestion for the
  * retrieval stack ([[Bm25]]), built on the same vparquet state pattern
  * as [[graft.operators.dedup.SignatureStore]]: the corpus arrives in
  * batches (or streaming micro-batches) and queries must never trigger a
  * corpus re-scan.
  *
  * Layout under `indexPath` — two vparquet tables:
  *   - `postings/`  (term, doc_id, tf, dl): one append per batch,
  *     range-CLUSTERED by term so every file's manifest min/max covers a
  *     disjoint term range;
  *   - `stats/`     (n_docs, sum_dl): one row per batch; global N and
  *     avgdl are the sums — reading it is O(#batches), never O(corpus).
  *
  * The Lucene analogy is exact and intentional: per-batch appends are
  * small segments, [[maintain]] (zorder-compact on `term` + vacuum) is
  * the segment merge, and vparquet's manifest min/max skipping is the
  * term dictionary — [[topK]] filters postings on the query's term set,
  * so the custom FileIndex prunes every file whose term range cannot
  * match BEFORE task planning. Query cost is posting-lists-touched, not
  * index size; ingest cost is one shuffle over the batch.
  *
  * Exactly-once: pass (`txnAppId`, `txn`) — both tables record the
  * marker, a re-delivered batch is skipped per table, and a crash BETWEEN
  * the two commits heals on re-delivery exactly like the multi-table CDC
  * router (only the lagging table catches up). Scoring from a half-landed
  * batch is the only read anomaly in that window, the same contract as
  * any multi-table sink.
  *
  * No reference counterpart; builder-prompt retrieval extension.
  */
object Bm25Index {

  private def postingsPath(p: String) = s"$p/postings"
  private def statsPath(p: String) = s"$p/stats"

  /** Append one batch to the index. Returns the postings-table version.
    * `maintainEvery > 0`: every that-many postings versions, zorder-compact
    * on term + vacuum (the segment merge). Document ids must be globally
    * unique across batches (dedup upstream — [[SignatureStore]] exists for
    * exactly that).
    */
  def ingest(batch: DataFrame, idCol: String, textCol: String,
             indexPath: String,
             txn: Option[Long] = None, txnAppId: Option[String] = None,
             maintainEvery: Int = 16, retainVersions: Int = 8): Long = {
    val spark = batch.sparkSession
    val post = Bm25.postings(batch, idCol, textCol)
      .select(col("term"), col(idCol).as("doc_id"), col("tf"), col("dl"))
    val v = VParquet.write(post, postingsPath(indexPath), overwrite = false,
      txn = txn, txnAppId = txnAppId, clusterBy = Seq("term"))
    // n_docs and the EXACT integer token total (never avgdl·N — a double
    // reconstruction would drift as batches accumulate)
    val stats = batch
      .select(size(expr(
        s"filter(split(lower($textCol), ' '), x -> x <> '')")).as("__dl__"))
      .filter(col("__dl__") > 0)
      .agg(count(lit(1)).as("n_docs"), sum(col("__dl__")).as("sum_dl"))
    VParquet.write(stats, statsPath(indexPath), overwrite = false,
      txn = txn, txnAppId = txnAppId)
    if (maintainEvery > 0 && v > 0 && (v + 1) % maintainEvery == 0)
      maintain(spark, indexPath, retainVersions)
    v
  }

  /** Segment merge: fold the per-batch file tail into term-clustered
    * files and drop vacuumable history.
    */
  def maintain(spark: SparkSession, indexPath: String,
               retainVersions: Int = 8): Unit = {
    VParquet.compact(spark, postingsPath(indexPath), targetFileSizeMB = 128,
      zorderBy = Seq("term"))
    VParquet.vacuum(spark, postingsPath(indexPath), retainVersions)
    ()
  }

  /** BM25 top-k against the persisted index. The postings scan carries an
    * `IN (query terms)` filter, so manifest min/max skipping prunes files
    * before planning; df/N/avgdl come from the filtered postings and the
    * #batches-row stats table. Query-term sets are collected to build the
    * pushed filter — bounded by the query batch, never the corpus.
    */
  def topK(spark: SparkSession, indexPath: String, queries: DataFrame,
           qidCol: String, qtextCol: String, k: Int = 10,
           k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val terms = queries
      .select(explode(array_distinct(
        expr(s"filter(split(lower($qtextCol), ' '), x -> x <> '')"))).as("t"))
      .distinct().collect().map(_.getString(0)).toSeq
    val post = VParquet.loadVersion(spark, postingsPath(indexPath), None, None)
      .filter(col("term").isin(terms: _*))
    val stats = VParquet.loadVersion(spark, statsPath(indexPath), None, None)
      .agg(sum(col("n_docs")).as("n_docs"),
        (sum(col("sum_dl")).cast("double") /
          sum(col("n_docs")).cast("double")).as("avgdl"))
    Bm25.topKFromIndex(post, Bm25.docFreq(post), stats, queries,
      "doc_id", qidCol, qtextCol, k, k1, b)
  }
}
