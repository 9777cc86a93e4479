package graft.operators.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Offline retrieval evaluation — the measurement half of the retrieval
  * stack ([[Bm25]] / [[graft.operators.similarity.Mmr]] / ANN): given a
  * ranked run and a qrels table of relevance judgments, compute the
  * standard per-query metrics. A retrieval pipeline nobody can score is
  * a pipeline nobody can tune; this is the operator that closes the loop
  * (swap BM25 ↔ dense ↔ hybrid and diff the numbers).
  *
  * Per query, at cutoff k:
  *   - `precision` = hits/k, `recall` = hits/n_rel;
  *   - `mrr` = 1/rank of the first relevant hit (0 when none);
  *   - `ndcg` = Σ_hits 1/log2(rank+1) ÷ Σ_{i=1..min(k,n_rel)} 1/log2(i+1)
  *     (binary relevance — graded qrels can pre-expand to repeated rows).
  *
  * Plan shape: one equi-join of the rank-cut run against qrels on
  * (query, doc) + two query-keyed aggregations — distributes over any
  * number of queries, never touches the corpus. Queries with no
  * judgments are dropped (undefined metrics), queries with judgments but
  * no hits score 0 across the board — the TREC convention.
  *
  * Determinism: every metric rounds to 6 dp; the DCG sums fold ≤ k
  * doubles (cross-engine associativity ~1e-15, far under the grain), and
  * the IDCG denominator is a per-row fold over a generated 1..min(k,n_rel)
  * sequence, so the whole evaluation replays in SQL.
  *
  * No reference counterpart; builder-prompt retrieval extension.
  */
object RetrievalMetrics {

  /** @param run   (qidCol, rankCol, idCol) ranked results, rank 1-based
    * @param qrels (qidCol, idCol) binary relevance judgments
    * @return (qidCol, n_rel, n_hit, precision, recall, mrr, ndcg)
    */
  def evaluate(run: DataFrame, qrels: DataFrame, qidCol: String,
               idCol: String, rankCol: String, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val nRel = qrels.groupBy(col(qidCol)).agg(count(lit(1)).as("n_rel"))
    val hits = run.filter(col(rankCol) <= k)
      .join(qrels.select(col(qidCol), col(idCol)), Seq(qidCol, idCol))
      .groupBy(col(qidCol))
      .agg(count(lit(1)).as("n_hit"),
        min(col(rankCol)).as("__first__"),
        sum(lit(1.0) / log2(col(rankCol).cast("double") + lit(1.0))).as("__dcg__"))
    nRel.join(hits, Seq(qidCol), "left")
      .withColumn("n_hit", coalesce(col("n_hit"), lit(0L)))
      .withColumn("precision",
        round(col("n_hit").cast("double") / k, 6))
      .withColumn("recall",
        round(col("n_hit").cast("double") / col("n_rel").cast("double"), 6))
      .withColumn("mrr", round(coalesce(
        lit(1.0) / col("__first__").cast("double"), lit(0.0)), 6))
      .withColumn("__idcg__", expr(
        s"aggregate(sequence(1, least($k, n_rel)), 0D, " +
          "(acc, i) -> acc + 1.0D / log2(CAST(i AS DOUBLE) + 1.0D))"))
      .withColumn("ndcg", round(
        coalesce(col("__dcg__"), lit(0.0)) / col("__idcg__"), 6))
      .select(col(qidCol), col("n_rel"), col("n_hit"),
        col("precision"), col("recall"), col("mrr"), col("ndcg"))
  }
}
