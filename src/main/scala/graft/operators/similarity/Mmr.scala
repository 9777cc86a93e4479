package graft.operators.similarity

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Maximal Marginal Relevance re-ranking (Carbonell & Goldstein 1998) —
  * the diversity stage of a retrieval stack: from a per-query candidate
  * list with relevance scores, greedily select k items maximizing
  *
  *   mmr(d) = λ·rel(d) − (1 − λ)·max_{s ∈ selected} sim(d, s)
  *
  * so near-duplicates of an already-selected item are pushed down even
  * when individually relevant. sim is the rounded cosine of the items'
  * embedding vectors ([[graft.functions.VecExpressions]] `arr_cosine`,
  * the same grain as [[CosineSimilarity.annTopK]]); the first pick has an
  * empty selected set, so its penalty term is exactly 0.
  *
  * Plan shape: candidates join their vectors ONCE (one equi-join on the
  * item id), then k greedy rounds; every round is
  *   remaining ⟕ selected   (equi-join on the QUERY id)
  *   → per-candidate max-sim aggregate → per-query argmax window.
  * All joins and windows key on the query id, so work distributes across
  * queries however many there are; per query each round touches at most
  * C·i pairs (C = candidate-list size, i = picks so far) — at a typical
  * C ≤ 100, k ≤ 20 the whole re-rank is noise next to the retrieval
  * stage that produced the candidates. The selected frame is
  * `localCheckpoint`ed each round (house rule for iterative loops: a
  * frame re-joined against itself each round otherwise nests k levels of
  * lineage and the plan tree goes exponential).
  *
  * Determinism: rel is taken as-is (retrieval already rounds it), sims
  * round to 6 dp before the max, the mmr score rounds to 6 dp, and the
  * per-round argmax breaks ties by item id — a full unrolled replay runs
  * in any SQL engine (see the p89 oracle). λ enters as one double
  * literal in both engines. No reference counterpart — training-data /
  * RAG pipeline extension per the builder prompt.
  */
object Mmr {

  /** Greedy MMR pick of `k` items per query.
    *
    * @param candidates (qidCol, idCol, relCol) per-query candidate lists
    * @param vectors    (vecIdCol, vecCol) embeddings covering candidate ids;
    *                   candidates without a vector are dropped (they cannot
    *                   be diversity-scored)
    * @return (qidCol, rank, idCol, relCol, mmr) — rank 1..k in pick order
    */
  def rerank(candidates: DataFrame, vectors: DataFrame,
             qidCol: String, idCol: String, relCol: String,
             vecIdCol: String, vecCol: String,
             k: Int, lambda: Double = 0.7): DataFrame = {
    require(k > 0, "k must be positive")
    require(lambda >= 0.0 && lambda <= 1.0, "lambda must be in [0, 1]")
    val cand = candidates
      .join(vectors.select(col(vecIdCol).as(idCol), col(vecCol).as("__v__")), idCol)
      .select(col(qidCol), col(idCol), col(relCol),
        col("__v__").cast("array<double>").as("__v__"))
      .transform(graft.LoopFrames.materialize) // never unioned: the plain checkpoint is fine

    val simToSel = F.round(
      call_function("arr_cosine", col("__v__"), col("__sv__")), 6)
    val w = Window.partitionBy(col(qidCol))
      .orderBy(col("mmr").desc, col(idCol))

    var selected: DataFrame = null
    var round = 1
    while (round <= k) {
      val remaining =
        if (selected == null) cand
        else cand.join(selected.select(col(qidCol), col(idCol)),
          Seq(qidCol, idCol), "left_anti")
      val withPenalty =
        if (selected == null) remaining.withColumn("__ms__", lit(0.0))
        else remaining
          .join(selected.select(col(qidCol), col("__v__").as("__sv__")), Seq(qidCol))
          .groupBy(col(qidCol), col(idCol))
          .agg(first(col(relCol)).as(relCol), first(col("__v__")).as("__v__"),
            max(simToSel).as("__ms__"))
      val pick = withPenalty
        .withColumn("mmr", F.round(
          lit(lambda) * col(relCol) - lit(1.0 - lambda) * col("__ms__"), 6))
        .withColumn("__rn__", row_number().over(w))
        .filter(col("__rn__") === 1)
        .withColumn("rank", lit(round))
        .select(col(qidCol), col("rank"), col(idCol), col(relCol),
          col("mmr"), col("__v__"))
      val prev = selected
      selected = graft.LoopFrames.checkpoint(
        if (prev == null) pick else prev.unionByName(pick))
      // release the RDD-level blocks, not Dataset.unpersist: a
      // localCheckpoint never registers with the CacheManager, so
      // unpersist on the frame is a silent no-op and k rounds would
      // stack k checkpointed block sets (ADVICE r14)
      if (prev != null) graft.LoopFrames.release(prev)
      round += 1
    }
    val out = selected
      .select(col(qidCol), col("rank"), col(idCol), col(relCol), col("mmr"))
    graft.LoopFrames.release(cand)
    out
  }
}
