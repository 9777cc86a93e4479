package graft.operators.text

import org.apache.spark.sql.{Column, DataFrame, functions => F}
import org.apache.spark.sql.functions._
import graft.operators.sampling.GroupCap

/** Okapi BM25 lexical retrieval over a document corpus — the sparse half
  * of a RAG / training-data retrieval stack, next to the dense ANN path
  * ([[graft.operators.similarity.CosineSimilarity]]). For each query,
  * rank documents by
  *
  *   score(q, d) = Σ_{t ∈ q}  idf(t) · tf(t,d)·(k1+1) /
  *                            (tf(t,d) + k1·(1 − b + b·|d|/avgdl))
  *
  * with the Robertson/Lucene non-negative idf
  * `ln(1 + (N − df + 0.5)/(df + 0.5))`. Repeated query terms count once
  * (the common qtf-free variant); documents with zero matching terms are
  * simply absent, as in any inverted-index engine.
  *
  * Plan shape (the inverted index IS a DataFrame — no driver state):
  *  - [[postings]] = ONE corpus shuffle: per-row tokenize (codegen'd
  *    split/filter — no UDF) → explode → (doc, term) count with map-side
  *    partial aggregation; doc length rides the group key so no second
  *    pass over the text.
  *  - [[docFreq]] is a re-aggregation of the postings table (`COUNT(*)`
  *    per term — postings are already one row per (doc, term)).
  *  - [[topK]] scoring: the query term set is tiny by construction, so it
  *    is BROADCAST against the postings — the corpus-side table never
  *    shuffles for the probe. df/N/avgdl fold in as one broadcast of the
  *    query-term document frequencies and one 1-row stats broadcast.
  *  - per-query top-k is [[GroupCap.capPerGroupBy]]'s two-phase window
  *    (per-input-slice cap, then exact cap over ≤ P·k survivors), so a
  *    query matching half the corpus never funnels into one task.
  *
  * At 100 TB: the postings build is the canonical one-shuffle inverted
  * index; persist it (parquet, bucketed by term) and [[topKFromIndex]]
  * serves any number of query batches with zero corpus re-scans. Scoring
  * cost is Σ posting-list lengths of the query terms — independent of
  * corpus width — and the two-phase top-k bounds every task.
  *
  * Determinism: contributions are pure per-row doubles; the per-(q,doc)
  * sum is rounded to 6 dp (cross-engine fp-associativity over ≤ dozens of
  * terms sits at ~1e-13, far below the grain — the house recipe of
  * p20/p42), and ranks order by (rounded score DESC, doc id) so ties are
  * stable. No reference counterpart (the reference has no retrieval
  * scorer); training-data-pipeline extension per the builder prompt.
  */
object Bm25 {

  /** Lowercased whitespace tokens, empties dropped — per-row codegen. */
  private def toks(textCol: String): Column =
    expr(s"filter(split(lower($textCol), ' '), x -> x <> '')")

  /** Inverted index: one row per (term, doc) — (`term`, idCol, `tf`,
    * `dl`). Empty documents are absent (they can never match). One
    * shuffle; `dl` rides the group key.
    */
  def postings(corpus: DataFrame, idCol: String, textCol: String): DataFrame =
    corpus.select(col(idCol), toks(textCol).as("__toks__"))
      .withColumn("dl", size(col("__toks__")))
      .filter(col("dl") > 0)
      .select(col(idCol), col("dl"), explode(col("__toks__")).as("term"))
      .groupBy(col("term"), col(idCol), col("dl"))
      .agg(count(lit(1)).as("tf"))

  /** (`term`, `df`) document frequencies — a re-agg of [[postings]]. */
  def docFreq(postings: DataFrame): DataFrame =
    postings.groupBy("term").agg(count(lit(1)).as("df"))

  /** 1-row (`n_docs`, `avgdl`) over non-empty documents. The division is
    * spelled out (`SUM::double / COUNT`) so an oracle replays it exactly.
    */
  def corpusStats(corpus: DataFrame, textCol: String): DataFrame =
    corpus.select(size(toks(textCol)).as("__dl__"))
      .filter(col("__dl__") > 0)
      .agg(count(lit(1)).as("n_docs"),
        (sum(col("__dl__")).cast("double") /
          count(lit(1)).cast("double")).as("avgdl"))

  /** Score + rank from a prebuilt index (the persisted-postings path).
    * Output: (qidCol, `rank`, idCol, `score`, `n_hit`) with `rank` ≤ k.
    */
  def topKFromIndex(postings: DataFrame, docFreq: DataFrame, stats: DataFrame,
                    queries: DataFrame, idCol: String,
                    qidCol: String, qtextCol: String,
                    k: Int = 10, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k > 0, "k must be positive")
    val qt = queries
      .select(col(qidCol), explode(array_distinct(toks(qtextCol))).as("term"))
    // df only needed for matched terms: shrink before broadcasting
    val dfq = docFreq.join(broadcast(qt.select("term").distinct()), "term")
    val contrib =
      log(lit(1.0) + (col("n_docs").cast("double") - col("df") + lit(0.5)) /
            (col("df").cast("double") + lit(0.5))) *
        (col("tf").cast("double") * lit(k1 + 1.0)) /
        (col("tf").cast("double") +
          lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double") / col("avgdl")))
    val scored = postings
      .join(broadcast(qt), "term")
      .join(broadcast(dfq), "term")
      .crossJoin(broadcast(stats))
      .groupBy(col(qidCol), col(idCol))
      .agg(F.round(sum(contrib), 6).as("score"), count(lit(1)).as("n_hit"))
    val top = GroupCap.capPerGroupBy(scored, qidCol, k, "score",
      descending = true, idCol = idCol)
    top.withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col(qidCol))
          .orderBy(col("score").desc, col(idCol))))
      .select(col(qidCol), col("rank"), col(idCol), col("score"), col("n_hit"))
  }

  /** One-call form: build the index in-plan and score `queries`. */
  def topK(corpus: DataFrame, queries: DataFrame,
           idCol: String, textCol: String, qidCol: String, qtextCol: String,
           k: Int = 10, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val post = postings(corpus, idCol, textCol)
    topKFromIndex(post, docFreq(post), corpusStats(corpus, textCol),
      queries, idCol, qidCol, qtextCol, k, k1, b)
  }

  /** Pseudo-relevance-feedback query expansion (RM3-lite): run BM25,
    * treat the top `fbDocs` per query as relevant, score their terms by
    * `Σ tf · idf` (6-dp, the corpus-wide Robertson idf), and append the
    * top `fbTerms` terms the query does not already contain — ties by
    * term. Returns (qidCol, qtextCol) with the EXPANDED query text, ready
    * for a second [[topK]] round — the classic two-pass recall lift with
    * zero models.
    *
    * Plan shape: the feedback set is (#queries · fbDocs) rows; its join
    * back to the postings is doc-keyed and tiny on the probe side, term
    * scoring aggregates (#queries · fbDocs · doc-length) rows — all
    * bounded by the query batch, never the corpus.
    */
  def expandQueries(corpus: DataFrame, queries: DataFrame,
                    idCol: String, textCol: String,
                    qidCol: String, qtextCol: String,
                    fbDocs: Int = 5, fbTerms: Int = 3,
                    k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val post = postings(corpus, idCol, textCol)
    expandQueriesFromIndex(post, docFreq(post), corpusStats(corpus, textCol),
      queries, idCol, qidCol, qtextCol, fbDocs, fbTerms, k1, b)
  }

  /** [[expandQueries]] against a prebuilt index — the form that lets a
    * two-round pipeline (expand, then re-score) build the postings ONCE
    * and share them between both rounds.
    */
  def expandQueriesFromIndex(post: DataFrame, dfreq: DataFrame,
                             stats: DataFrame, queries: DataFrame,
                             idCol: String, qidCol: String, qtextCol: String,
                             fbDocs: Int = 5, fbTerms: Int = 3,
                             k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(fbDocs > 0 && fbTerms > 0, "fbDocs and fbTerms must be positive")
    val fb = topKFromIndex(post, dfreq, stats, queries, idCol,
        qidCol, qtextCol, fbDocs, k1, b)
      .select(col(qidCol), col(idCol))
    val qt = queries
      .select(col(qidCol), explode(array_distinct(toks(qtextCol))).as("term"))
    val idf = log(lit(1.0) + (col("n_docs").cast("double") - col("df") + lit(0.5)) /
      (col("df").cast("double") + lit(0.5)))
    val scored = fb.join(post, Seq(idCol))
      .groupBy(col(qidCol), col("term")).agg(sum(col("tf")).as("__tf__"))
      .join(dfreq, "term").crossJoin(broadcast(stats))
      .withColumn("__w__", F.round(col("__tf__").cast("double") * idf, 6))
      // drop terms the query already has
      .join(qt.withColumn("__has__", lit(1)), Seq(qidCol, "term"), "left")
      .filter(col("__has__").isNull)
    val top = scored
      .withColumn("__rn__", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col(qidCol))
          .orderBy(col("__w__").desc, col("term"))))
      .filter(col("__rn__") <= fbTerms)
      .groupBy(col(qidCol))
      .agg(array_join(array_sort(collect_list(col("term"))), " ").as("__exp__"))
    queries.select(col(qidCol), col(qtextCol))
      .join(top, Seq(qidCol), "left")
      .select(col(qidCol),
        when(col("__exp__").isNull, col(qtextCol))
          .otherwise(concat(col(qtextCol), lit(" "), col("__exp__")))
          .as(qtextCol))
  }

  /** Reciprocal-rank fusion (Cormack et al. 2009) of ranked lists:
    * `rrf(q, d) = Σ_lists 1/(c + rank)` over the lists where d appears.
    * Input frames carry (qid, rank, id); the fusion is a full outer join
    * per list — rank-only, so lexical and dense scores never need
    * calibrating against each other. Output: (qidCol, `rank`, idCol,
    * `rrf`, `n_lists`), top-k per query, rrf rounded to 6 dp, ties by id.
    *
    * At scale each input list is already top-k-bounded (k rows per
    * query), so the fusion join is trivially small however big the
    * corpus; the final window sees ≤ Σ k_i rows per query.
    */
  def rrfFuse(lists: Seq[DataFrame], qidCol: String, idCol: String,
              k: Int = 10, c: Int = 60): DataFrame = {
    require(lists.nonEmpty, "rrfFuse needs at least one ranked list")
    val parts = lists.zipWithIndex.map { case (l, i) =>
      l.select(col(qidCol), col(idCol),
        (lit(1.0) / (lit(c.toDouble) + col("rank").cast("double"))).as(s"__r$i"))
    }
    val joined = parts.reduce { (a, b) =>
      a.join(b, Seq(qidCol, idCol), "full_outer")
    }
    val rrf = parts.indices.map(i => coalesce(col(s"__r$i"), lit(0.0)))
      .reduce(_ + _)
    val hits = parts.indices.map(i =>
      when(col(s"__r$i").isNotNull, 1).otherwise(0)).reduce(_ + _)
    joined
      .withColumn("rrf", F.round(rrf, 6))
      .withColumn("n_lists", hits)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col(qidCol))
          .orderBy(col("rrf").desc, col(idCol))))
      .filter(col("rank") <= k)
      .select(col(qidCol), col("rank"), col(idCol), col("rrf"), col("n_lists"))
  }
}
