package graft.operators.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Query-biased snippet extraction — the display stage of the retrieval
  * stack ([[Bm25]] → [[graft.operators.similarity.Mmr]] → THIS): for each
  * (query, hit document) pair, find the token window with the most query-
  * term occurrences, the text a RAG prompt or a results page actually
  * shows. Deterministic contract: fixed `window`-token windows at
  * `stride` starts (plus a final short window covering the tail), score =
  * occurrences of query terms in the window, STRICT-max fold keeps the
  * EARLIEST best window on ties.
  *
  * Everything is one per-row expression chain (transform/filter/aggregate
  * HOFs over the token array) — no shuffle beyond whatever join produced
  * the (text, query-terms) pairs; the windows array is materialized once
  * per row and the argmax folds over it (HOF lambdas get no CSE, so the
  * per-window score is computed exactly once by construction).
  *
  * No reference counterpart; builder-prompt retrieval extension.
  */
object Snippets {

  /** Adds `snippet` (the best window's text, space-joined) and `n_hits`
    * (its query-term occurrence count) next to `textCol`; `qtermsCol` is
    * an array<string> column of the query's terms. Null text or terms
    * yield a null snippet and 0 hits; empty text an empty snippet.
    *
    * Argmax shape: the per-window hit counts materialize ONCE as an
    * array column, then `array_max` + the FIRST `array_position` pick
    * the earliest best start — the formulation both engines agree on
    * (a struct-fold argmax tripped a DuckDB field-pushdown bug where
    * `.s` and `.h` of the same reduce disagreed).
    */
  def bestWindow(df: DataFrame, textCol: String, qtermsCol: String,
                 window: Int = 8, stride: Int = 4): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      "need window >= stride > 0")
    val toks = s"filter(split(lower($textCol), ' '), x -> x <> '')"
    val hitsPerWindow = expr(
      s"""transform(sequence(0, greatest(size($toks) - 1, 0), $stride),
         |  s -> size(filter(slice($toks, s + 1, $window),
         |    t -> array_contains($qtermsCol, t))))""".stripMargin)
    df.withColumn("__hl__",
        when(col(textCol).isNotNull && col(qtermsCol).isNotNull, hitsPerWindow))
      .withColumn("n_hits", coalesce(array_max(col("__hl__")), lit(0)).cast("int"))
      .withColumn("__bs__",
        (array_position(col("__hl__"), array_max(col("__hl__"))) - 1) *
          lit(stride))
      .withColumn("snippet",
        when(col("__hl__").isNotNull,
          array_join(expr(s"slice($toks, CAST(__bs__ AS INT) + 1, $window)"), " ")))
      .select(df.columns.map(col) :+ col("snippet") :+ col("n_hits"): _*)
  }
}
