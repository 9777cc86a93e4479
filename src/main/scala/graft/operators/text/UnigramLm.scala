package graft.operators.text

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._

/** Corpus-trained unigram language-model scoring — the CCNet/RedPajama-style
  * "perplexity filter" stage of a training-data pipeline: score every
  * document by its cross-entropy under a unigram LM fitted on the corpus
  * itself (or on a held-out reference corpus), then drop the tails.
  * Fluent prose concentrates probability mass on common words; gibberish,
  * boilerplate tables, and wrong-language text score high.
  *
  * Two-phase, shared-shuffle shape (the same pattern as p10/p19/p20):
  *   1. `fit`: explode tokens → `groupBy(word).count()` — ONE shuffle with
  *      map-side partial aggregation; the model is (word, count) + the
  *      total-token scalar carried as a broadcast 1-row frame (no driver
  *      action at plan time).
  *   2. `score`: re-explode tokens, join against the model, per-doc
  *      `avg(-ln p)` — the model join is broadcast when `topV` bounds the
  *      vocabulary, so the corpus side shuffles ONCE (the per-doc agg).
  *
  * At 100 TB: an uncapped vocabulary is a heavy-hitter count problem —
  * pass `topV` (e.g. 2^18) to keep the model broadcastable; out-of-vocab
  * tokens then score with the pooled OOV mass (`p_oov = oovTokens / N`),
  * the standard single-UNK treatment. `topV = 0` keeps the exact full
  * vocabulary (used by the p26 oracle, where DuckDB mirrors the math
  * exactly).
  *
  * No reference counterpart (the reference has no LM scoring); this is a
  * north-star extension per the builder prompt. Cross-entropy is in nats,
  * rounded to 4 places — fp-associativity differences between engines sit
  * at ~1e-12, far below the rounding grain.
  */
object UnigramLm {

  /** (word, cnt) unigram counts over whitespace tokens. One shuffle. */
  def fit(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(split(col(textCol), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** Per-document cross-entropy under the corpus unigram LM.
    * Output: (idCol, n_tokens, xent) — xent = −(1/n)·Σ ln p(w), 4 dp.
    * Documents with no tokens are dropped (no probability is defined).
    */
  def crossEntropy(df: DataFrame, idCol: String, textCol: String,
                   topV: Int = 0): DataFrame = {
    val model = fit(df, textCol)
    // total-token count as a 1-row frame: crossJoin(broadcast(...)) keeps
    // the scalar in the plan instead of a driver-side collect
    val total = model.agg(sum("cnt").as("n_total"))
    val tokens = df
      .select(col(idCol), explode(split(col(textCol), " ")).as("word"))
      .filter(col("word") =!= "")
    val scored =
      if (topV <= 0) {
        // exact mode: every corpus token is in the model by construction
        tokens.join(model, "word")
      } else {
        // scale mode: top-V words (ties broken by word) broadcast; the
        // remaining mass pools into one OOV pseudo-count
        val vocab = model.orderBy(col("cnt").desc, col("word")).limit(topV)
        val oov = model.join(vocab.select("word"), Seq("word"), "left_anti")
          .agg(coalesce(sum("cnt"), lit(0L)).as("oov_cnt"))
        tokens
          .join(broadcast(vocab), Seq("word"), "left")
          .crossJoin(broadcast(oov))
          .withColumn("cnt", coalesce(col("cnt"), greatest(col("oov_cnt"), lit(1L))))
          .drop("oov_cnt")
      }
    scored
      .crossJoin(broadcast(total))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        F.round(-avg(log(col("cnt").cast("double") / col("n_total").cast("double"))), 4)
          .as("xent"))
  }
}
