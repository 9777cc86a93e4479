package graft.operators.text

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._

/** Corpus-trained interpolated bigram language-model scoring — the next
  * rung above [[UnigramLm]] on the CCNet/KenLM "perplexity filter" ladder:
  * score every document by its cross-entropy under a Jelinek-Mercer
  * interpolated bigram LM fitted on the corpus itself.  A bigram model
  * separates fluent prose from keyword-stuffed or shuffled text that a
  * unigram model cannot tell apart (same words, wrong order).
  *
  *   P(w2 | w1) = lambda * C(w1,w2) / C(w1·)  +  (1 - lambda) * C(w2) / N
  *
  * where C(w1·) is the *context* count (bigrams starting with w1) so the
  * conditional sums to 1, and the unigram term uses plain token counts.
  *
  * Plan shape (all equi-joins, no driver state):
  *   - bigram extraction is per-row: `zip_with(slice, slice)` over the
  *     token array — no shuffle, no UDF, stays in whole-stage codegen;
  *   - `fit` = ONE bigram-count shuffle (map-side partial agg); context
  *     counts reuse that table (cheap re-agg), unigram counts are one
  *     token-count shuffle (shared shape with [[UnigramLm.fit]]);
  *   - `score` = bigram stream left-joined to the (pruned) bigram model,
  *     inner-joined to context + unigram counts, then ONE per-doc agg.
  *
  * At 100 TB the bigram table is the big object: it stays a distributed
  * sort-merge equi-join (never collected), and `minCount` prunes the long
  * tail of hapax bigrams — a pruned bigram backs off to the unigram term
  * alone (its lambda-weighted ML term reads as 0), the standard
  * stupid-backoff-style treatment. Context counts are computed BEFORE
  * pruning so retained conditionals stay exact. Documents with fewer than
  * two tokens have no bigrams and are dropped, mirroring p26's empty-doc
  * rule.
  *
  * No reference counterpart (the reference has no LM scoring); this is a
  * training-data-pipeline extension per the builder prompt. Cross-entropy
  * is in nats, rounded to 4 places — cross-engine fp-associativity sits
  * at ~1e-12, far below the rounding grain.
  */
object BigramLm {

  /** (doc, w1, w2) consecutive-token pairs, extracted per-row (no shuffle). */
  def bigrams(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = expr(s"filter(split($textCol, ' '), x -> x <> '')")
    df.select(col(idCol), toks.as("__toks__"))
      .filter(size(col("__toks__")) >= 2) // slice needs a non-negative length
      .withColumn("__bg__", explode(expr(
        "zip_with(slice(__toks__, 1, size(__toks__) - 1), " +
        "         slice(__toks__, 2, size(__toks__) - 1), " +
        "         (a, b) -> struct(a AS w1, b AS w2))")))
      .select(col(idCol), col("__bg__.w1"), col("__bg__.w2"))
  }

  /** (w1, w2, cnt) bigram counts over the corpus. One shuffle. */
  def fit(df: DataFrame, textCol: String): DataFrame =
    bigrams(df.select(lit(0).as("__id__"), col(textCol)), "__id__", textCol)
      .groupBy("w1", "w2").agg(count(lit(1)).as("cnt"))

  /** Per-document cross-entropy under the interpolated bigram LM.
    * Output: (idCol, n_bigrams, xent) — xent = −(1/(n−1))·Σ ln P(w_i|w_{i−1}),
    * 4 dp. `minCount` prunes model bigrams seen fewer times (the pruned
    * mass backs off to the unigram term); `lambda` is the ML-term weight.
    */
  def crossEntropy(df: DataFrame, idCol: String, textCol: String,
                   lambda: Double = 0.8, minCount: Long = 1L): DataFrame = {
    val big = fit(df, textCol)
    // context counts BEFORE pruning, so P(.|w1) stays a true conditional
    val ctx = big.groupBy("w1").agg(sum("cnt").as("ctx_cnt"))
    val model = if (minCount > 1L) big.filter(col("cnt") >= minCount) else big
    val uni = UnigramLm.fit(df, textCol)
      .withColumnRenamed("word", "w2").withColumnRenamed("cnt", "uni_cnt")
    val total = uni.agg(sum("uni_cnt").as("n_total"))
    val stream = bigrams(df, idCol, textCol)
    stream
      .join(model, Seq("w1", "w2"), "left")
      .join(ctx, Seq("w1"))
      .join(uni, Seq("w2"))
      .crossJoin(broadcast(total))
      .withColumn("p",
        lit(lambda) * (coalesce(col("cnt"), lit(0L)).cast("double") /
                       col("ctx_cnt").cast("double")) +
        lit(1.0 - lambda) * (col("uni_cnt").cast("double") /
                             col("n_total").cast("double")))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        F.round(-avg(log(col("p"))), 4).as("xent"))
  }
}
