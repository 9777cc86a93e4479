package graft.operators.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Gopher-style document quality rules (Rae et al. 2021, appendix A1.1):
  * the standard named heuristic battery a crawl corpus is filtered with
  * BEFORE any model-based scoring — word-count bounds, mean-word-length
  * bounds, symbol-word and digit-word ratio caps, and a minimum count of
  * common-stopword hits (pure keyword lists and gibberish carry none).
  * Complements [[TextAnalysis]]'s diversity score (p5) and the
  * repetition filter (p22) with the doc-shape rules neither covers.
  *
  * Every rule is a per-row codegen'd expression over the whitespace token
  * array — no shuffle, no UDF, runs at scan speed at 100 TB, and every
  * predicate evaluates identically in DuckDB so the p48 oracle replays
  * the full battery.
  *
  * No reference counterpart; beyond-reference LLM-pipeline surface per
  * the builder prompt.
  */
object QualityRules {

  /** Gopher's "must contain ≥2 of these" stopword probe set (English). */
  val StopWords: Seq[String] =
    Seq("the", "and", "of", "to", "in", "is", "that", "for", "with", "it")

  /** Appends (n_words, mean_word_len, symbol_ratio, digit_ratio,
    * n_stop_hits, gopher_pass). Ratios and the mean are rounded to 4 dp
    * BEFORE the threshold comparisons so pass/fail is identical
    * cross-engine at ulp boundaries.
    */
  def gopher(df: DataFrame, textCol: String,
             minWords: Int = 50, maxWords: Int = 100000,
             minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
             maxSymbolRatio: Double = 0.1, maxDigitRatio: Double = 0.2,
             minStopHits: Int = 2): DataFrame =
    gopherImpl(df, textCol, array(StopWords.map(lit): _*), minWords, maxWords,
      minMeanLen, maxMeanLen, maxSymbolRatio, maxDigitRatio, minStopHits)

  /** Multilingual battery: the stopword probe is selected PER ROW from a
    * `lang → probe list` map that rides into the plan as ONE map Literal
    * (`typedlit` — a single object, not per-entry children), with
    * `defaultProbe` for unmapped languages. Every other rule is
    * language-neutral. Still a per-row codegen'd pass at scan speed: the
    * map lookup is one `element_at` per row, and the probe arrays are
    * probe-sized (tens of entries), not corpus-sized.
    */
  def gopherByLang(df: DataFrame, textCol: String, langCol: String,
                   probes: Map[String, Seq[String]],
                   defaultProbe: Seq[String] = StopWords,
                   minWords: Int = 50, maxWords: Int = 100000,
                   minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
                   maxSymbolRatio: Double = 0.1, maxDigitRatio: Double = 0.2,
                   minStopHits: Int = 2): DataFrame = {
    val probeArr = coalesce(
      element_at(typedlit(probes), col(langCol)), typedlit(defaultProbe))
    gopherImpl(df, textCol, probeArr, minWords, maxWords,
      minMeanLen, maxMeanLen, maxSymbolRatio, maxDigitRatio, minStopHits)
  }

  private def gopherImpl(df: DataFrame, textCol: String, stopArr: Column,
                         minWords: Int, maxWords: Int,
                         minMeanLen: Double, maxMeanLen: Double,
                         maxSymbolRatio: Double, maxDigitRatio: Double,
                         minStopHits: Int): DataFrame = {
    val words: Column = expr(s"filter(split($textCol, ' '), x -> x <> '')")
    val out = df
      .withColumn("__w__", words)
      .withColumn("n_words", size(col("__w__")).cast("long"))
      .withColumn("mean_word_len", round(
        aggregate(col("__w__"), lit(0L), (a, x) => a + length(x)).cast("double") /
          col("n_words"), 4))
      .withColumn("symbol_ratio", round(
        size(expr("filter(__w__, x -> instr(x, '#') > 0 OR instr(x, '...') > 0)"))
          .cast("double") / col("n_words"), 4))
      .withColumn("digit_ratio", round(
        size(filter(col("__w__"),
          x => length(regexp_replace(x, "[0-9]", "")) === 0))
          .cast("double") / col("n_words"), 4))
      .withColumn("n_stop_hits",
        size(filter(col("__w__"), x => array_contains(stopArr, lower(x)))).cast("long"))
    out
      .withColumn("gopher_pass",
        (col("n_words") >= minWords && col("n_words") <= maxWords &&
          col("mean_word_len") >= minMeanLen && col("mean_word_len") <= maxMeanLen &&
          col("symbol_ratio") <= maxSymbolRatio &&
          col("digit_ratio") <= maxDigitRatio &&
          col("n_stop_hits") >= minStopHits).cast("int"))
      .drop("__w__")
  }

  /** Just the survivors (the composable filter form). */
  def gopherFilter(df: DataFrame, textCol: String,
                   minWords: Int = 50, maxWords: Int = 100000,
                   minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
                   maxSymbolRatio: Double = 0.1, maxDigitRatio: Double = 0.2,
                   minStopHits: Int = 2): DataFrame =
    gopher(df, textCol, minWords, maxWords, minMeanLen, maxMeanLen,
        maxSymbolRatio, maxDigitRatio, minStopHits)
      .filter(col("gopher_pass") === 1)
      .drop("n_words", "mean_word_len", "symbol_ratio", "digit_ratio",
        "n_stop_hits", "gopher_pass")
}
