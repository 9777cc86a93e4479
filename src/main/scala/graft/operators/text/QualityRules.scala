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

  /** Gopher's repetition battery (Rae et al. 2021, appendix A1.2): the
    * fraction of a document's characters claimed by its most frequent word
    * n-gram (n = 2, 3, 4) and by duplicated 5-grams — the shape of
    * boilerplate, keyword stuffing and generation loops that the A1.1
    * doc-shape rules can't see (complementing p22's repeated-n-gram RATIO,
    * which counts n-grams, not character mass).
    *
    * Appends (top2_char_frac, top3_char_frac, top4_char_frac,
    * dup5_char_frac, rep_pass). Char mass of an n-gram excludes the n−1
    * joining spaces; fractions are over the document's total word
    * characters, rounded to 4 dp BEFORE the threshold comparisons
    * (cross-engine determinism), and dup5 is capped at 1.0 (overlapping
    * duplicated windows can claim more chars than exist). The top-n
    * fractions are deliberately NOT capped — overlapping occurrences can
    * push them past 1.0, which fails every sane threshold, exactly as a
    * maximally repetitive document should.
    *
    * Still per-row expressions only — no shuffle, scan speed. Cost is
    * O(distinct n-grams × n-grams) per row (a nested filter count, not a
    * map-build), bounded by document length, independent of corpus size.
    */
  def repetition(df: DataFrame, textCol: String,
                 maxTop2: Double = 0.20, maxTop3: Double = 0.18,
                 maxTop4: Double = 0.16, maxDup5: Double = 0.15): DataFrame = {
    // HOF lambdas get NO common-subexpression elimination (the
    // ImportanceSelect portable-hash lesson): every invariant — the word
    // array, each n-gram array, its distinct set, and the per-n top count —
    // is materialized as a COLUMN first, so lambdas only reference bound
    // attributes, never recompute an aggregate per element.
    def ngrams(n: Int): Column =
      when(size(col("__w__")) < n, typedlit(Seq.empty[String]))
        .otherwise(transform(
          sequence(lit(1), size(col("__w__")) - lit(n - 1)),
          i => array_join(slice(col("__w__"), i, lit(n)), " ")))
    def cnt(all: String, g: Column): Column =
      size(filter(col(all), y => y === g))
    // top-|n|-gram char mass in two aligned passes (no struct ordering —
    // DuckDB's list_max over structs is not portable): max count (its own
    // column), then max char mass among the n-grams achieving it
    def topc(n: Int): Column =
      array_max(transform(col(s"__d${n}__"), g => cnt(s"__ng${n}__", g)))
    def topFrac(n: Int): Column = {
      val mass = array_max(transform(col(s"__d${n}__"), g =>
        when(cnt(s"__ng${n}__", g) === col(s"__t${n}__"),
          cnt(s"__ng${n}__", g) * (length(g) - lit(n - 1)))
          .otherwise(lit(0))))
      coalesce(round(mass.cast("double") / col("__cm__"), 4), lit(0.0))
    }
    val dup5Mass = aggregate(
      transform(col("__d5__"), g =>
        when(cnt("__ng5__", g) >= 2, cnt("__ng5__", g) * (length(g) - lit(4)))
          .otherwise(lit(0))),
      lit(0), (a, x) => a + x)
    val out = df
      .withColumn("__w__", expr(s"filter(split($textCol, ' '), x -> x <> '')"))
      .withColumn("__cm__",
        aggregate(col("__w__"), lit(0), (a, x) => a + length(x)).cast("double"))
      .withColumn("__ng2__", ngrams(2)).withColumn("__d2__", array_distinct(col("__ng2__")))
      .withColumn("__ng3__", ngrams(3)).withColumn("__d3__", array_distinct(col("__ng3__")))
      .withColumn("__ng4__", ngrams(4)).withColumn("__d4__", array_distinct(col("__ng4__")))
      .withColumn("__ng5__", ngrams(5)).withColumn("__d5__", array_distinct(col("__ng5__")))
      .withColumn("__t2__", topc(2))
      .withColumn("__t3__", topc(3))
      .withColumn("__t4__", topc(4))
      .withColumn("top2_char_frac", topFrac(2))
      .withColumn("top3_char_frac", topFrac(3))
      .withColumn("top4_char_frac", topFrac(4))
      .withColumn("dup5_char_frac",
        when(col("__cm__") > 0,
          round(least(dup5Mass.cast("double") / col("__cm__"), lit(1.0)), 4))
          .otherwise(lit(0.0)))
    out
      .withColumn("rep_pass",
        (col("top2_char_frac") <= maxTop2 && col("top3_char_frac") <= maxTop3 &&
          col("top4_char_frac") <= maxTop4 && col("dup5_char_frac") <= maxDup5)
          .cast("int"))
      .drop("__w__", "__cm__", "__ng2__", "__ng3__", "__ng4__", "__ng5__",
        "__d2__", "__d3__", "__d4__", "__d5__", "__t2__", "__t3__", "__t4__")
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
