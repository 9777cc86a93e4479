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
             minStopHits: Int = 2, minParallelism: Int = 0): DataFrame =
    gopherImpl(graft.operators.scale.Parallelism.ensure(df, minParallelism),
      textCol, array(StopWords.map(lit): _*), minWords, maxWords,
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
                   minStopHits: Int = 2, minParallelism: Int = 0): DataFrame = {
    val probeArr = coalesce(
      element_at(typedlit(probes), col(langCol)), typedlit(defaultProbe))
    gopherImpl(graft.operators.scale.Parallelism.ensure(df, minParallelism),
      textCol, probeArr, minWords, maxWords,
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
    * Per-row expressions only — no shuffle. The n-gram counting runs in
    * the native [[graft.functions.NgramTopMass]]/[[graft.functions.NgramDupMass]]
    * expressions: ONE hash-map pass over the n-grams per row (O(n-grams),
    * linear in document length), replacing the r10 HOF formulation that
    * was O(distinct × n-grams) per row in interpreted lambdas (432 s at
    * sf0.1 for 5 000 short docs — quadratic in doc length, a scale-killer
    * on real documents). The DuckDB oracle replays the same semantics
    * relationally (UNNEST n-grams → GROUP BY → max/sum), so portability is
    * by construction, not by mirroring the Spark plan.
    */
  def repetition(df: DataFrame, textCol: String,
                 maxTop2: Double = 0.20, maxTop3: Double = 0.18,
                 maxTop4: Double = 0.16, maxDup5: Double = 0.15,
                 minParallelism: Int = 0): DataFrame = {
    val in = graft.operators.scale.Parallelism.ensure(df, minParallelism)
    // NOTE (r11 measured): fusing the four calls into one struct-returning
    // battery expression is NOT faster — the per-gram key building
    // dominates, the array prep each call repeats is minor, and the
    // struct adds boxing (like-for-like micro-bench: fused 0.33 s vs
    // four-call 0.31 s on 2000×1000-word docs). Four scalar calls stay.
    def topFrac(n: Int): Column =
      when(col("__cm__") > 0,
        round(call_function("ngram_top_mass", col("__w__"), lit(n))
          .cast("double") / col("__cm__"), 4))
        .otherwise(lit(0.0))
    val out = in
      .withColumn("__w__", expr(s"filter(split($textCol, ' '), x -> x <> '')"))
      .withColumn("__cm__",
        aggregate(col("__w__"), lit(0), (a, x) => a + length(x)).cast("double"))
      .withColumn("top2_char_frac", topFrac(2))
      .withColumn("top3_char_frac", topFrac(3))
      .withColumn("top4_char_frac", topFrac(4))
      .withColumn("dup5_char_frac",
        when(col("__cm__") > 0,
          round(least(call_function("ngram_dup_mass", col("__w__"), lit(5))
            .cast("double") / col("__cm__"), lit(1.0)), 4))
          .otherwise(lit(0.0)))
    out
      .withColumn("rep_pass",
        (col("top2_char_frac") <= maxTop2 && col("top3_char_frac") <= maxTop3 &&
          col("top4_char_frac") <= maxTop4 && col("dup5_char_frac") <= maxDup5)
          .cast("int"))
      .drop("__w__", "__cm__")
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

  /** Blocklist screen — the Dolma/C4 banned-term rule: score every doc by
    * its blocklisted-token mass and flag above a fraction threshold. The
    * list is a TABLE (curation teams maintain thousands of terms and ship
    * updates without code), so scoring is explode → inner equi-join on
    * the term → per-doc re-aggregation: the join drops every clean token
    * BEFORE the shuffle, so the doc-keyed aggregation moves only the HIT
    * tokens — at 100 TB that is a shuffle proportional to violations, not
    * corpus, and the blocklist side broadcasts. Tokens lowercase and
    * strip edge punctuation before matching ("Spark," hits "spark");
    * hit_frac rounds to 6 dp before the flag comparison so pass/fail is
    * identical cross-engine.
    *
    * @return df + (n_tokens, n_hits, n_terms distinct matched,
    *         hit_frac, blocked)
    */
  def blocklist(df: DataFrame, idCol: String, textCol: String,
                terms: DataFrame, termCol: String,
                maxFrac: Double = 0.05): DataFrame = {
    require(maxFrac >= 0.0, "maxFrac must be >= 0")
    val toks = df.select(col(idCol).as("__bid__"),
        explode(expr(s"filter(transform(split(lower($textCol), ' '), " +
          "w -> regexp_replace(w, '^[^a-z0-9]+|[^a-z0-9]+$', '')), " +
          "w -> w != '')")).as("__tok__"))
    val nTok = toks.groupBy(col("__bid__")).agg(count(lit(1)).as("n_tokens"))
    val bl = terms.select(lower(col(termCol)).as("__tok__")).distinct()
    val hits = toks.join(broadcast(bl), "__tok__")
      .groupBy(col("__bid__"))
      .agg(count(lit(1)).as("n_hits"),
        countDistinct(col("__tok__")).as("n_terms"))
    df.join(nTok.withColumnRenamed("__bid__", idCol), Seq(idCol), "left")
      .join(hits.withColumnRenamed("__bid__", idCol), Seq(idCol), "left")
      .withColumn("n_tokens", coalesce(col("n_tokens"), lit(0L)))
      .withColumn("n_hits", coalesce(col("n_hits"), lit(0L)))
      .withColumn("n_terms", coalesce(col("n_terms"), lit(0L)))
      .withColumn("hit_frac", when(col("n_tokens") === 0, lit(0.0))
        .otherwise(round(col("n_hits").cast("double") / col("n_tokens"), 6)))
      .withColumn("blocked", col("hit_frac") > maxFrac)
  }
}
