package graft.operators.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators over a document table (builder-prompt north
  * star: language-ID, quality scoring, token counting — quality/tokens live
  * in [[graft.queries.Pipeline]] p4–p6; this adds the lang-ID heuristic).
  */
object TextAnalysis {

  /** Stopword profiles for the n-gram/stopword language heuristic. Kept
    * deliberately small and DuckDB-mirrorable — the CORRECTNESS oracle
    * computes the same counts in SQL; swap in real profiles (or fastText)
    * for production use.
    */
  val profiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "en" -> Seq("the", "a", "and", "of", "to"),
    "es" -> Seq("el", "los", "y", "que", "es"),
    "fr" -> Seq("le", "la", "et", "les", "est"))

  private def score(textCol: String, words: Seq[String]): Column = {
    val set = words.map(w => s"'$w'").mkString(", ")
    size(expr(s"filter(split(lower($textCol), ' '), w -> w IN ($set))"))
  }

  /** DuckDB SQL computing the SAME lang-id heuristic over `documents`,
    * used by BOTH oracle entries (p14, s13) so heuristic changes cannot
    * diverge between them. `extraCols` are carried through the subquery.
    */
  def duckdbLangPredSubquery(extraCols: Seq[String]): String = {
    val prefix = extraCols.map(_ + ", ").mkString
    val scores = profiles.map { case (lang, ws) =>
      val set = ws.map(w => s"'$w'").mkString(", ")
      s"CAST(LEN(LIST_FILTER(STRING_SPLIT(LOWER(text), ' '), w -> w IN ($set))) AS INT) AS s_$lang"
    }.mkString(",\n ")
    val m = profiles.map { case (l, _) => s"s_$l" }.mkString("GREATEST(", ", ", ")")
    val cases = profiles.map { case (l, _) => s"WHEN s_$l = m AND m > 0 THEN '$l'" }.mkString(" ")
    s"""SELECT ${prefix}CASE $cases ELSE 'unknown' END AS lang_pred
       |FROM (SELECT $m AS m, t.* FROM (SELECT ${prefix}
       | $scores
       |FROM documents) t)""".stripMargin
  }

  /** Repeated n-gram stats per document — the Gopher/C4-style degenerate-
    * text signal (boilerplate, keyword stuffing, decoding loops repeat
    * n-grams; natural prose rarely does). Appends:
    *  - `n_ngrams`: total word n-grams (`max(words − n + 1, 0)`),
    *  - `n_distinct_ngrams`: distinct n-grams (native
    *    [[graft.functions.WordShingles]] expression — the same corpus-wide
    *    hot loop the dedup family shares),
    *  - `dup_ngram_ratio`: `1 − distinct/total` rounded to 4 places (0.0
    *    when the doc has no n-gram),
    *  - `is_repetitive`: `dup_ngram_ratio > maxRatio`.
    * Pure per-row Catalyst expressions — no shuffle, no UDF: this filter
    * runs at full scan speed on 100 TB.
    */
  def repetitionStats(df: DataFrame, textCol: String, n: Int = 3,
                      maxRatio: Double = 0.2): DataFrame = {
    val quoted = "`" + textCol.replace("`", "``") + "`"
    df.withColumn("n_ngrams",
        greatest(size(split(col(textCol), " ")) - (n - 1), lit(0)).cast("long"))
      .withColumn("n_distinct_ngrams",
        size(expr(s"word_shingles($quoted, $n)")).cast("long"))
      .withColumn("dup_ngram_ratio",
        when(col("n_ngrams") > 0,
          round(lit(1.0) - col("n_distinct_ngrams").cast("double") / col("n_ngrams"), 4))
          .otherwise(lit(0.0)))
      .withColumn("is_repetitive", col("dup_ngram_ratio") > maxRatio)
  }

  /** Per-document word-distribution Shannon entropy — the lexical-
    * diversity signal type-token ratio (p5) misses: "ab ab ab …" has
    * TTR→0 but so does fluent prose at length, while entropy separates
    * them (H = 1 bit vs ≈ log V). Standard gibberish/degenerate-text
    * detector alongside the Gopher/C4 batteries.
    *
    * H = ln N − (Σ c·ln c)/N over per-doc word counts — ONE corpus
    * explode into a (doc, word) count shuffle (map-side combine), one
    * doc-key agg; both shuffles bounded, no driver state. `norm_entropy`
    * divides by ln(n_types) (∈ [0,1], 1 = uniform over the doc's
    * vocabulary; 0 when the doc has a single type). Entropies in nats,
    * 4 dp (fp-associativity ~1e-12, far below the grain — the UnigramLm
    * convention). Token-less documents are dropped (no distribution).
    */
  def wordEntropy(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val counts = df
      .select(col(idCol), explode(split(col(textCol), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col(idCol), col("word")).agg(count(lit(1)).as("c"))
    counts.groupBy(col(idCol))
      .agg(sum("c").as("n_tokens"), count(lit(1)).as("n_types"),
        (log(sum("c").cast("double")) -
          sum(col("c").cast("double") * log(col("c").cast("double"))) /
            sum("c").cast("double")).as("__h__"))
      .select(col(idCol), col("n_tokens"), col("n_types"),
        round(col("__h__"), 4).as("entropy"),
        round(when(col("n_types") > 1,
          col("__h__") / log(col("n_types").cast("double")))
          .otherwise(lit(0.0)), 4).as("norm_entropy"))
  }

  /** Predicted language by max stopword-profile hits; ties break by profile
    * order (alphabetical); all-zero → 'unknown'. Pure per-row Catalyst
    * expressions — no UDF, no shuffle, codegen-friendly.
    */
  def withLangId(df: DataFrame, textCol: String, outCol: String = "lang_pred"): DataFrame = {
    val scored = profiles.foldLeft(df) { case (d, (lang, words)) =>
      d.withColumn(s"__s_$lang", score(textCol, words))
    }
    val best = profiles.map { case (lang, _) => col(s"__s_$lang") }
      .reduce((a, b) => greatest(a, b))
    // first (alphabetical) profile achieving the max wins the tie
    val pred = profiles.reverse.foldLeft(lit("unknown")) { case (acc, (lang, _)) =>
      when(col(s"__s_$lang") === best && best > 0, lang).otherwise(acc)
    }
    scored.withColumn(outCol, pred)
      .drop(profiles.map { case (l, _) => s"__s_$l" }: _*)
  }
}
