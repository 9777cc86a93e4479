package graft.operators.text

import java.util.regex.Pattern

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The C4 cleaning battery (Raffel et al. 2020, "Exploring the Limits of
  * Transfer Learning with a Unified Text-to-Text Transformer", §2.2) —
  * the line- and document-level rules the C4 corpus was filtered with,
  * and after Gopher (A1.1/A1.2, [[QualityRules]]) the second standard
  * named heuristic battery a crawl corpus passes through:
  *
  *  - keep only lines that END in terminal punctuation (`.`/`!`/`?`/`"`)
  *    and carry at least `minWordsPerLine` words;
  *  - drop any document whose RETAINED text has fewer than
  *    `minSentences` sentences;
  *  - drop any document containing a blocked phrase (C4 uses "lorem
  *    ipsum" and the curly brace `{` — code, not prose).
  *
  * Everything is a per-row codegen'd expression over the line array — no
  * shuffle, no UDF, scan speed at 100 TB; the per-line work is one
  * `filter` over a line-count-sized array (linear, nothing quadratic).
  * Every predicate evaluates identically in DuckDB (LIST_FILTER +
  * regexp), so the p57 oracle replays the full battery.
  *
  * No reference counterpart; beyond-reference LLM-pipeline surface per
  * the builder prompt.
  */
object C4Rules {

  /** C4's default blocked phrases: boilerplate filler and code markers.
    * Matched case-insensitively against the RAW document.
    */
  val BadPhrases: Seq[String] = Seq("lorem ipsum", "{")

  /** Appends `<textCol>_c4` (retained lines re-joined with `sep`),
    * `n_lines`, `n_kept` (both long), `n_sentences` (terminal-punctuation
    * count of the retained text, long) and `c4_pass`. All other columns
    * pass through.
    */
  def battery(df: DataFrame, textCol: String, sep: String = "\n",
              minWordsPerLine: Int = 5, minSentences: Int = 3,
              badPhrases: Seq[String] = BadPhrases,
              minParallelism: Int = 0): DataFrame = {
    val base = graft.operators.scale.Parallelism.ensure(df, minParallelism)
    val lines = split(col(textCol), Pattern.quote(sep), -1)
    // line keepers: >= minWordsPerLine whitespace words AND terminal punct
    val wordsOf = (l: Column) =>
      size(filter(split(l, " "), w => w =!= ""))
    val kept = filter(lines, l =>
      wordsOf(l) >= minWordsPerLine && trim(l).rlike("[.!?\"]$"))
    val cleanText = array_join(kept, sep)
    val lowered = lower(col(textCol))
    val hasBad = badPhrases
      .map(p => contains(lowered, lit(p.toLowerCase)))
      .reduceOption(_ || _).getOrElse(lit(false))
    base
      .withColumn("n_lines", size(lines).cast("long"))
      .withColumn(textCol + "_c4", cleanText)
      .withColumn("n_kept", size(kept).cast("long"))
      .withColumn("n_sentences",
        regexp_count(col(textCol + "_c4"), lit("[.!?]")).cast("long"))
      .withColumn("c4_pass",
        col("n_sentences") >= minSentences && !hasBad)
  }
}
