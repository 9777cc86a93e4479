package graft.operators.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PII scrubbing for training-data pipelines: redact emails, NANP-style
  * phone numbers, and IPv4 addresses from a text column, and count what was
  * redacted (the counts feed corpus-quality dashboards and per-source
  * compliance audits).
  *
  * Scale design: pure per-row `regexp_replace` / `regexp_extract_all`
  * Catalyst expressions — no UDF, no shuffle; the scrub runs at scan speed
  * and pushes through whole-stage codegen. Patterns are deliberately kept
  * inside the regex subset that Java regex and RE2 (DuckDB) interpret
  * identically (character classes, bounded repetition, `\b`), so the
  * CORRECTNESS oracle can mirror them verbatim.
  *
  * Reference scope note: no PII operator exists in the reference; part of
  * the beyond-reference LLM-pipeline surface (builder prompt), alongside
  * [[TextAnalysis]].
  */
object PiiScrub {

  /** (pattern, replacement token, count column) per PII category. Order
    * matters: emails are scrubbed before phones/IPs so an address inside a
    * local-part is counted once, as an email.
    */
  val patterns: Seq[(String, String, String)] = Seq(
    ("""[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}""", "<EMAIL>", "n_emails"),
    ("""\b\d{3}[-. ]\d{3}[-. ]\d{4}\b""", "<PHONE>", "n_phones"),
    ("""\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b""", "<IP>", "n_ips"))

  /** Appends `outCol` (the scrubbed text) and one count column per
    * category. Counts are taken on the original text; replacements are
    * applied sequentially in [[patterns]] order.
    */
  def scrub(df: DataFrame, textCol: String, outCol: String = "text_scrubbed"): DataFrame = {
    val counted = patterns.foldLeft(df) { case (d, (pat, _, cnt)) =>
      d.withColumn(cnt, size(regexp_extract_all(col(textCol), lit(pat), lit(0))).cast("long"))
    }
    val scrubbed = patterns.foldLeft(col(textCol)) { case (c, (pat, token, _)) =>
      regexp_replace(c, lit(pat), lit(token))
    }
    counted.withColumn(outCol, scrubbed)
  }
}
