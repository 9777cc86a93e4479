package graft.operators.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unicode + whitespace text normalization — the step every web-curation
  * pipeline runs BEFORE dedup/quality scoring, because the same sentence
  * crawled twice rarely byte-matches raw: one copy carries decomposed
  * accents (e + U+0301 vs é), the other stray control characters or tab
  * runs. Normalizing first is what makes exact/fingerprint dedup
  * ([[graft.operators.dedup.TextDedup]]) actually fire across crawls.
  *
  * Pipeline (all per-row codegen'd expressions — ZERO shuffle, scan
  * speed at any corpus size):
  *   1. NFC canonical composition (native [[graft.functions.NfcNormalize]],
  *      same name/semantics as DuckDB's `nfc_normalize` so oracles replay
  *      it verbatim);
  *   2. whitespace-control unification: tab/LF/CR/FF/VT → one space
  *      (BEFORE the control strip, so words separated by tabs never fuse);
  *   3. strip remaining control/format chars (`\p{Cc}\p{Cf}` — bells,
  *      zero-width joiners, BOMs, soft hyphens);
  *   4. collapse space runs, trim;
  *   5. optional lowercasing (off by default — casing is signal for
  *      quality classifiers; dedup fingerprints lower on their own).
  *
  * Regex classes are spelled explicitly (`[\t\n\r\f\x0B]`, not `\s`)
  * because Java regex and RE2 disagree on `\s` membership — the explicit
  * classes mean the DuckDB oracle replays character-for-character.
  *
  * No direct reference counterpart (the reference normalizes only inside
  * its crawler's HTML extraction); training-data-pipeline extension per
  * the builder prompt.
  */
object TextNormalize {

  /** The normalization as a Column expression, composable anywhere. */
  def normalizeCol(c: Column, lowercase: Boolean = false): Column = {
    val nfc = call_function("nfc_normalize", c)
    val ws = regexp_replace(nfc, "[\\t\\n\\r\\f\\x0B]", " ")
    val ctl = regexp_replace(ws, "[\\p{Cc}\\p{Cf}]", "")
    val collapsed = trim(regexp_replace(ctl, " {2,}", " "))
    if (lowercase) lower(collapsed) else collapsed
  }

  /** In-place normalization of `textCol` plus `n_chars_raw`/`n_chars_norm`
    * audit columns (a normalization that shrinks a corpus by 30% is a
    * crawl-quality signal worth keeping). All other columns pass through.
    */
  def normalize(df: DataFrame, textCol: String,
                lowercase: Boolean = false): DataFrame =
    df.withColumn("n_chars_raw", length(col(textCol)))
      .withColumn(textCol, normalizeCol(col(textCol), lowercase))
      .withColumn("n_chars_norm", length(col(textCol)))
}
