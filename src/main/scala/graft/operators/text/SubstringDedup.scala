package graft.operators.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact substring deduplication — remove long token spans that occur more
  * than once ANYWHERE in the corpus, keeping only the first occurrence
  * (the "exact substring dedup" of the training-data literature: repeated
  * boilerplate, licenses, navigation chrome, quoted passages — duplication
  * that whole-document and paragraph dedup both miss because it lives
  * INSIDE otherwise-distinct documents).
  *
  * Method: every document position starts a k-token window (stride 1 —
  * stride sampling would miss misaligned repeats); windows are keyed by
  * the md5 of their token text (128-bit — collision odds are negligible
  * at any corpus size, and the window CONTENT never rides the shuffle,
  * only the 16-byte key). A window is duplicated when its key occurs ≥2
  * times corpus-wide; the canonical occurrence is the (id, pos)-minimum
  * and every other occurrence is a duplicate. Duplicate windows merge
  * per document into maximal token spans [start, end), and removal
  * rebuilds the text without the spanned tokens (space-joined — the
  * token stream, not the byte stream, is what a tokenizer consumes, same
  * convention as [[DocChunk.chunkByTokens]]).
  *
  * Scale shape: window hashing is per-row codegen HOFs (no UDF); the
  * only corpus-wide shuffles are a map-side-combinable groupBy on the
  * window key (min + count — a window repeated 10^8 times combines per
  * partition, never buffers in one task, which is why canonical
  * selection is an AGGREGATE and not a window function) and the
  * key-equi join back. Span merging is a per-document window — bounded
  * by document length, partitioned by id, never global. Output tokens
  * per doc only ever shrink.
  *
  * No reference counterpart; builder-prompt north-star extension —
  * method per Lee et al. 2022 ("Deduplicating Training Data Makes
  * Language Models Better"), re-expressed as hashed stride-1 windows
  * instead of a suffix array (a suffix array is not a distributed
  * structure; the hashed formulation finds every duplicated span of
  * length ≥ k and trims partial-window tails at span edges).
  */
object SubstringDedup {

  private def words(textCol: String): Column =
    filter(split(col(textCol), "\\s+"), w => length(w) > 0)

  /** (id, pos, window-key) for every k-window start; docs shorter than k
    * contribute nothing (and can therefore never be span-trimmed). The
    * hashing runs in the native one-pass
    * [[graft.functions.WordWindowHashes]] expression — one md5 per
    * position without a slice array + joined string + HOF tree walk per
    * window (this is the operator's corpus-wide hot loop).
    */
  private def positions(df: DataFrame, idCol: String, textCol: String,
                        k: Int): DataFrame = {
    // posexplode of an empty/null window array emits no rows, which is
    // exactly the short-doc/null-text contract — no separate filter
    val wins = call_function("word_window_hashes", col(textCol), lit(k))
    df.select(col(idCol), posexplode(wins).as(Seq("pos", "wh")))
  }

  /** Maximal duplicated token spans per document: `(id, span_start,
    * span_end)` half-open token ranges covering every NON-canonical
    * occurrence of a duplicated k-window. A window's first occurrence
    * (minimum (id, pos) across the corpus) never starts a span itself,
    * so one copy of each duplicated run survives — though a span from a
    * DIFFERENT overlapping duplicated window may still trim through it
    * (the same boundary behavior as the suffix-array formulation, which
    * also cuts every duplicated byte range it finds).
    */
  def duplicateSpans(df: DataFrame, idCol: String, textCol: String,
                     k: Int): DataFrame = {
    require(k > 0, "window length k must be positive")
    val pos = positions(df, idCol, textCol, k)
    // canonical occurrence per duplicated key — aggregate, not window:
    // map-side combinable under hot-window skew
    val canon = pos.groupBy("wh")
      .agg(min(struct(col(idCol).as("cid"), col("pos").as("cpos"))).as("canon"),
        count(lit(1)).as("cnt"))
      .filter(col("cnt") > 1)
      .select(col("wh"), col("canon.cid").as("cid"), col("canon.cpos").as("cpos"))
    val dups = pos.join(canon, "wh")
      .filter(!(col(idCol) === col("cid") && col("pos") === col("cpos")))
      .select(col(idCol), col("pos"))
    // merge overlapping/adjacent windows into maximal spans (classic
    // islands: a new island starts where pos exceeds the running max end
    // of every earlier window in this doc)
    val byDoc = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    val runEnd = max(col("pos") + k)
      .over(byDoc.rowsBetween(Window.unboundedPreceding, -1))
    dups
      .withColumn("__new__",
        when(col("pos") > coalesce(runEnd, lit(-1L)), 1).otherwise(0))
      .withColumn("__island__", sum(col("__new__")).over(byDoc))
      .groupBy(col(idCol), col("__island__"))
      .agg(min(col("pos")).as("span_start"), (max(col("pos")) + k).as("span_end"))
      .drop("__island__")
  }

  /** Rebuild `textCol` without the duplicated spans (space-joined token
    * stream); adds `n_dup_spans` with the number of spans removed (0 for
    * untouched documents). Null-text rows pass through unchanged.
    */
  def removeSpans(df: DataFrame, idCol: String, textCol: String,
                  k: Int): DataFrame = {
    val spans = duplicateSpans(df, idCol, textCol, k)
      .groupBy(col(idCol).as("__sid__"))
      .agg(collect_list(struct(col("span_start"), col("span_end"))).as("__spans__"))
    val ws = words(textCol)
    val joined = df.join(spans, col(idCol) === col("__sid__"), "left")
    val kept = filter(ws, (w, i) =>
      !exists(col("__spans__"),
        s => i >= s.getField("span_start") && i < s.getField("span_end")))
    joined
      .withColumn("n_dup_spans",
        coalesce(size(col("__spans__")), lit(0)))
      .withColumn(textCol,
        when(col("__spans__").isNull || col(textCol).isNull, col(textCol))
          .otherwise(array_join(kept, " ")))
      .drop("__sid__", "__spans__")
  }
}
