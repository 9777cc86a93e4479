package graft.operators.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sliding-window document chunking — the standard pre-tokenization step
  * for context-bounded training/embedding pipelines (split each document
  * into `size`-unit windows that overlap by `overlap` units).
  *
  * Scale shape: both modes are pure per-row Catalyst expressions
  * (`sequence`/`transform`/`posexplode` — all codegen'd, no UDF), so the
  * plan is scan → generate with NO shuffle and no state; output row
  * count grows ~len/stride per doc and each output row carries only the
  * chunk text, never the full document, so a 100 TB corpus chunks in one
  * embarrassingly-parallel pass. The reference has no chunking operator
  * (closest is the row-wise map in its ET framework); this is a
  * beyond-reference training-data component like SequencePack.
  *
  * Contract (both modes): windows start at 0, stride, 2·stride, … while
  * start < len, where stride = size − overlap (so every unit of the
  * document appears in at least one chunk and consecutive chunks share
  * exactly `overlap` units, except a possibly-shorter final chunk).
  * `chunk_id` is the 0-based window ordinal. Rows with null/empty text
  * produce NO chunks (explicitly filtered — a null document has no
  * trainable content). The text column is dropped from the output so the
  * full document is not duplicated once per chunk.
  *
  * No reference counterpart; builder-prompt north-star extension.
  */
object DocChunk {

  private def starts(len: Column, stride: Int): Column =
    sequence(lit(0), greatest(len - 1, lit(0)), lit(stride))

  /** Character windows: chunk k = substr(text, k·stride + 1, size). */
  def chunkByChars(df: DataFrame, textCol: String, size: Int, overlap: Int,
                   idCol: String = "chunk_id",
                   outCol: String = "chunk"): DataFrame = {
    require(size > 0, "chunk size must be positive")
    require(overlap >= 0 && overlap < size,
      s"overlap must be in [0, size), got $overlap for size $size")
    val t = col(textCol)
    val chunks = transform(starts(length(t), size - overlap),
      s => t.substr(s + 1, lit(size)))
    val keep = df.columns.filterNot(_ == textCol).map(col).toSeq
    df.filter(t.isNotNull && length(t) > 0)
      .select(keep :+ posexplode(chunks).as(Seq(idCol, outCol)): _*)
  }

  /** Whitespace-token windows: the text is trim-split on `\s+`, chunk k
    * rejoins tokens [k·stride, k·stride + size) with a single space
    * (i.e. intra-document whitespace is normalized — the token stream,
    * not the byte stream, is the unit a tokenizer consumes).
    */
  def chunkByTokens(df: DataFrame, textCol: String, size: Int, overlap: Int,
                    idCol: String = "chunk_id",
                    outCol: String = "chunk"): DataFrame = {
    require(size > 0, "chunk size must be positive")
    require(overlap >= 0 && overlap < size,
      s"overlap must be in [0, size), got $overlap for size $size")
    // split + drop empties (leading whitespace yields a "" token, and
    // Spark's trim only strips 0x20, not tabs/newlines — filter is
    // whitespace-kind-agnostic); all still per-row codegen HOFs
    val words = filter(split(col(textCol), "\\s+"),
      w => length(w) > 0)
    val chunks = transform(starts(array_size(words), size - overlap),
      s => array_join(slice(words, s + 1, lit(size)), " "))
    val keep = df.columns.filterNot(_ == textCol).map(col).toSeq
    df.filter(col(textCol).isNotNull && array_size(words) > 0)
      .select(keep :+ posexplode(chunks).as(Seq(idCol, outCol)): _*)
  }
}
