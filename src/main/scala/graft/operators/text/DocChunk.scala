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

  /** Sentence-boundary chunking — the RAG-prep mode: sentences never
    * split mid-way (a retrieval chunk that starts mid-sentence embeds
    * noise), grouped into chunks of ~`targetChars` by LENGTH-QUANTIZED
    * assignment: sentence s joins chunk `floor(charsBefore(s) /
    * targetChars)` where charsBefore counts prior sentences + joining
    * spaces. That rule is deterministic and ORDER-FREE (each sentence's
    * chunk depends only on its prefix length, not on greedy fill state),
    * which is what makes it exactly replayable in SQL and stable under
    * any partitioning; chunks end within one sentence of the target
    * rather than exactly at it — the standard trade dressed as a
    * contract, not a bug.
    *
    * Sentence segmentation is `regexp_extract_all` on `[^.!?]+[.!?]*`
    * (segments between terminal-punctuation runs, lookbehind-free so
    * Java regex and RE2 oracles agree), trimmed, empties dropped.
    *
    * Plan shape: extract/explode are per-row; the prefix-length window
    * and the chunk re-assembly group BOTH key on the document id, so the
    * whole mode costs ONE doc-keyed shuffle (the window's sort) at any
    * corpus size — chunk texts ride the shuffle, never whole documents.
    * Unlike the windowing modes this drops non-key passthrough columns
    * (re-join on `docIdCol` to recover them).
    */
  def chunkBySentences(df: DataFrame, docIdCol: String, textCol: String,
                       targetChars: Int, idCol: String = "chunk_id",
                       outCol: String = "chunk"): DataFrame = {
    require(targetChars > 0, "targetChars must be positive")
    import org.apache.spark.sql.expressions.Window
    val sents = filter(transform(
        regexp_extract_all(col(textCol), lit("[^.!?]+[.!?]*"), lit(0)),
        s => trim(s)), s => length(s) > 0)
    val w = Window.partitionBy(col(docIdCol)).orderBy(col("sidx"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.filter(col(textCol).isNotNull)
      .select(col(docIdCol), posexplode(sents).as(Seq("sidx", "sent")))
      .withColumn("__cume__", sum(length(col("sent")) + 1).over(w))
      // `div`, never `/` + cast: integer division is the cross-engine-
      // deterministic floor on non-negative prefixes (house recipe)
      .withColumn(idCol,
        expr(s"(__cume__ - length(sent) - 1) div $targetChars"))
      .groupBy(col(docIdCol), col(idCol))
      .agg(
        array_join(transform(array_sort(collect_list(struct(col("sidx"), col("sent")))),
          x => x.getField("sent")), " ").as(outCol),
        count(lit(1)).as("n_sentences"))
  }
}
