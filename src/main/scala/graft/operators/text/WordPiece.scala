package graft.operators.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** WordPiece greedy longest-match-first encoding (Wu et al. 2016 §4.1 —
  * the BERT tokenizer's apply stage), against an explicit vocabulary of
  * word-initial pieces and `##`-marked continuation pieces.
  *
  * Semantics: each whitespace word is consumed left to right; at every
  * position the LONGEST vocabulary piece matching the remaining suffix
  * is taken (word-initial pieces at position 0, `##`-continuations
  * after); if no piece matches, the ENTIRE word encodes as the single
  * `unk` token (the standard all-or-nothing WordPiece rule — partial
  * encodings are discarded). This greedy algorithm is deliberately NOT
  * BPE's merge-rank order or Unigram's Viterbi: all three tokenizer
  * families are distinct operators with distinct oracle replays.
  *
  * Scale shape: the vocabulary rides the closure (model state, like
  * [[BpeCodec]]) — no shuffle, scan speed, per-executor word memo so a
  * Zipf-distributed corpus pays the greedy loop once per DISTINCT word
  * per task, not per token. Completes the tokenizer-family triad next
  * to [[BpeTrain]] (merge-rank) and [[UnigramTokenizer]] (Viterbi).
  */
object WordPiece {

  /** Flattened piece sequence for each row's `textCol` (words already
    * whitespace-delimited; clean/normalize upstream). Adds `outCol`
    * (array&lt;string&gt;) plus `n_unk` (long) — words that failed to
    * encode. Null text → null columns.
    */
  def withWordPieces(df: DataFrame, textCol: String, vocab: Seq[String],
                     unk: String = "[UNK]",
                     outCol: String = "wp_pieces"): DataFrame = {
    val enc = new WordPieceEncoder(vocab, unk)
    val encodeUdf = udf { (text: String) =>
      Option(text).map { t =>
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        for (w <- t.split(" ") if w.nonEmpty) out ++= enc.encodeWord(w)
        out.toSeq
      }
    }
    df.withColumn(outCol, encodeUdf(col(textCol)))
      .withColumn("n_unk",
        when(col(outCol).isNull, lit(null))
          .otherwise(size(filter(col(outCol), _ === unk)).cast("long")))
  }
}

/** Serializable greedy encoder; `vocab` continuations carry the `##`
  * prefix. Memo mirrors [[BpeCodec]]'s (bounded, per-executor-task).
  */
class WordPieceEncoder(vocab: Seq[String], unk: String) extends Serializable {
  private val initial: Set[String] = vocab.filterNot(_.startsWith("##")).toSet
  private val cont: Set[String] = vocab.filter(_.startsWith("##"))
    .map(_.substring(2)).toSet
  private val maxInit = if (initial.isEmpty) 0 else initial.map(_.length).max
  private val maxCont = if (cont.isEmpty) 0 else cont.map(_.length).max

  @transient private lazy val memo =
    new java.util.HashMap[String, Array[String]]()
  private val memoCap = 1 << 16

  def encodeWord(w: String): Array[String] = {
    val hit = memo.get(w)
    if (hit != null) return hit
    val r = encodeUncached(w)
    if (memo.size < memoCap) memo.put(w, r)
    r
  }

  private def encodeUncached(w: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < w.length) {
      val first = i == 0
      val (set, cap) = if (first) (initial, maxInit) else (cont, maxCont)
      var j = math.min(w.length, i + cap)
      var end = -1
      while (j > i && end < 0) {
        if (set.contains(w.substring(i, j))) end = j else j -= 1
      }
      if (end < 0) return Array(unk)
      out += (if (first) w.substring(i, end) else "##" + w.substring(i, end))
      i = end
    }
    out.toArray
  }
}
