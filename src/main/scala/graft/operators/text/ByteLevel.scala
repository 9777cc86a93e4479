package graft.operators.text

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** GPT-2-style byte-level pre-tokenization (Radford 2019 §2.2 /
  * HuggingFace ByteLevel): every UTF-8 BYTE of a word maps to one
  * printable unicode char (printable bytes to themselves, the rest to
  * a contiguous block above 255), so the downstream char-level BPE
  * alphabet is CLOSED at exactly 256 symbols and NOTHING is ever
  * out-of-vocabulary — the char-level pipeline's `-1` ids for unseen
  * unicode disappear by construction. The transform is a bijection;
  * [[decode]] restores the original text.
  *
  * Integration contract: this engine's tokenizers split on spaces, so
  * the transform applies WITHIN words and the space stays the
  * delimiter (GPT-2 folds the space into the following word as `Ġ`;
  * that variant changes merge statistics but not the no-OOV property —
  * the delimiter convention here keeps every existing oracle's
  * word-split semantics intact). Pure per-row projection — no shuffle,
  * scan speed.
  *
  * reference: none (the reference has no tokenizer); published method.
  */
object ByteLevel {

  private val printable: Set[Int] =
    ((33 to 126) ++ (161 to 172) ++ (174 to 255)).toSet

  private val byteToChar: Array[Char] = {
    val arr = new Array[Char](256)
    var n = 0
    for (b <- 0 until 256) {
      if (printable(b)) arr(b) = b.toChar
      else { arr(b) = (256 + n).toChar; n += 1 }
    }
    arr
  }

  private val charToByte: Map[Char, Byte] =
    byteToChar.zipWithIndex.map { case (c, b) => c -> b.toByte }.toMap

  /** All 256 single-byte symbols — the closed base alphabet a
    * byte-level vocab must seed regardless of what the corpus shows.
    */
  def fullAlphabet: Seq[String] = byteToChar.map(_.toString).toSeq

  def encodeWord(w: String): String =
    new String(w.getBytes(UTF_8).map(b => byteToChar(b & 0xff)))

  def decode(s: String): String =
    new String(s.toCharArray.map(charToByte), UTF_8)

  /** Map `textCol` word-by-word through the byte alphabet (spaces kept
    * as delimiters). Null-safe.
    */
  def withByteText(df: DataFrame, textCol: String,
                   outCol: String): DataFrame = {
    val enc = udf { (t: String) =>
      Option(t).map(_.split(" ", -1).map(encodeWord).mkString(" "))
    }
    df.withColumn(outCol, enc(col(textCol)))
  }
}
