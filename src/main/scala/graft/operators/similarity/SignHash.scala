package graft.operators.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** 1-bit sign quantization + Hamming-space retrieval — the memory
  * endpoint of the quantization ladder (float32 → int8 [p18] → PQ bytes
  * [p32] → ONE BIT per dimension): a 64-dim embedding collapses to two
  * 32-bit words, a 256× cut vs float32, and candidate generation becomes
  * XOR + popcount — integer ops a scan does at memory bandwidth. The
  * standard two-stage shape (Charikar 2002 sign-random-projection without
  * the projection — embeddings are already dense and zero-centered):
  * Hamming top-`rerank` candidates, then exact cosine re-rank of that
  * bounded set, same contract as the PQ path.
  *
  * `dims` sizes the sketch: ⌈dims/32⌉ sign words `w0..w{n−1}` — ANY
  * embedding width packs fully (the pre-r15 two-word sketch silently
  * truncated dims > 64 to a prefix; ADVICE r14). Packing is per-row
  * codegen (`aggregate` over a constant 32-bit sequence — CASE-guarded
  * element access, ANSI-safe for short vectors); sign bits go into
  * 32-bits-per-BIGINT halves so neither engine touches the BIGINT sign
  * bit (a `1L << 63` OR would overflow DuckDB's HUGEINT sum replay).
  * Hamming distances are integers, so ranking is exactly reproducible —
  * ties break by id; only the final re-rank touches floats, rounded to
  * the house 6 dp.
  *
  * At 100 TB: the corpus-side signature table is 4·⌈dims/32⌉ bytes + id
  * per vector and never shuffles (queries broadcast, as [[CosineSimilarity
  * .annTopK]]); per-query cost is one popcount scan + an exact re-rank
  * of `rerank` vectors.
  *
  * No reference counterpart; builder-prompt similarity extension.
  */
object SignHash {

  /** Packed sign bits of dims [lo, lo+32) ∩ [0, dims) as a non-negative
    * BIGINT. Dimensions past `dims` (or past the vector's actual length)
    * contribute 0 — the sketch boundary is explicit, never a silent
    * prefix of a longer vector.
    */
  private def word(vecCol: String, lo: Int, dims: Int): Column = expr(
    s"""aggregate(sequence(0, 31), 0L, (acc, b) ->
       |  acc + (CASE WHEN b + $lo < least(size($vecCol), $dims)
       |    THEN CASE WHEN element_at($vecCol, b + $lo + 1) > 0D
       |      THEN shiftleft(1L, b) ELSE 0L END
       |    ELSE 0L END))""".stripMargin)

  private def nWords(dims: Int): Int = (dims + 31) / 32

  /** Adds `w0..w{⌈dims/32⌉−1}` (the 32-bit sign words) next to `vecCol`. */
  def signPack(df: DataFrame, vecCol: String, dims: Int = 64): DataFrame = {
    require(dims >= 1, s"sign sketch needs dims >= 1, got $dims")
    val v = s"CAST($vecCol AS ARRAY<DOUBLE>)"
    val packed = (0 until nWords(dims)).foldLeft(
      df.withColumn("__sv__", expr(v))) { (d, i) =>
      d.withColumn(s"w$i", word("__sv__", 32 * i, dims))
    }
    packed.drop("__sv__")
  }

  /** Two-stage search: Hamming top-`rerank` candidates per query, exact
    * cosine re-rank to top-`k`. Output: (qid, nrank, neighbor, ham, sim).
    */
  def topK(corpus: DataFrame, queries: DataFrame, idCol: String,
           vecCol: String, qIdCol: String, qVecCol: String,
           k: Int = 10, rerank: Int = 32, dims: Int = 64): DataFrame = {
    require(k > 0 && rerank >= k, "need rerank >= k > 0")
    val nw = nWords(dims)
    val c = signPack(corpus, vecCol, dims)
    val q = (0 until nw).foldLeft(signPack(queries, qVecCol, dims)) {
      (d, i) => d.withColumnRenamed(s"w$i", s"q$i")
    }
    val ham = (0 until nw)
      .map(i => s"bit_count(w$i ^ q$i)").mkString(" + ")
    val cand = c.join(broadcast(q), col(idCol) =!= col(qIdCol))
      .withColumn("ham", expr(ham).cast("int"))
      .withColumn("__hrank__", row_number().over(
        Window.partitionBy(col(qIdCol)).orderBy(col("ham"), col(idCol))))
      .filter(col("__hrank__") <= rerank)
    cand
      .withColumn("sim", round(call_function("arr_cosine",
        col(qVecCol).cast("array<double>"), col(vecCol).cast("array<double>")), 6))
      .withColumn("nrank", row_number().over(
        Window.partitionBy(col(qIdCol)).orderBy(col("sim").desc, col(idCol))))
      .filter(col("nrank") <= k)
      .select(col(qIdCol).as("qid"), col("nrank"), col(idCol).as("neighbor"),
        col("ham"), col("sim"))
  }
}
