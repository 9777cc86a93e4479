package graft.operators.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic sparse random projection (Achlioptas 2003: ±1 sign
  * matrix / √k satisfies the Johnson-Lindenstrauss guarantee with the
  * same distortion bounds as Gaussian R, at integer-weight cost) — the
  * dimensionality-reduction rung the embedding toolkit was missing:
  * int8 / PQ / 1-bit quantize VALUES, matryoshka truncation assumes a
  * nested-trained model; RP shrinks ANY embedding's dimension with a
  * distance guarantee, e.g. 64→16 before an ANN index whose memory is
  * dim-bound.
  *
  * Determinism: R is a pure function of (seed, j, i) — the sign is the
  * parity of the first hex digit of md5("rp:seed:j:i"), the house
  * portable-hash recipe (CorpusMix/ImportanceSelect), so both engines
  * materialize the IDENTICAL matrix and the p113 oracle replays the
  * whole projection. Each output coordinate is one codegen'd `arr_dot`
  * against a literal sign row (k dots per row, whole-stage, zero
  * shuffle at any corpus size); the dot's ascending-index loop order is
  * what the oracle's list_reduce fold replays, so values match bit-for-
  * bit before the 6-dp round.
  *
  * No reference counterpart; similarity-stack extension per the builder
  * prompt.
  */
object RandomProjection {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** The ±1 sign matrix rows (outDim × inDim), derivable in any engine. */
  def signMatrix(inDim: Int, outDim: Int, seed: Long): Seq[Seq[Double]] =
    (0 until outDim).map { j =>
      (0 until inDim).map { i =>
        val h = md5hex(s"rp:$seed:$j:$i")
        if (Character.digit(h.charAt(0), 16) % 2 == 0) 1.0 else -1.0
      }
    }

  /** Appends `outCol` = (R·v)/√k rounded to 6 dp, R the seeded ±1
    * matrix. Vectors shorter than `inDim` project to NULL rather than a
    * silent prefix (the SignHash lesson); longer ones ignore the tail —
    * that boundary is `inDim`, stated, not inferred.
    */
  def project(df: DataFrame, vecCol: String, outCol: String,
              inDim: Int, outDim: Int, seed: Long): DataFrame = {
    require(inDim >= 1 && outDim >= 1, "dims must be >= 1")
    val rows = signMatrix(inDim, outDim, seed)
    val v = col(vecCol).cast("array<double>")
    val scale = math.sqrt(outDim.toDouble)
    val coords = rows.map { r =>
      round(call_function("arr_dot", v, typedlit(r)) / lit(scale), 6)
    }
    df.withColumn(outCol,
      when(size(v) >= inDim, array(coords: _*)))
  }
}
