package graft.operators.temporal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Holt's linear-trend (double exponential) smoothing, distributed as
  * a 2×2-MATRIX SEGMENTED SCAN — the same carry trick as [[Ewma]],
  * one dimension up: with state s = (level, trend),
  *
  *   l_t = α·x_t + (1−α)·(l_{t−1} + b_{t−1})
  *   b_t = β·(l_t − l_{t−1}) + (1−β)·b_{t−1}     (l_1 = x_1, b_1 = 0)
  *
  * is affine, s_t = A·s_{t−1} + c·x_t with constant
  * A = [[1−α, 1−α], [−αβ, 1−αβ]]. Each chunk scans against a zero
  * carry, tracking its zero-carry trajectory (l̂, b̂) by the NATURAL
  * recurrence and the accumulated matrix P = Aᵏ by repeated
  * multiplication (never `pow`); the true state patches in as
  * s = ŝ + P·carry, and the carry entering chunk c folds from chunk
  * summaries exactly as in EWMA, now 2-dimensional.
  *
  * Determinism: unlike the EWMA/dyadic case, A's powers grow mantissa
  * bits (e.g. 0.875ᵏ), so the chunked result differs from the purely
  * sequential recurrence in the last ulps — the CONTRACT is therefore
  * the two-phase operation sequence itself, which is fixed by
  * (key, pos, chunk) and hence bit-identical under any partitioning
  * and any executor count; the DuckDB oracle replays that exact
  * algebra (within-chunk recursion + carry recursion + patch), and a
  * spec pins 1e-9 closeness to the sequential reference.
  *
  * Scale shape: identical to [[Ewma]] — one key-window sort, one
  * chunk-bounded aggregation, a #chunks-per-key fold, one co-keyed
  * join back.
  *
  * No reference counterpart; builder-prompt time-series extension.
  */
object Holt {

  /** Output: key, t, x, l (level), b (trend), f1 = l + b (one-step
    * forecast). `tCol` must order rows uniquely per key.
    */
  def smooth(df: DataFrame, keyCol: String, tCol: String, valCol: String,
             alpha: Double, beta: Double, chunk: Int = 4096): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0,1], got $alpha")
    require(beta >= 0 && beta <= 1, s"beta must be in [0,1], got $beta")
    require(chunk >= 2, s"chunk must be >= 2, got $chunk")
    val (a11, a12) = (1 - alpha, 1 - alpha)
    val (a21, a22) = (-(alpha * beta), 1 - alpha * beta)
    val base = df.select(col(keyCol).as("k"), col(tCol).as("t"),
      col(valCol).cast("double").as("x"))
    val idx = base.withColumn("idx",
        row_number().over(Window.partitionBy(col("k")).orderBy(col("t"))) - 1)
      .withColumn("cid", expr(s"idx div $chunk"))
      .withColumn("pos", expr(s"idx % $chunk"))
    val localScan = udf { (xs: Seq[Double], firstChunk: Boolean) =>
      val n = xs.length
      val lh = new Array[Double](n); val bh = new Array[Double](n)
      val ps = Array.fill(4)(new Array[Double](n))
      var l = 0.0; var b = 0.0
      var p11 = 1.0; var p12 = 0.0; var p21 = 0.0; var p22 = 1.0
      var i = 0
      while (i < n) {
        if (firstChunk && i == 0) {
          l = xs(0); b = 0.0; p11 = 0.0; p12 = 0.0; p21 = 0.0; p22 = 0.0
        } else {
          val lNew = alpha * xs(i) + (1 - alpha) * (l + b)
          val bNew = beta * (lNew - l) + (1 - beta) * b
          l = lNew; b = bNew
          val q11 = a11 * p11 + a12 * p21; val q12 = a11 * p12 + a12 * p22
          val q21 = a21 * p11 + a22 * p21; val q22 = a21 * p12 + a22 * p22
          p11 = q11; p12 = q12; p21 = q21; p22 = q22
        }
        lh(i) = l; bh(i) = b
        ps(0)(i) = p11; ps(1)(i) = p12; ps(2)(i) = p21; ps(3)(i) = p22
        i += 1
      }
      (lh.toSeq, bh.toSeq, ps(0).toSeq, ps(1).toSeq, ps(2).toSeq, ps(3).toSeq)
    }
    val chunks = idx.groupBy(col("k"), col("cid"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("x")))),
        e => e.getField("x")).as("xs"))
      .withColumn("la", localScan(col("xs"), col("cid") === 0))
    val carryFold = udf { (ends: Seq[org.apache.spark.sql.Row]) =>
      val sorted = ends.sortBy(_.getLong(0))
      var cl = 0.0; var cb = 0.0
      sorted.map { r =>
        val out = (r.getLong(0), cl, cb)
        val nl = r.getDouble(1) + r.getDouble(3) * cl + r.getDouble(4) * cb
        val nb = r.getDouble(2) + r.getDouble(5) * cl + r.getDouble(6) * cb
        cl = nl; cb = nb
        out
      }
    }
    val carries = chunks
      .select(col("k"), struct(col("cid").cast("long").as("cid"),
        element_at(col("la._1"), -1).as("lend"),
        element_at(col("la._2"), -1).as("bend"),
        element_at(col("la._3"), -1).as("p11"),
        element_at(col("la._4"), -1).as("p12"),
        element_at(col("la._5"), -1).as("p21"),
        element_at(col("la._6"), -1).as("p22")).as("summary"))
      .groupBy(col("k")).agg(collect_list(col("summary")).as("summaries"))
      .select(col("k"), explode(carryFold(col("summaries"))).as("cc"))
      .select(col("k"), col("cc._1").as("cid"),
        col("cc._2").as("cl"), col("cc._3").as("cb"))
    val perRow = chunks
      .select(col("k"), col("cid").cast("long").as("cid"),
        posexplode(arrays_zip(col("la._1").as("lh"), col("la._2").as("bh"),
          col("la._3").as("p11"), col("la._4").as("p12"),
          col("la._5").as("p21"), col("la._6").as("p22")))
          .as(Seq("pos", "v")))
      .select(col("k"), col("cid"), col("pos"), col("v.*"))
    idx.withColumn("cid", col("cid").cast("long"))
      .join(perRow, Seq("k", "cid", "pos"))
      .join(carries, Seq("k", "cid"))
      .select(col("k"), col("t"), col("x"),
        (col("lh") + col("p11") * col("cl") + col("p12") * col("cb")).as("l"),
        (col("bh") + col("p21") * col("cl") + col("p22") * col("cb")).as("b"))
      .withColumn("f1", col("l") + col("b"))
  }
}
