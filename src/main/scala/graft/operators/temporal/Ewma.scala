package graft.operators.temporal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed exponential smoothing (EWMA / simple exponential
  * smoothing, s₁ = x₁, sₜ = α·xₜ + (1−α)·sₜ₋₁) as a SEGMENTED SCAN —
  * the classic "inherently sequential" recurrence parallelized the way
  * a 100 TB engine must: a linear recurrence composes, so each chunk
  * can be scanned independently against a zero carry and patched with
  * one multiply-add once the carry arrives.
  *
  * Phase algebra: within a chunk, Lₚ = α·xₚ + β·Lₚ₋₁ (L₋₁ = 0) and
  * Aₚ = β·Aₚ₋₁ (A₋₁ = 1, β = 1−α), except the global first row which
  * initializes L = x, A = 0. Then sₚ = Lₚ + Aₚ·carry, where the carry
  * entering chunk c is s at the end of chunk c−1 — a #chunks-per-key
  * recurrence folded from chunk summaries (bounded driver-free state:
  * the fold runs inside a per-key UDF over a #chunks-sized array).
  *
  * Determinism: the result is a SPECIFIC IEEE operation sequence —
  * in-chunk multiply-adds in position order, A by repeated
  * multiplication (never `pow`, whose libm varies), then one final
  * multiply-add per row. The DuckDB oracle replays exactly this
  * two-phase algebra (recursive CTE per chunk + recursive carry fold),
  * so values match bit for bit — which is also the reproducibility
  * story at scale: unlike a float aggregation, re-running on different
  * partitionings gives identical output because the op order is fixed
  * by (key, pos), not by shuffle arrival.
  *
  * Scale shape: one key-window sort (the inherent cost of ordering a
  * series), one (key, chunk) aggregation with chunk-bounded arrays,
  * one #chunks-sized per-key fold, one co-keyed join back. A 10⁹-row
  * key costs 10⁹/chunk parallel chunk scans plus a 10⁹/chunk-length
  * sequential fold — versus a fully sequential single-task scan in the
  * naive formulation.
  *
  * No reference counterpart; builder-prompt time-series extension.
  */
object Ewma {

  /** Adds `s` (the smoothed value) to (keyCol, tCol, valCol) rows.
    * `tCol` must order rows uniquely within a key (pass a pre-built
    * tie-broken index otherwise). Output: key, t, x, s.
    */
  def smooth(df: DataFrame, keyCol: String, tCol: String, valCol: String,
             alpha: Double, chunk: Int = 4096): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0,1], got $alpha")
    require(chunk >= 2, s"chunk must be >= 2, got $chunk")
    val beta = 1.0 - alpha
    val base = df.select(col(keyCol).as("k"), col(tCol).as("t"),
      col(valCol).cast("double").as("x"))
    val idx = base.withColumn("idx",
        row_number().over(Window.partitionBy(col("k")).orderBy(col("t"))) - 1)
      .withColumn("cid", expr(s"idx div $chunk"))
      .withColumn("pos", expr(s"idx % $chunk"))
    // chunk-local scan: xs in position order -> (L, A) arrays
    val localScan = udf { (xs: Seq[Double], firstChunk: Boolean) =>
      val n = xs.length
      val ls = new Array[Double](n); val as = new Array[Double](n)
      var l = 0.0; var a = 1.0
      var i = 0
      while (i < n) {
        if (firstChunk && i == 0) { l = xs(0); a = 0.0 }
        else { l = alpha * xs(i) + beta * l; a = beta * a }
        ls(i) = l; as(i) = a
        i += 1
      }
      (ls.toSeq, as.toSeq)
    }
    val chunks = idx.groupBy(col("k"), col("cid"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("x")))),
        e => e.getField("x")).as("xs"))
      .withColumn("la", localScan(col("xs"), col("cid") === 0))
    // per-key carry fold over #chunks-sized summaries
    val carryFold = udf { (ends: Seq[Row]) =>
      val sorted = ends.sortBy(_.getLong(0))
      var carry = 0.0
      sorted.map { r =>
        val out = (r.getLong(0), carry)
        carry = r.getDouble(1) + r.getDouble(2) * carry
        out
      }
    }
    val carries = chunks
      .select(col("k"), struct(col("cid").cast("long").as("cid"),
        element_at(col("la._1"), -1).as("lend"),
        element_at(col("la._2"), -1).as("aend")).as("summary"))
      .groupBy(col("k")).agg(collect_list(col("summary")).as("summaries"))
      .select(col("k"), explode(carryFold(col("summaries"))).as("cc"))
      .select(col("k"), col("cc._1").as("cid"), col("cc._2").as("carry"))
    val perRow = chunks
      .select(col("k"), col("cid").cast("long").as("cid"),
        posexplode(arrays_zip(col("la._1").as("l"), col("la._2").as("a")))
          .as(Seq("pos", "la1")))
      .select(col("k"), col("cid"), col("pos"),
        col("la1.l").as("l"), col("la1.a").as("a"))
    idx.withColumn("cid", col("cid").cast("long"))
      .join(perRow, Seq("k", "cid", "pos"))
      .join(carries, Seq("k", "cid"))
      .select(col("k"), col("t"), col("x"),
        (col("l") + col("a") * col("carry")).as("s"))
  }

  private type Row = org.apache.spark.sql.Row
}
