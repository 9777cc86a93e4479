package graft.operators.temporal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed z-normalized subsequence similarity search over per-key
  * time series — "find the k windows most similar to this pattern"
  * (the UCR-suite / matrix-profile query shape, re-expressed for Spark;
  * see e.g. "Time Series Similarity Search for Streaming Data in
  * Distributed Systems", EDBT 2019, for the problem setting).
  *
  * Scale design (the naive plan collects each key's full series; a single
  * 100 TB-scale series must never sit in one task):
  *
  *  1. ONE shuffle assigns dense per-key positions (`row_number` over
  *     (ts, tie)) — Spark's external sort spills, so long series order
  *     without memory pressure.
  *  2. OVERLAP-REPLICATED CHUNKING: each point lands in segment
  *     `idx / chunk`, and the first `m-1` points of a segment are ALSO
  *     replicated to the previous one, so every length-`m` window lies
  *     entirely inside exactly one (key, segment) group. Replication
  *     factor is `1 + (m-1)/chunk` — e.g. 0.2% for m=9, chunk=4096.
  *  3. One `groupBy(key, segment)` shuffle collects bounded groups
  *     (`chunk + m - 1` points — executor-sized by construction,
  *     INDEPENDENT of series length); a per-group pass slides the window
  *     locally.
  *  4. The global top-k is an `orderBy(dist).limit(k)` — planned as
  *     TakeOrderedAndProject (per-partition partial top-k + driver merge
  *     of k rows), never a full sort.
  *
  * Determinism contract (what the p60 oracle replays): window stats use
  * FRESH left-to-right sums over the m-slice (`μ = Σx/m`,
  * `σ² = Σx²/m − μ²` — the engine-portable explicit-variance convention
  * from q45), flat windows (σ² ≤ 0) z-score as the zero vector, the
  * query is z-normalized once with the same arithmetic, distances are
  * rounded to 6 dp BEFORE ranking, and ties break on (key, start). Every
  * step is the same double arithmetic in the same order in DuckDB's
  * list-comprehension replay; fp-associativity slack (~1e-15 on
  * m-element sums) sits far below the 6 dp grain.
  *
  * No reference counterpart; beyond-reference time-series surface per
  * the builder prompt (events table).
  */
object SubsequenceSearch {

  /** Top-`k` most similar length-`m` windows across all keys, where
    * `m = query.length`. Returns (keyCol, start_idx, dist) ordered by
    * (dist asc, key, start) — `dist` is the squared euclidean distance
    * between the z-normalized window and the z-normalized query.
    *
    * `tieCol` orders points with equal `tsCol` deterministically (pass
    * the event id when timestamps can collide). `chunk` bounds per-task
    * memory; results are chunk-size-invariant (spec-pinned).
    */
  def topK(df: DataFrame, keyCol: String, tsCol: String, valCol: String,
           query: Seq[Double], k: Int, tieCol: Option[String] = None,
           chunk: Int = 4096): DataFrame = {
    val m = query.length
    require(m >= 2, s"query must have at least 2 points, got $m")
    require(k > 0, s"k must be positive, got $k")
    val qn = znorm(query.toArray)
      .getOrElse(throw new IllegalArgumentException(
        "query is constant — z-normalized similarity is undefined for a flat query"))

    val slide = udf(new ((Long, Seq[Row]) => Seq[(Long, Double)]) with Serializable {
      def apply(seg: Long, pts: Seq[Row]): Seq[(Long, Double)] = {
        val sorted = pts.map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).toArray
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
        foreachWindowStart(sorted, seg, chunk, m) { (s, off) =>
          out += ((s, windowDist(sorted, off, m, qn)))
        }
        out.toSeq
      }
    })
    groupedPoints(df, keyCol, tsCol, valCol, tieCol, chunk, m)
      .select(col(keyCol),
        explode(slide(col("__seg__"), col("__pts__"))).as("__w__"))
      .select(col(keyCol), col("__w__._1").as("start_idx"),
        round(col("__w__._2"), 6).as("dist"))
      .orderBy(col("dist"), col(keyCol), col("start_idx"))
      .limit(k)
  }

  /** Every length-`m` window as a row: (keyCol, start_idx,
    * window array<double> — Z-NORMALIZED, fresh left-to-right stats).
    * Flat windows (σ² ≤ 0) are dropped — they have no direction. This is
    * the bridge from time series into the [[graft.operators.similarity]]
    * stack: cosine of z-normalized windows IS the Pearson correlation of
    * the raw windows, so window rows feed `CosineSimilarity`/`AnnTopK`/
    * LSH/IVF unchanged — motif discovery at 100 TB is "windows() → the
    * existing blocked similarity self-join", with the usual
    * matrix-profile exclusion zone (same key, |Δstart| < m) applied on
    * the pair output. Same overlap-replicated chunking and bounds as
    * [[topK]].
    */
  def windows(df: DataFrame, keyCol: String, tsCol: String, valCol: String,
              m: Int, tieCol: Option[String] = None,
              chunk: Int = 4096): DataFrame = {
    require(m >= 2, s"window length must be at least 2, got $m")
    val emit = udf(new ((Long, Seq[Row]) => Seq[(Long, Seq[Double])]) with Serializable {
      def apply(seg: Long, pts: Seq[Row]): Seq[(Long, Seq[Double])] = {
        val sorted = pts.map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).toArray
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Seq[Double])]
        foreachWindowStart(sorted, seg, chunk, m) { (s, off) =>
          znorm(Array.tabulate(m)(i => sorted(off + i)._2))
            .foreach(z => out += ((s, z.toSeq)))
        }
        out.toSeq
      }
    })
    groupedPoints(df, keyCol, tsCol, valCol, tieCol, chunk, m)
      .select(col(keyCol),
        explode(emit(col("__seg__"), col("__pts__"))).as("__w__"))
      .select(col(keyCol), col("__w__._1").as("start_idx"),
        col("__w__._2").as("window"))
  }

  /** Steps 1–3 of the scale design: per-key dense positions, overlap
    * replication, bounded (key, segment) groups — (keyCol, __seg__,
    * __pts__ array<struct<idx,v>>).
    */
  private def groupedPoints(df: DataFrame, keyCol: String, tsCol: String,
                            valCol: String, tieCol: Option[String],
                            chunk: Int, m: Int): DataFrame = {
    require(chunk >= m, s"chunk ($chunk) must be >= window length ($m)")
    val ord = col(tsCol) +: tieCol.map(col).toSeq
    val w = Window.partitionBy(col(keyCol)).orderBy(ord: _*)
    val indexed = df
      .select(col(keyCol) +: col(tsCol) +: tieCol.map(col).toSeq :+
        col(valCol).cast("double").as("__v__"): _*)
      .filter(col("__v__").isNotNull)
      .withColumn("__idx__", row_number().over(w).cast("long") - 1)
    // segment of a point, plus a copy to the previous segment for the
    // first m-1 in-segment positions (window overlap)
    val segOf = floor(col("__idx__") / chunk).cast("long")
    indexed.withColumn("__seg__", explode(
        when(pmod(col("__idx__"), lit(chunk.toLong)) <= (m - 2) && segOf > 0,
          array(segOf, segOf - 1))
          .otherwise(array(segOf))))
      .groupBy(col(keyCol), col("__seg__"))
      .agg(collect_list(struct(col("__idx__"), col("__v__"))).as("__pts__"))
  }

  /** Iterate the window starts owned by this (segment, group): starting
    * inside the segment and fully contained in the group's contiguous
    * index range.
    */
  private def foreachWindowStart(sorted: Array[(Long, Double)], seg: Long,
                                 chunk: Int, m: Int)(f: (Long, Int) => Unit): Unit = {
    val base = sorted.head._1 // == seg * chunk (idx is dense from 0)
    var s = math.max(seg * chunk, base)
    val maxStart = math.min((seg + 1) * chunk - 1, base + sorted.length - m)
    while (s <= maxStart) {
      f(s, (s - base).toInt)
      s += 1
    }
  }

  /** Fresh left-to-right z-normalization; None for a flat series. */
  private[graft] def znorm(xs: Array[Double]): Option[Array[Double]] = {
    val m = xs.length
    var sum = 0.0
    var sumsq = 0.0
    var i = 0
    while (i < m) { sum += xs(i); sumsq += xs(i) * xs(i); i += 1 }
    val mu = sum / m
    val va = sumsq / m - mu * mu
    if (va <= 0) None
    else {
      val sig = math.sqrt(va)
      Some(xs.map(x => (x - mu) / sig))
    }
  }

  /** Squared euclidean distance of the z-normalized window
    * `sorted[off..off+m)` against the pre-normalized query — fresh
    * left-to-right sums only (the oracle-parity contract); flat windows
    * z-score as the zero vector.
    */
  private def windowDist(sorted: Array[(Long, Double)], off: Int, m: Int,
                         qn: Array[Double]): Double = {
    var sum = 0.0
    var sumsq = 0.0
    var i = 0
    while (i < m) {
      val x = sorted(off + i)._2
      sum += x; sumsq += x * x; i += 1
    }
    val mu = sum / m
    val va = sumsq / m - mu * mu
    val flat = va <= 0
    val sig = if (flat) 1.0 else math.sqrt(va)
    var dist = 0.0
    i = 0
    while (i < m) {
      val z = if (flat) 0.0 else (sorted(off + i)._2 - mu) / sig
      val d = z - qn(i)
      dist += d * d
      i += 1
    }
    dist
  }
}
