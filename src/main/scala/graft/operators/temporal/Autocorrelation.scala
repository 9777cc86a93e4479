package graft.operators.temporal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-key autocorrelation function over an integer time index — the
  * periodicity detector ("is this series daily? weekly?"): Pearson
  * correlation between the series and itself shifted by each lag in
  * [1, maxLag], computed over the overlapping pairs.
  *
  * Scale shape: ONE equi-join — the left side explodes each row into
  * its maxLag probe offsets (a bounded, generate-only blowup, no
  * shuffle amplification beyond ×maxLag) and joins (key, t+lag) =
  * (key, t) against the original series, then ONE (key, lag)
  * aggregation with map-side combine. No per-key collection, no
  * windows — a 10⁹-point key costs maxLag·10⁹ joined rows, all
  * streaming through combiners.
  *
  * Determinism: with integral values (counts), every sum (Σx, Σy, Σxy,
  * Σx², Σy²) is an exact integer, so the Pearson numerator/denominator
  * are exact and the final sqrt/divide are single correctly-rounded
  * IEEE ops — bit-identical on any engine, any partitioning. That is
  * why the formula is the explicit five-sum form rather than two
  * passes of float centering.
  *
  * No reference counterpart; builder-prompt time-series extension.
  */
object Autocorrelation {

  /** Cross-correlation of two series over the same integer index —
    * the lead/lag detector ("does A lead B by k steps?"): for lag ∈
    * [−maxLag, maxLag], r(lag) = corr(A_t, B_{t+lag}) over overlapping
    * pairs; a peak at positive lag means A LEADS B. Same exact-integer
    * five-sum discipline and join shape as [[acf]].
    */
  def ccf(a: DataFrame, b: DataFrame, tCol: String, valColA: String,
          valColB: String, maxLag: Int): DataFrame = {
    require(maxLag >= 1, "maxLag must be >= 1")
    val av = a.select(col(tCol).cast("long").as("t"),
      col(valColA).cast("double").as("x"))
    val bv = b.select(col(tCol).cast("long").as("t2"),
      col(valColB).cast("double").as("y"))
    val probes = av
      .withColumn("lag", explode(sequence(lit(-maxLag), lit(maxLag))))
      .select(col("lag"), (col("t") + col("lag")).as("t2"), col("x"))
    pearsonByLag(probes.join(bv, Seq("t2")))
  }

  /** (key, lag, n_pairs, r): r null when either side of a lag's overlap
    * is constant (zero variance).
    */
  def acf(df: DataFrame, keyCol: String, tCol: String, valCol: String,
          maxLag: Int): DataFrame = {
    require(maxLag >= 1, "maxLag must be >= 1")
    val base = df.select(col(keyCol).as("k"), col(tCol).cast("long").as("t"),
      col(valCol).cast("double").as("v"))
    val probes = base
      .withColumn("lag", explode(sequence(lit(1), lit(maxLag))))
      .select(col("k"), col("lag"), (col("t") + col("lag")).as("t2"),
        col("v").as("x"))
    val pairs = probes.join(
      base.select(col("k"), col("t").as("t2"), col("v").as("y")),
      Seq("k", "t2"))
    pearsonByLag(pairs, Seq("k"))
  }

  /** Shared five-sum Pearson per (groupCols..., lag) over (x, y) pairs. */
  private def pearsonByLag(pairs: DataFrame,
                           groupCols: Seq[String] = Nil): DataFrame = {
    val keys = groupCols.map(col) :+ col("lag")
    pairs.groupBy(keys: _*)
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .select((keys :+ col("n_pairs") :+
        when((col("n_pairs") * col("sxx") - col("sx") * col("sx")) > 0 &&
          (col("n_pairs") * col("syy") - col("sy") * col("sy")) > 0,
          round((col("n_pairs") * col("sxy") - col("sx") * col("sy")) /
            sqrt((col("n_pairs") * col("sxx") - col("sx") * col("sx")) *
              (col("n_pairs") * col("syy") - col("sy") * col("sy"))), 6))
          .as("r")): _*)
  }
}
