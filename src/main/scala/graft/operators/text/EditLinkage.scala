package graft.operators.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fuzzy record linkage by exact edit distance with q-gram blocking —
  * the entity-resolution primitive the dedup stack lacked: MinHash/
  * Jaccard ([[graft.operators.dedup.TextDedup]]) match on shared token
  * sets and miss single-character typos in short strings (a transposed
  * digit changes one shingle out of three), while edit distance is the
  * right grain for names, SKUs, and identifiers.
  *
  * Shape (q-gram count filtering, Gravano et al. VLDB 2001): each side
  * explodes into its distinct character q-grams → inverted-index
  * equi-join on the gram (plus a length-band prune: `ed ≥ |len(s) −
  * len(t)|`, so bands farther than `maxDist` apart cannot match) →
  * distinct candidate pairs → exact `levenshtein` filter. Spark's
  * 3-arg `levenshtein(l, r, threshold)` early-exits the DP past the
  * threshold, so the verify cost per pair is O(maxDist·len), not
  * O(len²).
  *
  * Completeness: two strings within edit distance d share at least
  * `max(|s|,|t|) − q + 1 − d·q` q-grams, strictly positive whenever
  * `min(|s|,|t|) ≥ q·(d+1)` — under that bound the join has ZERO false
  * negatives (each edit destroys at most q grams). Shorter strings can
  * slip through with zero shared grams; callers linking very short keys
  * should lower `q` (the bound scales as q·(d+1)).
  * `maxGramFreq` caps the inverted index's hottest grams ON BOTH SIDES
  * (the p9 skew guard: a gram shared by f strings contributes f² candidate
  * pairs; capping each side independently bounds the per-gram pair count
  * at cap², regardless of which side carries the skew): capped grams lose
  * their pairs unless another sub-cap gram also covers them — an explicit
  * recall trade documented at the call site, OFF by default (0 = no cap).
  * Measured recall of the cap on the p105 fixture: see
  * `EditLinkageSpec` "maxGramFreq recall table".
  *
  * At 100 TB: everything is equi-joins and hash aggregations on the gram
  * / id keys — no cartesian, no windows; the inverted index is linear in
  * total string length and the candidate set is bounded by gram
  * co-occurrence (capped under skew). Determinism: levenshtein is
  * integer; output is exact.
  *
  * No reference counterpart; training-data/entity-resolution extension.
  */
object EditLinkage {

  /** All pairs (leftId, rightId, left_str, right_str, dist) with
    * levenshtein(left_str, right_str) <= maxDist that share at least one
    * character q-gram (see completeness bound above). Self-linkage:
    * pass the same frame twice and filter `leftId < rightId` after.
    */
  def fuzzyJoin(left: DataFrame, lId: String, lStr: String,
                right: DataFrame, rId: String, rStr: String,
                maxDist: Int, q: Int = 3, maxGramFreq: Long = 0L): DataFrame = {
    require(maxDist >= 0, "maxDist must be >= 0")
    val cand = fuzzyCandidates(left, lId, lStr, right, rId, rStr,
      maxDist, q, maxGramFreq)
    cand
      .withColumn("dist",
        expr(s"levenshtein(l_str, r_str, $maxDist)").cast("int"))
      .where(col("dist") >= 0 && col("dist") <= maxDist)
      .select(col("l_id"), col("r_id"), col("l_str"), col("r_str"), col("dist"))
  }

  /** Best fuzzy match per LEFT record under Jaro-Winkler similarity
    * ([[graft.functions.JaroWinklerSim]] — bit-compatible with DuckDB's
    * `jaro_winkler_similarity`, so the p109 oracle replays scoring
    * verbatim): q-gram blocking with a generous length band (JW has no
    * edit-distance length bound, so the band is `bandSlack` rather than
    * a distance), then the top match per left id at `minSim` or better,
    * ties broken by right id. Same scale shape as [[fuzzyJoin]]; the
    * argmax is one window keyed by the left id.
    */
  def jwBestMatch(left: DataFrame, lId: String, lStr: String,
                  right: DataFrame, rId: String, rStr: String,
                  minSim: Double, q: Int = 3, bandSlack: Int = 8,
                  maxGramFreq: Long = 0L): DataFrame = {
    require(minSim >= 0.0 && minSim <= 1.0, "minSim must be in [0,1]")
    val pairs = fuzzyCandidates(left, lId, lStr, right, rId, rStr,
      bandSlack, q, maxGramFreq)
    import org.apache.spark.sql.expressions.Window
    pairs
      .withColumn("sim", round(
        call_function("jaro_winkler_similarity", col("l_str"), col("r_str")), 6))
      .where(col("sim") >= minSim)
      .withColumn("__rn__", row_number().over(
        Window.partitionBy(col("l_id"))
          .orderBy(col("sim").desc, col("r_id"))))
      .where(col("__rn__") === 1)
      .select(col("l_id"), col("r_id"), col("l_str"), col("r_str"), col("sim"))
  }

  /** Shared blocking stage: distinct candidate pairs that share a q-gram
    * within a length band of `slack`.
    */
  private def fuzzyCandidates(left: DataFrame, lId: String, lStr: String,
                              right: DataFrame, rId: String, rStr: String,
                              slack: Int, q: Int,
                              maxGramFreq: Long): DataFrame = {
    require(q >= 1, "q must be >= 1")
    // per-side gram column names: self-linkage passes one frame twice,
    // and a shared name would make the join condition self-ambiguous
    def grams(df: DataFrame, id: String, str: String, idAs: String,
              strAs: String, lenAs: String, gramAs: String): DataFrame =
      df.select(col(id).as(idAs), col(str).as(strAs))
        .where(col(strAs).isNotNull && length(col(strAs)) >= q)
        .withColumn(lenAs, length(col(strAs)))
        .withColumn(gramAs, explode(array_distinct(expr(
          s"transform(sequence(1, $lenAs - ${q - 1}), i -> substring($strAs, i, $q))"))))
    // cap each side's inverted index independently: a hot gram on EITHER
    // side would otherwise join up to f_hot rows per opposite row (ADVICE
    // r15 — a right-only cap leaves f_left × cap pairs under left skew)
    def capHot(g: DataFrame, gramAs: String): DataFrame =
      if (maxGramFreq <= 0L) g
      else {
        val hot = g.groupBy(col(gramAs))
          .agg(count(lit(1)).as("__f__")).where(col("__f__") > maxGramFreq)
          .select(col(gramAs))
        g.join(hot, Seq(gramAs), "left_anti")
      }
    val lg = capHot(grams(left, lId, lStr, "l_id", "l_str", "l_len", "l_gram"), "l_gram")
    val rg = capHot(grams(right, rId, rStr, "r_id", "r_str", "r_len", "r_gram"), "r_gram")
    lg.join(rg,
        col("l_gram") === col("r_gram") &&
          abs(col("l_len") - col("r_len")) <= slack)
      .select(col("l_id"), col("l_str"), col("r_id"), col("r_str"))
      .distinct()
  }
}
