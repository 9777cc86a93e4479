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
  * `maxGramFreq` caps the RIGHT side's inverted index hottest grams (the
  * p9 skew guard): every left gram occurrence then joins ≤ cap right
  * rows, so total candidate pairs are ≤ (total left grams) × cap —
  * LINEAR in the left side. That is the honest contract for the
  * production feed-vs-catalog shape (growing feed on the LEFT, bounded
  * catalog on the RIGHT); a left-side cap would instead decay recall as
  * the feed grows, since common grams cross any fixed cap on volume
  * alone (ADVICE r15, resolved by making the sides' roles explicit).
  * For SELF-linkage both sides grow together, so `capBoth = true`
  * additionally caps the left index — per-gram pair count ≤ cap²
  * regardless of which side carries the skew; [[EntityResolve]] and the
  * FuzzyLinkage ET's self mode set it automatically. Capped grams lose
  * their pairs unless another sub-cap gram also covers them — an
  * explicit recall trade, OFF by default (0 = no cap). Measured on the
  * p105 fixture (sf0.01: 799-name catalog, typo'd feed, 2124 true
  * pairs — `EditLinkageSpec` "maxGramFreq recall table", spec-pinned):
  * cap 256 → recall 1.0000 (the hottest grams there are pure join
  * waste), 64 → 0.7891, 16 → 0.4044 — identical for right-only and
  * capBoth on that fixture, since the feed's gram distribution mirrors
  * the catalog's (right-capped grams already lose their joint pairs).
  * Size the cap from the gram-frequency histogram, not by feel: it
  * should sit ABOVE the frequency of the rarest gram a typical matching
  * pair shares.
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
                maxDist: Int, q: Int = 3, maxGramFreq: Long = 0L,
                capBoth: Boolean = false): DataFrame = {
    require(maxDist >= 0, "maxDist must be >= 0")
    val cand = fuzzyCandidates(left, lId, lStr, right, rId, rStr,
      maxDist, q, maxGramFreq, capBoth)
    cand
      .withColumn("dist",
        expr(s"levenshtein(l_str, r_str, $maxDist)").cast("int"))
      // threshold levenshtein returns -1 whenever the distance exceeds
      // maxDist, so `dist >= 0` alone IS the <= maxDist filter. Keeping a
      // second `dist <= maxDist` conjunct doubled the levenshtein work:
      // the optimizer pushes this predicate into the gram-collision JOIN
      // CONDITION with each `dist` reference inlined as its own
      // levenshtein call — p118's hot stage evaluated the threshold DP
      // twice per collision row (StageProf r21)
      .where(col("dist") >= 0)
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
                  maxGramFreq: Long = 0L, capBoth: Boolean = false): DataFrame = {
    require(minSim >= 0.0 && minSim <= 1.0, "minSim must be in [0,1]")
    val pairs = fuzzyCandidates(left, lId, lStr, right, rId, rStr,
      bandSlack, q, maxGramFreq, capBoth)
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
                              maxGramFreq: Long,
                              capBoth: Boolean): DataFrame = {
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
    // the right index is always capped (pairs ≤ left grams × cap, linear
    // in the feed); capBoth adds the left cap for self-linkage, bounding
    // per-gram pairs at cap² under skew on either side (ADVICE r15)
    def capHot(g: DataFrame, gramAs: String, on: Boolean): DataFrame =
      if (maxGramFreq <= 0L || !on) g
      else {
        val hot = g.groupBy(col(gramAs))
          .agg(count(lit(1)).as("__f__")).where(col("__f__") > maxGramFreq)
          .select(col(gramAs))
        g.join(hot, Seq(gramAs), "left_anti")
      }
    val lg = capHot(grams(left, lId, lStr, "l_id", "l_str", "l_len", "l_gram"),
      "l_gram", capBoth)
    val rg = capHot(grams(right, rId, rStr, "r_id", "r_str", "r_len", "r_gram"),
      "r_gram", on = true)
    lg.join(rg,
        col("l_gram") === col("r_gram") &&
          abs(col("l_len") - col("r_len")) <= slack)
      .select(col("l_id"), col("l_str"), col("r_id"), col("r_str"))
      .distinct()
  }
}
