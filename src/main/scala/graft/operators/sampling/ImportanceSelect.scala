package graft.operators.sampling

import org.apache.spark.sql.{Column, DataFrame, functions => F}
import org.apache.spark.sql.functions._

/** DSIR-style importance-weighted data selection (Xie et al. 2023, "Data
  * Selection for Language Models via Importance Resampling"): score every
  * raw-corpus document by its log importance weight under hashed-n-gram
  * bag-of-words models of a small TARGET corpus (the distribution you want
  * more of — e.g. curated reference text) versus the RAW corpus itself,
  * then keep the top-k (or Gumbel-resample ∝ weight).
  *
  *   log w(doc) = Σ_{g ∈ ngrams(doc)} [ ln p_target(bucket(g))
  *                                    − ln p_raw(bucket(g)) ]
  *
  * with word unigram+bigram features hashed into `buckets` buckets and
  * add-alpha smoothing on both multinomials.
  *
  * Plan shape (100 TB raw side):
  *   - `fit` is two corpus scans, each `explode → groupBy(bucket)` with
  *     map-side partial aggregation — the shuffle carries at most `buckets`
  *     rows per mapper, and the collected model is `buckets` longs
  *     (8192 by default — a driver-bounded model by construction, NOT
  *     data-sized; same contract as the BPE vocab tables).
  *   - `score` is ZERO-shuffle: the per-bucket log-ratio vector rides into
  *     the plan as one array `Literal` (`typedlit`, a single object — not a
  *     `CreateArray` of 8192 children, so no codegen blowup), and each row
  *     sums `element_at` lookups with an `aggregate` HOF over its own
  *     n-gram array. One map-only pass over the corpus.
  *   - `select` adds one global top-k (`orderBy.limit` = partial top-k per
  *     partition + driver merge of k rows, never a full sort at scale).
  *
  * The default bucket hash is one codegen'd `xxhash64` per n-gram — the
  * corpus pays the hash three times (two fit scans + scoring), so at scale
  * it must be cheap. `portable = true` swaps in a single-MD5 hex-prefix
  * bucket that evaluates bit-identically in DuckDB so the p44/s26 oracles
  * can replay the pipeline cross-engine (see [[bucketExpr]]).
  *
  * No reference counterpart (the reference has no data-selection
  * operator); beyond-reference LLM-pipeline surface per the builder
  * prompt, same family as [[CorpusMix]] / [[GroupCap]].
  */
object ImportanceSelect {

  val DefaultBuckets = 8192

  /** Word unigram+bigram array for one text column — per-row, codegen'd,
    * no shuffle. Empty-safe: <2 tokens contributes no bigrams.
    */
  def ngramsExpr(textCol: String): Column = expr(
    s"""concat(
       |  filter(split($textCol, ' '), x -> x <> ''),
       |  CASE WHEN size(filter(split($textCol, ' '), x -> x <> '')) < 2
       |       THEN CAST(array() AS array<string>)
       |       ELSE zip_with(
       |         slice(filter(split($textCol, ' '), x -> x <> ''), 1,
       |               size(filter(split($textCol, ' '), x -> x <> '')) - 1),
       |         slice(filter(split($textCol, ' '), x -> x <> ''), 2,
       |               size(filter(split($textCol, ' '), x -> x <> '')) - 1),
       |         (a, b) -> concat(a, ' ', b)) END)""".stripMargin)

  /** Bucket of one n-gram string. The default (`portable = false`) is one
    * codegen'd `xxhash64` — the right hash at 100 TB, where the corpus pays
    * it three times (two fit scans + scoring). `portable = true` swaps in
    * `conv(md5 hex[1..6], 16, 10) % buckets`, which DuckDB replays
    * bit-identically (`CAST('0x' || SUBSTR(MD5(..),1,6) AS UBIGINT)`), so
    * the p44/s26 oracles can re-run the pipeline. ONE md5 per n-gram —
    * expressions inside HOF lambdas get no common-subexpression
    * elimination, so a multi-term hash would evaluate one md5 PER TERM.
    * 24 hash bits mod a power-of-two bucket count stays exactly uniform.
    */
  def bucketExpr(ng: Column, buckets: Int = DefaultBuckets,
                 portable: Boolean = false): Column =
    if (!portable) pmod(xxhash64(ng), lit(buckets.toLong)).cast("int")
    else (conv(substring(md5(ng), 1, 6), 16, 10).cast("long") % lit(buckets.toLong))
      .cast("int")

  /** (bucket, cnt) hashed-n-gram occurrence counts for a corpus — one
    * map-side-combined shuffle of ≤`buckets` distinct keys.
    */
  def bucketCounts(df: DataFrame, textCol: String,
                   buckets: Int = DefaultBuckets,
                   portable: Boolean = false): DataFrame =
    df.select(explode(ngramsExpr(textCol)).as("__ng__"))
      .select(bucketExpr(col("__ng__"), buckets, portable).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("cnt"))

  /** Smoothed per-bucket log importance ratios
    * `ln p_target[b] − ln p_raw[b]`, as a bucket-indexed array. The
    * collect is bounded by `buckets` (model-sized, not data-sized).
    */
  def fitLogRatios(target: DataFrame, raw: DataFrame, textCol: String,
                   buckets: Int = DefaultBuckets,
                   alpha: Double = 1.0,
                   portable: Boolean = false): Array[Double] = {
    def counts(df: DataFrame): Array[Long] = {
      val arr = new Array[Long](buckets)
      bucketCounts(df, textCol, buckets, portable).collect()
        .foreach(r => arr(r.getInt(0)) = r.getLong(1))
      arr
    }
    val (ct, cr) = (counts(target), counts(raw))
    val (nt, nr) = (ct.sum.toDouble, cr.sum.toDouble)
    Array.tabulate(buckets) { b =>
      math.log((ct(b) + alpha) / (nt + alpha * buckets)) -
        math.log((cr(b) + alpha) / (nr + alpha * buckets))
    }
  }

  /** (idCol, n_grams, log_w) per raw document — map-only (see object doc).
    * Documents with no tokens are dropped (no features ⇒ no weight).
    * `log_w` is rounded to 4 dp: per-bucket terms are bit-identical
    * cross-engine, so only summation-order eps (~1e-13) sits under the
    * rounding grain.
    *
    * `minParallelism` is the local-honesty hatch
    * ([[graft.operators.scale.Parallelism.ensure]]): a single-split local
    * fixture otherwise runs this CPU-bound projection on one core. Off
    * (0) by default — at scale input splits provide the parallelism and
    * the pass must stay zero-shuffle.
    */
  def score(raw: DataFrame, idCol: String, textCol: String,
            logRatios: Array[Double],
            buckets: Int = DefaultBuckets,
            portable: Boolean = false,
            minParallelism: Int = 0): DataFrame = {
    require(logRatios.length == buckets,
      s"logRatios has ${logRatios.length} entries, expected $buckets")
    val lr = typedlit(logRatios) // ONE ArrayType Literal — codegen-safe
    graft.operators.scale.Parallelism.ensure(raw, minParallelism)
      .select(col(idCol), ngramsExpr(textCol).as("__ngs__"))
      .filter(size(col("__ngs__")) > 0)
      .select(
        col(idCol),
        size(col("__ngs__")).cast("long").as("n_grams"),
        F.round(
          aggregate(
            transform(col("__ngs__"), ng => bucketExpr(ng, buckets, portable)),
            lit(0.0),
            (acc, b) => acc + element_at(lr, b + lit(1))),
          4).as("log_w"))
  }

  /** Top-`k` most target-like raw documents (fit + score + global top-k;
    * ties at the boundary break on `idCol` so the selected SET is
    * deterministic cross-engine).
    */
  def select(raw: DataFrame, target: DataFrame, idCol: String, textCol: String,
             k: Int, buckets: Int = DefaultBuckets,
             alpha: Double = 1.0, portable: Boolean = false,
             minParallelism: Int = 0): DataFrame = {
    // hoist the hatch above fit AND score: the fit's map-side explode over
    // the raw corpus is the same single-split-bound projection
    val rawP = graft.operators.scale.Parallelism.ensure(raw, minParallelism)
    score(rawP, idCol, textCol,
        fitLogRatios(target, rawP, textCol, buckets, alpha, portable),
        buckets, portable)
      .orderBy(col("log_w").desc, col(idCol))
      .limit(k)
  }

  /** Gumbel-top-k resampling: sample `k` documents WITHOUT replacement
    * with P(doc) ∝ exp(log_w / temperature) by perturbing each weight with
    * seeded Gumbel(0,1) noise and taking the top k — the distributed
    * standard for weighted sampling without a driver-side pass. The noise
    * is a pure function of (idCol, seed) so re-runs are reproducible.
    *
    * `portable = true` additionally swaps the uniform draw from the
    * codegen'd xxhash64 to the shared md5-hex construction
    * ([[CorpusShuffle.draw]], already oracle-replayed by p47/s26's rank):
    * `(CAST(md5-hex[1..8] base-16) + 0.5) / 2^32` evaluates bit-identically
    * in DuckDB, so the p49 oracle replays the whole resampling pass. The
    * +0.5 keeps u strictly inside (0,1) so both logs are finite — exactly
    * representable, since the numerator is a 32-bit integer plus a half.
    */
  def gumbelSelect(raw: DataFrame, target: DataFrame, idCol: String,
                   textCol: String, k: Int, seed: Long,
                   temperature: Double = 1.0,
                   buckets: Int = DefaultBuckets,
                   alpha: Double = 1.0,
                   portable: Boolean = false,
                   minParallelism: Int = 0): DataFrame = {
    val rawP = graft.operators.scale.Parallelism.ensure(raw, minParallelism)
    val scored = score(rawP, idCol, textCol,
      fitLogRatios(target, rawP, textCol, buckets, alpha, portable),
      buckets, portable)
    // uniform(0,1) from a seeded per-row hash; +0.5 keeps u strictly inside
    // (0,1) so both logs are finite
    val u =
      if (!portable)
        (pmod(xxhash64(col(idCol), lit(seed)), lit(1000000000L)).cast("double") + lit(0.5)) /
          lit(1000000000.0)
      else CorpusShuffle.draw(idCol, seed, plusHalf = true)
    scored
      .withColumn("__key__", col("log_w") / lit(temperature) - log(-log(u)))
      .orderBy(col("__key__").desc, col(idCol))
      .limit(k)
      .drop("__key__")
  }
}
