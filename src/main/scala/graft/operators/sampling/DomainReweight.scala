package graft.operators.sampling

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._

/** DoReMi-style domain reweighting (Xie et al. 2023, "DoReMi: Optimizing
  * Data Mixtures Speeds Up Language Model Pretraining"): up-weight the
  * domains a generic model is WORST at, so the mixture spends its budget
  * where the marginal learning signal is largest. DoReMi proper measures
  * excess loss with a trained proxy LM; this lite variant uses the
  * empirical unigram KL divergence of each domain against the pooled
  * corpus — `excess_d = KL(p_d || p_corpus)` — which is exactly the
  * unigram-LM excess cross-entropy of domain d under the corpus model
  * (H_d(corpus) − H_d(own)), computable in two aggregations with no
  * model training. Weights follow DoReMi's exponentiated-excess update:
  *
  *   w_d ∝ share_d · exp(excess_d / temperature),   Σ w_d = 1
  *
  * Scale shape: ONE corpus-sized shuffle (tokens → (domain, word)
  * counts, map-side combine), then every later step operates on the
  * (#domains × vocab) count table — the word-marginal re-agg, the
  * per-domain KL, and the #domains-row weight normalization (scalars
  * carried as broadcast 1-row frames, no driver collect). At 100 TB the
  * corpus is touched once; everything else is vocabulary-sized.
  *
  * Tokenization and the 4-dp cross-entropy rounding convention match
  * [[graft.operators.text.UnigramLm]], so the p56 oracle replays the
  * full computation in DuckDB (fp-associativity differences sit ~1e-12,
  * far below the rounding grain; the normalization sums #domains values).
  * One determinism assumption BEYOND fp-associativity slack: `exp` of
  * the (already 4-dp-rounded) excess must agree bitwise between the JVM
  * (`StrictMath.exp`-backed `Math.exp`) and DuckDB's libm — a 1-ulp libm
  * difference could in principle flip the final 6-dp ROUND at an exact
  * boundary. Held empirically across every round's oracle runs (the
  * 4-dp argument rounding keeps inputs on a coarse grid); if a platform
  * ever breaks it, round `wraw` once before the normalizing divide.
  *
  * No reference counterpart; beyond-reference LLM-pipeline surface per
  * the builder prompt. Feed the weights into
  * [[CorpusMix]]/[[TemperatureMix]] to materialize the resampled mixture.
  */
object DomainReweight {

  // inside a script: pinned to the script's CacheScope; outside:
  // single-flight register (see CacheScope.pin)
  private val lastCache =
    new java.util.concurrent.atomic.AtomicReference[DataFrame](null)

  /** Per-domain mixture weights. Output one row per domain:
    * (domain, n_tokens, share 6dp, excess 4dp, weight 6dp), where
    * `excess` is KL(domain || corpus) in nats over whitespace unigrams
    * and `weight` is the normalized exponentiated-excess mixture weight.
    *
    * Null-domain contract (the PerplexityBuckets convention): rows with a
    * null domain get NO weight row — the equi-join on `domain` drops them,
    * exactly as the oracle's `JOIN ... USING (domain)` does — while their
    * tokens still count toward the corpus totals. `coalesce(domain,'und')`
    * upstream if unattributed docs should form their own domain.
    */
  def weights(df: DataFrame, domainCol: String, textCol: String,
              temperature: Double = 1.0): DataFrame = {
    require(temperature > 0, s"temperature must be > 0, got $temperature")
    // the (domain, word) count table feeds four consumers (word marginal,
    // domain totals, grand total, KL join) — cache it so the corpus-sized
    // explode+shuffle runs ONCE; the cached frame is vocabulary-sized
    val domTok = df
      .select(col(domainCol).as("domain"),
        explode(split(col(textCol), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("domain", "word").agg(count(lit(1)).as("cd"))
      .cache()
    graft.CacheScope.pin(domTok, lastCache)
    val glob = domTok.groupBy("word").agg(sum("cd").as("c"))
    val domTotals = domTok.groupBy("domain").agg(sum("cd").as("n_d"))
    val total = domTok.agg(sum("cd").as("n"))
    val excess = domTok
      .join(glob, "word")
      .join(domTotals, "domain")
      .crossJoin(broadcast(total))
      .groupBy(col("domain"), col("n_d"), col("n"))
      .agg(F.round(
        sum(col("cd").cast("double") *
          log((col("cd").cast("double") / col("n_d").cast("double")) /
            (col("c").cast("double") / col("n").cast("double"))))
          / col("n_d").cast("double"), 4).as("excess"))
    val raw = excess.withColumn("share",
        F.round(col("n_d").cast("double") / col("n").cast("double"), 6))
      .withColumn("wraw",
        (col("n_d").cast("double") / col("n").cast("double")) *
          exp(col("excess") / lit(temperature)))
    // normalization over the #domains-row frame: an unpartitioned window
    // is a SinglePartition exchange of #domains rows — bounded by
    // construction, and avoids recomputing the corpus lineage that a
    // self-join against raw.agg(...) would trigger
    val win = org.apache.spark.sql.expressions.Window.partitionBy()
    raw.withColumn("sw", sum("wraw").over(win))
      .select(col("domain"), col("n_d").cast("long").as("n_tokens"),
        col("share"), col("excess"),
        F.round(col("wraw") / col("sw"), 6).as("weight"))
  }
}
