package graft.operators.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CCNet-style perplexity bucketing (Wenzek et al. 2020): split each
  * language slice of the corpus into `nBuckets` equal-population quality
  * tiers by LM cross-entropy — CCNet's head/middle/tail, the standard
  * pre-training recipe for "keep the fluent third, sample the rest".
  *
  * Scale shape — the naive plan (`ntile() OVER (PARTITION BY lang ORDER
  * BY xent)`) funnels an entire language into ONE task: at 100 TB the
  * "en" partition is tens of TB and the job dies. This implementation
  * never globally sorts rows. Cutoffs come from a two-phase exact
  * histogram over the ROUNDED cross-entropy (4 dp, the grain
  * [[BigramLm.crossEntropy]] already emits):
  *
  *   1. `groupBy(lang, xent).count()` — one map-combined shuffle whose
  *      key space is #langs x #distinct-4dp-xents (bounded by the value
  *      grain, ~1e5 keys worst case, independent of corpus size);
  *   2. a cumulative sum over that histogram (a window over the tiny
  *      aggregate, not the corpus) yields, per language, the smallest
  *      xent value v_j with cumcount(<= v_j) >= ceil(total * j / n) —
  *      the exact j-th n-tile boundary under tie-on-value semantics;
  *   3. the per-lang cutoff rows broadcast-join back to the scored
  *      corpus and the bucket is a codegen'd comparison count.
  *
  * Tie handling is BY VALUE: every document with the same (lang, xent)
  * lands in the same bucket (ntile's arbitrary tie split is what makes
  * it both engine-unportable and semantically awkward), so bucket
  * populations are equal up to value ties. Bucket 1 = lowest
  * cross-entropy = most fluent ("head"); `nBuckets` = "tail".
  *
  * No reference counterpart (the reference has no LM scoring); builder
  * prompt training-data-pipeline extension, published method: CCNet
  * (Wenzek et al., LREC 2020), the KenLM-percentile filtering used by
  * LLaMA/RedPajama/FineWeb lineage pipelines.
  *
  * Output: (idCol, langCol, n_bigrams, xent, ppl_bucket) — one row per
  * document that has >= 2 tokens (documents without a bigram carry no
  * LM evidence and are dropped, mirroring p42). Documents with a NULL
  * language are likewise dropped — bucket cutoffs are per-language and a
  * null lang names no language; the equi-join back to the cutoff table
  * discards them by construction (same semantics as the oracle's `JOIN
  * ... USING (lang)`). Run language-ID (p14) or `coalesce(lang, 'und')`
  * upstream if unknown-language docs should be bucketed as a group.
  */
object PerplexityBuckets {

  def assign(df: DataFrame, idCol: String, textCol: String,
             langCol: String, nBuckets: Int = 3,
             lambda: Double = 0.75, minCount: Long = 1L): DataFrame = {
    require(nBuckets >= 2, "nBuckets must be >= 2")
    val scored = BigramLm.crossEntropy(df, idCol, textCol, lambda, minCount)
    val withLang = df.select(col(idCol), col(langCol))
      .join(scored, Seq(idCol))

    // phase 1: bounded histogram of rounded xent per language
    val hist = withLang.groupBy(col(langCol), col("xent"))
      .agg(count(lit(1)).as("__c__"))
    // phase 2: cumulative counts over the histogram (window over the
    // aggregate — #langs x #distinct-xent rows, never the corpus)
    val cum = hist.withColumn("__cum__",
      sum("__c__").over(Window.partitionBy(col(langCol))
        .orderBy(col("xent"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val tot = hist.groupBy(col(langCol)).agg(sum("__c__").as("__tot__"))
    // cutoff_j = min xent with cum >= ceil(tot * j / n); for integer cum
    // that is exactly `cum * n >= tot * j` — pure integer comparison, so
    // Spark and any SQL oracle agree with no fp boundary cases
    val cutCols = (1 until nBuckets).map { j =>
      min(when(col("__cum__") * nBuckets >= col("__tot__") * j, col("xent")))
        .as(s"__cut${j}__")
    }
    val cuts = cum.join(tot, Seq(langCol))
      .groupBy(col(langCol))
      .agg(cutCols.head, cutCols.tail: _*)

    // phase 3: broadcast cutoffs back; bucket = 1 + #(cutoffs strictly below)
    val bucket = (1 until nBuckets).map { j =>
      when(col("xent") > col(s"__cut${j}__"), 1).otherwise(0)
    }.reduce(_ + _) + lit(1)
    withLang.join(broadcast(cuts), Seq(langCol))
      .withColumn("ppl_bucket", bucket)
      .select(col(idCol), col(langCol), col("n_bigrams"), col("xent"),
        col("ppl_bucket"))
  }
}
