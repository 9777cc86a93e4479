package graft.operators.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag (or drop) training documents that share
  * word n-gram shingles with an evaluation/benchmark corpus. This is the
  * standard contamination guard in LLM training-data pipelines (GPT-3
  * appendix C / PaLM-style n-gram overlap): a training document that
  * contains verbatim benchmark n-grams leaks the test set.
  *
  * Scale design (100 TB train side, MB–GB eval side):
  *  - The eval shingle set is bounded by the benchmark size, which is tiny
  *    relative to the corpus — it is `broadcast()` so the train side is a
  *    map-side hash semi-join: ONE scan of the corpus, no shuffle of it.
  *  - Only matching (train doc, shingle) rows — a vanishing fraction —
  *    reach the `groupBy(doc)` overlap count; that shuffle is sized by the
  *    contamination volume, not the corpus.
  *  - Shingling is the shared per-row [[graft.functions.WordShingles]]
  *    native expression (no UDF, distinct shingles per doc).
  *
  * Reference scope note: the reference has no decontamination operator;
  * this is part of the beyond-reference LLM-pipeline surface the builder
  * prompt requires (same family as [[TextDedup]]).
  */
object Decontaminate {

  /** (doc_id, n_overlap) for every train document sharing at least
    * `minOverlap` DISTINCT n-gram shingles with ANY eval document.
    * `n_overlap` counts distinct contaminated shingles (not eval docs).
    */
  def overlap(train: DataFrame, eval: DataFrame, idCol: String, textCol: String,
              n: Int = 8, minOverlap: Int = 1): DataFrame = {
    val trainSh = TextDedup.shingles(train.select(col(idCol), col(textCol)), idCol, textCol, n)
      .select(col("doc_id"), explode(col("shingles")).as("sh"))
    val evalSh = TextDedup.shingles(eval.select(col(idCol), col(textCol)), idCol, textCol, n)
      .select(explode(col("shingles")).as("sh")).distinct()
    trainSh
      .join(broadcast(evalSh), Seq("sh")) // map-side: corpus never shuffles
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_overlap")) // shingles are distinct per doc already
      .filter(col("n_overlap") >= minOverlap)
  }

  /** Fuzzy per-pair decontamination by CONTAINMENT ratio — the
    * Llama/GPT-4-report-style guard: a train doc is contaminated w.r.t. an
    * eval doc when it contains at least `threshold` of the eval doc's
    * distinct n-gram shingles (|train ∩ eval| / |eval|). Unlike [[overlap]]
    * (a corpus-wide shared-shingle count), this scores each (train, eval)
    * PAIR, so a question fully embedded in a long document is caught even
    * when the document shares little else with the benchmark.
    *
    * Same scale shape as [[overlap]]: both eval-side frames (exploded
    * shingles, per-doc sizes) are benchmark-bounded and broadcast; the
    * corpus is scanned once and never shuffled — only matching
    * (train, eval, shingle) rows reach the pair aggregation.
    *
    * Output: (doc_id, eval_id, n_shared, containment∈(0,1] rounded 4dp)
    * for pairs at or above `threshold`.
    */
  def containment(train: DataFrame, eval: DataFrame, idCol: String,
                  textCol: String, n: Int = 8,
                  threshold: Double = 0.5): DataFrame = {
    val trainSh = TextDedup.shingles(train.select(col(idCol), col(textCol)), idCol, textCol, n)
      .select(col("doc_id"), explode(col("shingles")).as("sh"))
    val evalShingled = TextDedup.shingles(eval.select(col(idCol), col(textCol)), idCol, textCol, n)
    val evalSh = evalShingled
      .select(col("doc_id").as("eval_id"), explode(col("shingles")).as("sh"))
    val evalSizes = evalShingled
      .select(col("doc_id").as("eval_id"), size(col("shingles")).cast("long").as("n_eval"))
    trainSh
      .join(broadcast(evalSh), Seq("sh")) // map-side: corpus never shuffles
      .groupBy(col("doc_id"), col("eval_id"))
      .agg(count(lit(1)).as("n_shared")) // shingles are distinct per doc
      .join(broadcast(evalSizes), Seq("eval_id"))
      .withColumn("containment",
        round(col("n_shared").cast("double") / col("n_eval").cast("double"), 4))
      .filter(col("containment") >= threshold)
      .select(col("doc_id"), col("eval_id"), col("n_shared"), col("containment"))
  }

  /** [[overlap]] for the regime where the eval shingle set outgrows an
    * exact-string broadcast: a full benchmark SUITE at ~1B distinct
    * shingles is ~100 GB of strings, but ~1.2 GB as a 1% Bloom filter.
    * The broadcast BF drops non-candidate train shingles AT SCAN SPEED,
    * and only the surviving sliver — true matches plus the `fpp` share
    * of the train shingles — reaches the exact confirm join, so the
    * shuffle is sized by contamination volume + fpp·|train shingles|,
    * never by the corpus. Output is IDENTICAL to [[overlap]] (the
    * confirm join removes every BF false positive): the filter changes
    * only where the bytes move, which is why the same DuckDB oracle
    * verifies both modes hash-exactly.
    */
  def overlapBloom(train: DataFrame, eval: DataFrame, idCol: String,
                   textCol: String, n: Int = 8, minOverlap: Int = 1,
                   fpp: Double = 0.01): DataFrame = {
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")
    val trainSh = TextDedup.shingles(train.select(col(idCol), col(textCol)), idCol, textCol, n)
      .select(col("doc_id"), explode(col("shingles")).as("sh"))
    val evalSh = TextDedup.shingles(eval.select(col(idCol), col(textCol)), idCol, textCol, n)
      .select(explode(col("shingles")).as("sh")).distinct()
    // the count pass is eval-side (benchmark-bounded), as is the BF build
    val bf = evalSh.stat.bloomFilter("sh", math.max(evalSh.count(), 1L), fpp)
    val bc = train.sparkSession.sparkContext.broadcast(bf)
    val mightContain = udf((s: String) => s != null && bc.value.mightContain(s))
    trainSh
      .filter(mightContain(col("sh"))) // scan-speed prefilter, no shuffle
      .join(evalSh, Seq("sh")) // exact confirm — deliberately NOT broadcast:
      // this mode exists for eval sets past broadcast size; the join input
      // is already the post-BF sliver
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_overlap"))
      .filter(col("n_overlap") >= minOverlap)
  }

  /** The train table minus contaminated documents (left_anti on
    * [[overlap]]; the anti-join key is the bounded flagged set, so this
    * composes with the broadcast shape above).
    */
  def clean(train: DataFrame, eval: DataFrame, idCol: String, textCol: String,
            n: Int = 8, minOverlap: Int = 1): DataFrame = {
    val flagged = overlap(train, eval, idCol, textCol, n, minOverlap)
      .select(col("doc_id").as(idCol))
    train.join(broadcast(flagged), Seq(idCol), "left_anti")
  }
}
