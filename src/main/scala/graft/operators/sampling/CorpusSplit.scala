package graft.operators.sampling

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Leakage-safe train/valid/test corpus splitting. The assignment is a
  * pure hash draw on the row's identity — the same md5-uniform trick as
  * [[CorpusMix]] — so it is deterministic, shuffle-free, and independent
  * of partitioning, cluster size, task retries, and AQE re-plans: the
  * 100 TB run and the laptop run put every document in the same split,
  * and an incremental re-run never migrates a previously-seen row.
  *
  * Leakage safety: with `groupCol` set, the draw keys on the GROUP's
  * identity instead of the row's, so every member of a group (exact-dup
  * cluster, near-dup component, same-conversation turns, same-domain
  * pages) lands in the SAME split — near-duplicates of a training
  * document can never leak into the eval split. Rows with a null group
  * fall back to their own key (each is its own group); the two key
  * spaces are prefix-tagged (`g:`/`r:`) so a group value can never
  * collide with a row key.
  *
  * [[splitByNearDup]] goes one step further and derives the group from
  * the MinHash near-dup component itself (the RefinedWeb/Dolma split
  * discipline): pair graph → connected components → component label as
  * the group. The component step is the only shuffle; the assignment
  * stays per-row codegen.
  *
  * No reference counterpart (closest surface: RateSampler's
  * labelCol-stratified fractions); builder-prompt north-star extension.
  */
object CorpusSplit {

  /** Adds `splitCol` ∈ splits' names. `splits` are (name, weight) in
    * declaration order; weights are normalized (8/1/1 ≡ 0.8/0.1/0.1).
    * The interval layout is cumulative in declaration order, so adding a
    * new tail split leaves existing train-row assignments mostly stable.
    */
  def split(df: DataFrame, keyCol: String, splits: Seq[(String, Double)],
            seed: Long = 42L, groupCol: Option[String] = None,
            splitCol: String = "split"): DataFrame = {
    require(splits.nonEmpty, "corpus-split needs at least one split")
    require(splits.forall(_._2 > 0), "corpus-split weights must be > 0")
    require(splits.map(_._1).distinct.size == splits.size,
      "corpus-split names must be distinct")
    val drawKey: Column = groupCol match {
      case Some(g) => when(col(g).isNull,
          concat(lit("r:"), col(keyCol).cast("string")))
        .otherwise(concat(lit("g:"), col(g).cast("string")))
      case None => col(keyCol).cast("string")
    }
    // uniform [0,1) from the draw key ([[CorpusShuffle.draw]], the one
    // shared portable construction)
    val u = CorpusShuffle.draw(drawKey, seed, plusHalf = false)
    // cumulative thresholds; the fold order here (left-to-right sum) is
    // part of the determinism contract — an oracle mirroring this split
    // must add weights in the same order to get bit-identical doubles
    val cums = splits.map(_._2).scanLeft(0.0)(_ + _).tail
    val total = cums.last
    val assign = splits.init.zip(cums.init).foldRight(
      lit(splits.last._1): Column) { case (((name, _), c), acc) =>
      when(u < lit(c / total), lit(name)).otherwise(acc)
    }
    df.withColumn(splitCol, assign)
  }

  /** Split where the group is each document's MinHash near-dup component
    * (threshold/ngram as in `Dedup method="minhash"`): no near-duplicate
    * pair ever straddles two splits. Docs in no pair draw on their own id.
    */
  def splitByNearDup(df: DataFrame, idCol: String, textCol: String,
                     splits: Seq[(String, Double)], threshold: Double = 0.8,
                     ngram: Int = 3, seed: Long = 42L,
                     splitCol: String = "split"): DataFrame = {
    import graft.operators.dedup.{Components, TextDedup}
    // cache the shingles: the banded self-join and exact-verify join each
    // read them twice (see DedupET.train notes); Components.labels
    // materializes the pair graph eagerly, so unpersist after is safe
    val sh = TextDedup.shingles(df.select(col(idCol), col(textCol)),
      idCol, textCol, ngram).cache()
    val grouped = try {
      val labels = Components.labels(TextDedup.minHashSelfJoin(sh, threshold))
        .select(col("id").as(idCol), col("label").as("__grp__"))
      df.join(labels, Seq(idCol), "left")
    } finally sh.unpersist()
    split(grouped, idCol, splits, seed, groupCol = Some("__grp__"), splitCol)
      .drop("__grp__")
  }
}
