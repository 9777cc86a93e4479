package graft.operators.sampling

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cluster-balanced diversity sampling over an embedding column — the
  * "cluster then sample per cluster" selection used by modern data-curation
  * pipelines (DataComp-style): assign every vector to its nearest centroid
  * by cosine similarity, then keep a uniform quota per cluster so no dense
  * region of embedding space dominates the training mix.
  *
  * Scale shape (100 TB corpus, model-sized centroid set):
  *  - Assignment is a ZERO-shuffle map pass: the centroid set rides into
  *    the plan as ONE array-of-structs Literal (`typedlit` — a single
  *    object, not a per-centroid expression tree), and each row takes
  *    `array_max` over `transform`-computed (sim, −cid) structs. The
  *    cosine is the codegen'd [[graft.functions.ArrCosine]] native
  *    expression. Similarities are rounded to 6 dp BEFORE the argmax so
  *    the winning centroid is identical cross-engine at ulp boundaries,
  *    with ties broken toward the smallest centroid id.
  *  - The per-cluster quota reuses [[GroupCap.capPerGroupBy]]'s two-phase
  *    top-k (per-input-partition pre-cap, then exact) — skew-proof even
  *    when one cluster swallows most of the corpus.
  *
  * Centroids typically come from [[graft.operators.similarity.CosineSimilarity]]'s
  * persisted IVF centroids or any deterministic sample; the collect here is
  * bounded by the centroid count (a model, not data).
  *
  * No reference counterpart; beyond-reference LLM-pipeline surface per the
  * builder prompt, same family as [[ImportanceSelect]] / [[GroupCap]].
  */
object ClusterSample {

  /** (idCol, vecCol…, cluster, sim): nearest-centroid assignment as a
    * map-only pass. Rows with a null vector are dropped (no geometry).
    */
  def assign(corpus: DataFrame, idCol: String, vecCol: String,
             centroids: DataFrame, cidCol: String, cvecCol: String): DataFrame = {
    // centroid-count-bounded collect (model-sized by contract). Collect as
    // LONG and range-check: a silent cast("int") would wrap cids above
    // Int.MaxValue into corrupted/colliding cluster ids (and the argmax
    // tie-break below negates, so Int.MinValue is out too).
    val rawCents = centroids
      .select(col(cidCol).cast("long"), col(cvecCol).cast("array<double>"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq
    rawCents.find(c => c._1 <= Int.MinValue || c._1 > Int.MaxValue).foreach { c =>
      throw new IllegalArgumentException(
        s"ClusterSample centroid id ${c._1} does not fit in Int " +
          "(re-key the centroid table to dense int ids)")
    }
    val cents: Seq[(Int, Seq[Double])] =
      rawCents.map { case (cid, v) => (cid.toInt, v) }.sortBy(_._1)
    require(cents.nonEmpty, "ClusterSample requires a non-empty centroid set")
    val lit = typedlit(cents) // ONE Literal: array<struct<_1:int,_2:array<double>>>
    val v = col(vecCol).cast("array<double>")
    val best: Column = array_max(transform(lit, c => struct(
      round(call_function("arr_cosine", v, c.getField("_2")), 6).as("s"),
      (-c.getField("_1")).as("n"))))
    corpus.filter(col(vecCol).isNotNull)
      .withColumn("__best__", best)
      .withColumn("cluster", -col("__best__.n"))
      .withColumn("sim", col("__best__.s"))
      .drop("__best__")
  }

  /** Up to `m` rows per cluster. `central = true` keeps the most
    * prototypical members (highest sim); `false` keeps the boundary
    * members (lowest sim — the "hard" spread). Deterministic: sim is
    * pre-rounded and ties break on `idCol`.
    */
  def balanced(corpus: DataFrame, idCol: String, vecCol: String,
               centroids: DataFrame, cidCol: String, cvecCol: String,
               m: Int, central: Boolean = true): DataFrame =
    GroupCap.capPerGroupBy(
      assign(corpus, idCol, vecCol, centroids, cidCol, cvecCol),
      "cluster", m, "sim", descending = central, idCol)
}
