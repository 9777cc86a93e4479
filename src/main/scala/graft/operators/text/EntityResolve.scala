package graft.operators.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Entity resolution over one registry: fuzzy self-linkage
  * ([[EditLinkage.fuzzyJoin]]) clusters near-identical records into
  * entities via connected components
  * ([[graft.operators.dedup.Components]]), and each entity elects a
  * canonical ("golden") record — the classic MDM/survivorship pipeline
  * (match → cluster → survive) that linkage alone doesn't finish:
  * A≈B and B≈C must land A, B, C in ONE entity even when A and C are
  * more than `maxDist` apart.
  *
  * Canonical choice: the component's MIN id — which is exactly the
  * component label the min-label propagation already computes, so
  * survivorship costs one join back to the registry, not an argmax
  * window. (Callers wanting quality-based survivorship compose
  * `DedupET.keepComponentBest`-style scoring on top of the `entity`
  * column.)
  *
  * Scale shape: inherits fuzzyJoin's inverted-index blocking (linear
  * index, bounded candidates, skew cap) and Components' two-regime
  * labeling (driver union-find under the 2M-edge cap — near-dup pair
  * graphs are sparse relative to the registry even at 100 TB — else
  * O(log d) pointer-doubling rounds). Everything else is two
  * registry-keyed joins.
  *
  * No reference counterpart; entity-resolution extension per the
  * builder prompt.
  */
object EntityResolve {

  /** (rec_id, rec_str, entity, canon_str) for EVERY registry row;
    * singletons are their own entity. `entity` is the component's min
    * member id and `canon_str` that record's string.
    */
  def resolve(registry: DataFrame, idCol: String, strCol: String,
              maxDist: Int, q: Int = 3, maxGramFreq: Long = 0L): DataFrame = {
    val pairs = EditLinkage.fuzzyJoin(registry, idCol, strCol,
        registry, idCol, strCol, maxDist, q, maxGramFreq)
      .where(col("l_id") < col("r_id"))
      .select(col("l_id").as("a_id"), col("r_id").as("b_id"))
    val labels = graft.operators.dedup.Components.labels(pairs)
    val reg = registry.select(col(idCol).as("rec_id"), col(strCol).as("rec_str"))
    val withEntity = reg
      .join(labels.select(col("id").as("rec_id"), col("label")), Seq("rec_id"), "left")
      .select(col("rec_id"), col("rec_str"),
        coalesce(col("label"), col("rec_id")).as("entity"))
    withEntity
      .join(reg.select(col("rec_id").as("entity"), col("rec_str").as("canon_str")),
        Seq("entity"))
      .select(col("rec_id"), col("rec_str"), col("entity"), col("canon_str"))
  }
}
