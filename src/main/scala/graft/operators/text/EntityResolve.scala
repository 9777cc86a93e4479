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
  * Canonical choice, two modes:
  *  - [[resolve]] — the component's MIN id, which is exactly the
  *    component label the min-label propagation already computes, so
  *    survivorship costs one join back to the registry, not an argmax
  *    window. The cheap default when any member is an acceptable canon.
  *  - [[resolveBest]] — real MDM survivorship (VERDICT r15 #4): elect
  *    the member with the HIGHEST quality score (ties → smallest id),
  *    and optionally build the golden record field-by-field with
  *    per-field merge strategies — `longest` (longest non-null string),
  *    `majority` (most frequent non-null value), `latest` (value at the
  *    max recency timestamp), `max`/`min` — each a deterministic
  *    argmax with a pinned tie rule (larger value wins), so the whole
  *    election replays in SQL (the p118 oracle).
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
    // self-linkage: both sides grow together, so the gram cap (when set)
    // must guard both indexes — capBoth bounds per-gram pairs at cap²
    val pairs = EditLinkage.fuzzyJoin(registry, idCol, strCol,
        registry, idCol, strCol, maxDist, q, maxGramFreq, capBoth = true)
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

  /** Quality-based survivorship: every registry row labeled with its
    * entity (min-id component label, same clustering as [[resolve]]),
    * plus the elected golden record — the member with the max
    * `scoreCol` (ties → smallest id) — and optional field-level merges.
    *
    * `mergeFields` maps field → strategy:
    *  - `longest`:  non-null value with the greatest string length
    *                (ties → larger value, binary collation)
    *  - `majority`: most frequent non-null value (ties → larger value)
    *  - `latest`:   non-null value on the row with the max `recencyCol`
    *                (ties → larger value); requires `recencyCol`
    *  - `max`/`min`: plain extrema of non-null values
    * Merged columns come back as `<field>_merged`. Every strategy is an
    * argmax over a struct with a total tie order, so output is
    * hash-exact at any executor count and SQL-replayable.
    *
    * Scale shape: clustering as [[resolve]]; the election is one
    * entity-keyed window and the merges one or two entity-keyed hash
    * aggregations (majority pre-aggregates per (entity, value)) — all
    * shuffles on the entity key, no windows over the whole registry.
    *
    * @return (rec_id, rec_str, entity, canon_id, canon_str
    *         [, <field>_merged...])
    */
  def resolveBest(registry: DataFrame, idCol: String, strCol: String,
                  scoreCol: String, maxDist: Int, q: Int = 3,
                  maxGramFreq: Long = 0L,
                  mergeFields: Seq[(String, String)] = Nil,
                  recencyCol: String = ""): DataFrame = {
    val pairs = EditLinkage.fuzzyJoin(registry, idCol, strCol,
        registry, idCol, strCol, maxDist, q, maxGramFreq, capBoth = true)
      .where(col("l_id") < col("r_id"))
      .select(col("l_id").as("a_id"), col("r_id").as("b_id"))
    val labels = graft.operators.dedup.Components.labels(pairs)
    // project down BEFORE the label join so stray registry columns named
    // `label`/`__entity__` cannot collide
    val needed = (Seq(idCol, strCol, scoreCol) ++ mergeFields.map(_._1) ++
      (if (recencyCol.nonEmpty) Seq(recencyCol) else Nil)).distinct
    val labeled = registry.select(needed.map(col): _*)
      .join(labels.select(col("id").as(idCol), col("label")), Seq(idCol), "left")
      .withColumn("__entity__", coalesce(col("label"), col(idCol)))
      .drop("label")
    electGolden(labeled, idCol, strCol, scoreCol, "__entity__",
      mergeFields, recencyCol)
  }

  /** The survivorship half of [[resolveBest]] on an ALREADY-labeled
    * registry (`entityCol` carries the entity id): elect + merge without
    * re-running linkage and components. The matching stage is the
    * expensive half of ER, and re-election is the common iteration —
    * new scoring rules, new merge strategies — so the split matters
    * operationally (s44 re-elects from its first resolve's labels).
    */
  def electGolden(labeled: DataFrame, idCol: String, strCol: String,
                  scoreCol: String, entityCol: String,
                  mergeFields: Seq[(String, String)] = Nil,
                  recencyCol: String = ""): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val extraCols = (mergeFields.map(_._1) ++
      (if (recencyCol.nonEmpty) Seq(recencyCol) else Nil)).distinct
      .filterNot(c => c == idCol || c == strCol || c == scoreCol || c == entityCol)
    val withEntity = labeled.select(
      (Seq(col(idCol).as("rec_id"), col(strCol).as("rec_str"),
        col(scoreCol).as("__score__"), col(entityCol).as("entity")) ++
        extraCols.map(col)): _*)
    // mergeFields / recencyCol entries naming idCol/strCol/scoreCol/
    // entityCol resolve against the RENAMED columns (ADVICE r16: they
    // previously died with an unresolved-column AnalysisException) —
    // e.g. merging the score itself with `max`, or `latest` keyed on the
    // score, just works; output aliases keep the caller's field name.
    def ref(c: String): org.apache.spark.sql.Column =
      if (c == idCol) col("rec_id")
      else if (c == strCol) col("rec_str")
      else if (c == scoreCol) col("__score__")
      else if (c == entityCol) col("entity")
      else col(c)
    // election: one entity-keyed window, max score, ties to smallest id
    val canon = withEntity
      .withColumn("__rn__", row_number().over(Window.partitionBy(col("entity"))
        .orderBy(col("__score__").desc, col("rec_id"))))
      .filter(col("__rn__") === 1)
      .select(col("entity"), col("rec_id").as("canon_id"),
        col("rec_str").as("canon_str"))
    // field merges: the simple strategies share ONE entity-keyed agg;
    // each majority field adds its own (entity, value) pre-agg
    val simple = mergeFields.filter(_._2 != "majority")
    val simpleExprs = simple.map { case (f, strat) =>
      val v = ref(f)
      (strat match {
        case "longest" =>
          max(when(v.isNotNull, struct(length(v).as("k"), v.as("v")))).getField("v")
        case "latest" =>
          require(recencyCol.nonEmpty, "latest merge requires recencyCol")
          max(when(v.isNotNull && ref(recencyCol).isNotNull,
            struct(ref(recencyCol).as("k"), v.as("v")))).getField("v")
        case "max" => max(v)
        case "min" => min(v)
        case other => throw new IllegalArgumentException(
          s"merge strategy must be longest|majority|latest|max|min, got '$other'")
      }).as(s"${f}_merged")
    }
    val merged0 =
      if (simpleExprs.isEmpty) canon
      else canon.join(
        withEntity.groupBy(col("entity"))
          .agg(simpleExprs.head, simpleExprs.tail: _*),
        Seq("entity"), "left")
    val mergedAll = mergeFields.filter(_._2 == "majority").foldLeft(merged0) {
      case (acc, (f, _)) =>
        val mv = withEntity.filter(ref(f).isNotNull)
          .groupBy(col("entity"), ref(f).as("__v__"))
          .agg(count(lit(1)).as("__n__"))
          .groupBy(col("entity"))
          .agg(max(struct(col("__n__").as("k"), col("__v__").as("v")))
            .getField("v").as(s"${f}_merged"))
        acc.join(mv, Seq("entity"), "left")
    }
    withEntity
      .select(col("rec_id"), col("rec_str"), col("entity"))
      .join(mergedAll, Seq("entity"))
      .select((Seq(col("rec_id"), col("rec_str"), col("entity"),
        col("canon_id"), col("canon_str")) ++
        mergeFields.map { case (f, _) => col(s"${f}_merged") }): _*)
  }
}
