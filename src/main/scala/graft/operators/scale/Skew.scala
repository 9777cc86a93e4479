package graft.operators.scale

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers (builder prompt: "salting for skew"; AQE's
  * skew-join split handles sort-merge joins automatically, but salting is
  * still the tool for skewed AGGREGATIONS over high-cardinality payloads
  * and for joins AQE cannot split).
  */
object Skew {

  /** Salted join of a skewed `big` side against a `small` side on
    * `keyCols`: the big side gets a random salt in [0, saltFactor), the
    * small side is replicated once per salt value, and the join runs on
    * (key, salt) — a hot key's rows spread over `saltFactor` partitions
    * instead of one. Replication cost: |small| × saltFactor, so keep the
    * small side dimension-sized.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keyCols: Seq[String],
                 saltFactor: Int, joinType: String = "inner"): DataFrame = {
    require(saltFactor >= 1, "saltFactor must be >= 1")
    val allowed = Set("inner", "left", "left_outer", "leftouter", "left_semi",
      "leftsemi", "left_anti", "leftanti", "cross")
    require(allowed.contains(joinType.toLowerCase.replace(" ", "")),
      s"saltedJoin supports inner/left join types only, got '$joinType' — " +
        "right/full outer would emit unmatched small-side rows once PER SALT")
    val saltedBig = big.withColumn("__salt__",
      (rand(42) * saltFactor).cast("int"))
    val saltedSmall = small.withColumn("__salt__",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    saltedBig.join(saltedSmall, keyCols :+ "__salt__", joinType)
      .drop("__salt__")
  }

  /** Two-phase (salted) aggregation for skewed group keys: partial
    * aggregate on (key, salt), then final aggregate on the key. Use for
    * algebraic aggregates (sum/count/min/max) whose partial results
    * combine; the partial shuffle spreads a hot key over `saltFactor`
    * reducers. (Catalyst's own partial aggregation already does this for
    * most plans — this helper exists for explicitly forcing the split
    * when a custom expression defeats partial pushdown.)
    */
  def saltedSum(df: DataFrame, keyCols: Seq[String], valueCol: String,
                saltFactor: Int): DataFrame = {
    require(saltFactor >= 1, "saltFactor must be >= 1")
    df.withColumn("__salt__", (rand(42) * saltFactor).cast("int"))
      .groupBy((keyCols :+ "__salt__").map(col): _*)
      .agg(sum(col(valueCol)).as("__partial__"))
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("__partial__")).as(s"sum_$valueCol"))
  }

  /** Bloom-filter semi-join reduction: build a Bloom filter over the
    * (small) build side's join key, broadcast it, and pre-filter the big
    * probe side BEFORE the shuffle join. At 100 TB this is the standard
    * way to avoid shuffling probe rows that cannot match — the filter is
    * KBs–MBs for millions of keys, and false positives only cost a little
    * extra shuffle (the exact join afterwards removes them), so the final
    * result is EXACTLY the plain join's. Expected items are taken from
    * `expectedItems` or counted with one scan of the build side.
    */
  def bloomFilteredJoin(big: DataFrame, small: DataFrame, keyCol: String,
                        joinType: String = "inner", fpp: Double = 0.01,
                        expectedItems: Long = -1L): DataFrame = {
    val allowed = Set("inner", "left_semi", "leftsemi")
    require(allowed.contains(joinType.toLowerCase.replace(" ", "")),
      s"bloomFilteredJoin supports inner/left_semi, got '$joinType' — outer " +
        "joins must keep non-matching probe rows, which the filter drops")
    val n = if (expectedItems > 0) expectedItems else small.select(keyCol).distinct().count()
    val bloom = small.stat.bloomFilter(keyCol, math.max(n, 1L), fpp)
    val bc = big.sparkSession.sparkContext.broadcast(bloom)
    // probe with the same representation stat.bloomFilter inserted:
    // longs for integral key types, strings for string keys
    import org.apache.spark.sql.types._
    val pred = big.schema(keyCol).dataType match {
      case LongType | IntegerType | ShortType | ByteType =>
        udf((k: java.lang.Long) => k != null && bc.value.mightContainLong(k))
          .apply(col(keyCol).cast("long"))
      case StringType =>
        udf((k: String) => k != null && bc.value.mightContainString(k)).apply(col(keyCol))
      case other => throw new IllegalArgumentException(
        s"bloomFilteredJoin: unsupported key type $other (integral or string)")
    }
    val prefiltered = big.filter(pred)
    if (Set("left_semi", "leftsemi").contains(joinType.toLowerCase.replace(" ", "")))
      prefiltered.join(small.select(keyCol).distinct(), Seq(keyCol), "left_semi")
    else prefiltered.join(small, Seq(keyCol), joinType)
  }
}
