package graft.operators.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Co-occurrence edge builder: (basket, item) membership rows → weighted
  * item×item edges, `weight` = number of shared baskets. The standard
  * "co-purchase / co-view / co-citation graph" constructor feeding the
  * graph tier (k-core, TrustRank, PageRank, communities) — s45 builds
  * its co-purchase graph through this operator.
  *
  * THE quadratic hazard (VERDICT r15: the last unguarded item×item
  * self-join reachable from the DSL): a basket of n items contributes
  * n·(n−1) pairs, so one hot basket — a bot account, a crawler session,
  * a catalog-wide order — can dominate the whole shuffle (10⁶ items →
  * 10¹² pairs from a single key). `maxBasketSize` is the guard, same
  * posture as n-gram Jaccard's `maxDocFreq` cap (p9): baskets with more
  * distinct items are TRUNCATED to their `maxBasketSize` smallest items
  * (ordered by the item column), bounding per-basket pair work at cap².
  * The truncation is deterministic (order by item value, not arrival)
  * so output stays hash-exact and SQL-replayable (the p116 oracle
  * replays it as a `ROW_NUMBER() ... <= cap` prune). Explicit recall
  * trade: pairs whose only shared baskets were truncated away lose
  * weight or disappear — 0 disables the cap.
  *
  * Scale shape (100 TB): ONE basket-keyed aggregation collects each
  * basket's deduplicated, sorted, capped item array (r20 — this replaces
  * the old dedup shuffle + oversize scan + truncation window + basket-
  * keyed self-join); pairs then stream out of a nested explode with no
  * join and no second membership shuffle, and the edge aggregation is a
  * hash agg with map-side partial combine. The pair blowup stays
  * per-basket and capped — no cartesian.
  *
  * Determinism: pure integer counting over a deterministic membership
  * set — hash-exact at any executor count.
  *
  * No reference counterpart; graph-analytics extension per the builder
  * prompt.
  */
object CooccurEdges {

  /** Weighted co-occurrence edges. Both orientations are emitted
    * ((a,b) and (b,a), like an undirected adjacency list); self-pairs
    * are excluded; membership rows are deduplicated, so `weight` counts
    * DISTINCT shared baskets.
    *
    * @param maxBasketSize 0 = no cap; > 0 truncates each larger basket
    *                      to its `maxBasketSize` smallest items
    * @param minCount      drop edges with weight below this (support
    *                      threshold — prunes the long co-occurrence tail
    *                      before it ships to a graph fixpoint)
    * @return (a, b, weight)
    */
  def edges(df: DataFrame, basketCol: String, itemCol: String,
            minCount: Long = 1L, maxBasketSize: Int = 0): DataFrame =
    pairCounts(basketArrays(df, basketCol, itemCol, maxBasketSize), minCount)

  /** [[edges]] plus two association strengths per edge:
    * `pmi = ln(n_ab · N / (n_a · n_b))` over basket probabilities (N =
    * distinct baskets, n_x = baskets containing x; all from the SAME
    * capped membership set, so the cap's semantics stay consistent) —
    * the classic signal that separates "frequent because both items are
    * popular" from genuine affinity — and `jaccard = n_ab /
    * (n_a + n_b − n_ab)`, the set-overlap weight item-item
    * collaborative filtering uses. Both rounded to 6 dp; the count
    * algebra is exact integers and each double expression replays
    * verbatim in SQL (p121). Two extra hash aggregations (item counts,
    * a 1-row basket total broadcast by the cross join) — no new shuffle
    * shape.
    *
    * @return (a, b, weight, pmi, jaccard)
    */
  def edgesWithPmi(df: DataFrame, basketCol: String, itemCol: String,
                   minCount: Long = 1L, maxBasketSize: Int = 0): DataFrame = {
    val ba = basketArrays(df, basketCol, itemCol, maxBasketSize)
    val pairs = pairCounts(ba, minCount)
    // memberships replayed from the basket arrays: one explode instead of
    // a second dedup shuffle; one basket = one array row, so the basket
    // total is a plain row count
    val itemN = ba.select(explode(col("items")).as("i"))
      .groupBy(col("i")).agg(count(lit(1)).as("__ni__"))
    val total = ba.agg(count(lit(1)).as("__nb__"))
    pairs
      .join(itemN.select(col("i").as("a"), col("__ni__").as("__na__")), Seq("a"))
      .join(itemN.select(col("i").as("b"), col("__ni__").as("__nb2__")), Seq("b"))
      .crossJoin(broadcast(total))
      .withColumn("pmi", round(log(
        col("weight").cast("double") * col("__nb__").cast("double") /
          (col("__na__").cast("double") * col("__nb2__").cast("double"))), 6))
      .withColumn("jaccard", round(
        col("weight").cast("double") /
          (col("__na__") + col("__nb2__") - col("weight")).cast("double"), 6))
      .select(col("a"), col("b"), col("weight"), col("pmi"), col("jaccard"))
  }

  /** One sorted item array per basket, deduplicated, hot baskets
    * truncated to their `maxBasketSize` smallest items. r20 rewrite
    * (guide §2.3/§2.4): `collect_set` + `sort_array` + `slice` in ONE
    * basket-keyed aggregation replaces the old dedup shuffle + oversize
    * scan + anti/semi joins + per-basket `row_number` window + union —
    * and downstream, the basket-keyed SELF-JOIN becomes a nested explode
    * of the array (no join, no second shuffle of the memberships). The
    * item set, truncation rule (smallest by item value, deterministic)
    * and the resulting pair multiset are identical. Per-basket memory is
    * O(basket) for the set buffer (same order as the old sort window's
    * run); the quadratic pair-count hazard is unchanged and still capped
    * by `maxBasketSize`.
    *
    * UNCAPPED CONTRACT (ADVICE r20): with `maxBasketSize <= 0` the
    * hottest basket's item set is materialized in ONE aggregation buffer
    * — the pre-r20 membership self-join streamed/spilled that key group
    * instead, so the uncapped degradation mode moved from "slow quadratic
    * output" to "executor memory must hold the largest basket". At any
    * scale where a single basket's distinct-item set could challenge
    * executor memory (bot carts, crawler sessions), pass a cap — that is
    * the operator's documented posture for 100 TB anyway (the quadratic
    * pair hazard bites at cap² long before the buffer does).
    */
  private def basketArrays(df: DataFrame, basketCol: String,
                           itemCol: String, maxBasketSize: Int): DataFrame = {
    val ba = df.select(col(basketCol).as("bk"), col(itemCol).as("i"))
      .filter(col("bk").isNotNull && col("i").isNotNull)
      .groupBy(col("bk"))
      .agg(sort_array(collect_set(col("i"))).as("items"))
    if (maxBasketSize <= 0) ba
    else ba.select(col("bk"), slice(col("items"), 1, maxBasketSize).as("items"))
  }

  private def pairCounts(ba: DataFrame, minCount: Long): DataFrame = {
    require(minCount >= 1, "minCount must be >= 1")
    // nested explode, not transform+flatten: two streaming generators keep
    // per-row memory O(basket) even on an uncapped hot basket, where a
    // flattened pair array would allocate O(basket²) at once
    ba.select(explode(col("items")).as("a"), col("items").as("__is__"))
      .select(col("a"), explode(col("__is__")).as("b"))
      .filter(col("a") =!= col("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("weight"))
      .filter(col("weight") >= minCount)
  }
}
