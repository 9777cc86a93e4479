package graft.operators.basket

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket pair association rules — support / confidence / lift
  * for item pairs that co-occur in a basket (the retail affinity query;
  * Agrawal & Srikant 1994's frequent-2-itemsets, relationally).
  *
  * Semantics: a basket contains an item once (distinct applied); for
  * every unordered pair {a &lt; b} co-occurring in ≥ `minSupport`
  * baskets, emits both the pair count and the derived measures
  * `support = n_ab/N`, `confidence = n_ab/n_a` (rule a→b), and
  * `lift = n_ab·N/(n_a·n_b)`; pairs are kept one-directional (a &lt; b)
  * — mirror downstream for the b→a confidence.
  *
  * Scale shape: the APRIORI PRUNE does the heavy lifting — items below
  * `minSupport` on their own cannot form a frequent pair, so they are
  * dropped BEFORE pair generation (one broadcastable frequent-item
  * table; on a retail-shaped corpus this removes the long tail that
  * dominates row count). Pair generation (r20) collects each basket's
  * pruned items in ONE basket-keyed aggregation and streams ordered
  * pairs from a nested explode — no self-join, no second shuffle of the
  * membership table; cost stays Σ k_i² over PRUNED basket sizes,
  * bounded by the frequent-item count per basket, never |items|². One
  * (a, b) aggregation with map-side combine after. N rides in-plan as a
  * broadcast 1-row aggregate (no driver action).
  *
  * No reference counterpart; classic-OLAP extension per the builder
  * prompt.
  */
object MarketBasket {

  /** (a, b, n_ab, n_a, n_b, support, confidence, lift), a &lt; b.
    * Item column must be orderable (numeric or string).
    */
  def pairRules(df: DataFrame, basketCol: String, itemCol: String,
                minSupport: Long): DataFrame = {
    require(minSupport >= 1, "minSupport must be >= 1")
    val items = df.select(col(basketCol).as("b"), col(itemCol).as("i"))
      .distinct()
    val nBaskets = items.agg(countDistinct(col("b")).as("nb"))
    val itemCnt = items.groupBy(col("i")).agg(count(lit(1)).as("ni"))
    // apriori prune: an item below minSupport can't be in a frequent pair
    val frequent = itemCnt.filter(col("ni") >= minSupport)
    val fi = items.join(broadcast(frequent.select(col("i"))), "i")
    // r20 (guide §2.3/§2.4): collect each basket's pruned items into one
    // array (a single basket-keyed aggregation) and stream ordered pairs
    // out of a nested explode — replaces the basket-keyed SELF-JOIN,
    // whose both sides re-shuffled the pruned membership table. The pair
    // multiset is identical (fi is distinct per (b, i), so the array has
    // no duplicates; a < bb filters the same ordered pairs the old join
    // condition did). Nested explode keeps per-row memory O(basket).
    val pairs = fi.groupBy(col("b"))
      .agg(collect_list(col("i")).as("__items__"))
      .select(explode(col("__items__")).as("a"), col("__items__").as("__is__"))
      .select(col("a"), explode(col("__is__")).as("bb"))
      .filter(col("a") < col("bb"))
      .groupBy(col("a"), col("bb").as("b_item"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minSupport)
    pairs
      .join(frequent.select(col("i").as("a"), col("ni").as("n_a")), "a")
      .join(frequent.select(col("i").as("b_item"), col("ni").as("n_b")), "b_item")
      .crossJoin(broadcast(nBaskets))
      .select(col("a"), col("b_item").as("b"), col("n_ab"), col("n_a"), col("n_b"),
        round(col("n_ab").cast("double") / col("nb"), 6).as("support"),
        round(col("n_ab").cast("double") / col("n_a"), 6).as("confidence"),
        // single divide of exact long products: bit-identical cross-engine
        round((col("n_ab") * col("nb")).cast("double") /
          (col("n_a") * col("n_b")), 6).as("lift"))
  }
}
