package graft.operators.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-pass undirected edge mirroring (r21).
  *
  * Every undirected graph operator used to build its symmetric edge set as
  * `e0.union(e0.select(v as u, u as v))` — which embeds the ENTIRE upstream
  * of `e0` twice in one plan. When the caller passes a derived frame (the
  * basket-pair aggregation feeding p73/p106/p120/p126/p127), AQE
  * re-optimizes the two subtrees independently, ReuseExchange cannot be
  * relied on to serve them from one shuffle (the p97 lesson), and the whole
  * build runs twice. Exploding a 2-element array of (fwd, rev) structs
  * emits both orientations from ONE pass — a pipelined Generate, no second
  * subtree, no materialization — and yields the exact same row multiset,
  * so everything downstream (distinct, persist, joins) is unchanged.
  *
  * Columns: the first two names are swapped in the mirrored row; `extra`
  * columns ride along unchanged (e.g. Sssp's weight). Both key columns
  * must share a type — the same constraint the old union imposed.
  */
private[graft] object EdgeMirror {

  def mirror(df: DataFrame, u: String = "u", v: String = "v",
             extra: Seq[String] = Nil): DataFrame = {
    val fwd = struct((Seq(col(u).as(u), col(v).as(v)) ++ extra.map(col)): _*)
    val rev = struct((Seq(col(v).as(u), col(u).as(v)) ++ extra.map(col)): _*)
    df.select(explode(array(fwd, rev)).as("__m__"))
      .select((Seq(col(s"__m__.$u").as(u), col(s"__m__.$v").as(v)) ++
        extra.map(c => col(s"__m__.$c").as(c))): _*)
  }
}
