package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.operators.graph.CooccurEdges

class CooccurEdgesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def edges(rows: Seq[(Long, Long)], minCount: Long = 1L,
                    cap: Int = 0): Map[(Long, Long), Long] = {
    import spark.implicits._
    CooccurEdges.edges(rows.toDF("bk", "i"), "bk", "i", minCount, cap)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
  }

  test("weight counts distinct shared baskets, both orientations, no self-pairs") {
    // baskets: 1 -> {a=10, b=20}, 2 -> {10, 20, 30}; (10,20) share 2
    val rows = Seq((1L, 10L), (1L, 20L), (2L, 10L), (2L, 20L), (2L, 30L))
    val e = edges(rows)
    assert(e((10L, 20L)) == 2L && e((20L, 10L)) == 2L)
    assert(e((10L, 30L)) == 1L && e((30L, 20L)) == 1L)
    assert(!e.keySet.exists(p => p._1 == p._2))
  }

  test("duplicate membership rows do not inflate weights") {
    val rows = Seq((1L, 10L), (1L, 10L), (1L, 20L), (1L, 20L))
    assert(edges(rows) == Map((10L, 20L) -> 1L, (20L, 10L) -> 1L))
  }

  test("minCount prunes the support tail") {
    val rows = Seq((1L, 10L), (1L, 20L), (2L, 10L), (2L, 20L), (2L, 30L))
    assert(edges(rows, minCount = 2L).keySet == Set((10L, 20L), (20L, 10L)))
  }

  test("maxBasketSize truncates a hot basket to its smallest items, deterministically") {
    // basket 9 has 5 items; cap 3 keeps {1,2,3} — pairs touching 4,5 from
    // basket 9 must vanish, small basket 1 is untouched
    val rows = (1L to 5L).map(i => (9L, i)) ++ Seq((1L, 4L), (1L, 5L))
    val e = edges(rows, cap = 3)
    assert(e.keySet == Set((1L, 2L), (2L, 1L), (1L, 3L), (3L, 1L),
      (2L, 3L), (3L, 2L), (4L, 5L), (5L, 4L)))
    // the explicit recall trade: (4,5) keeps only the SMALL basket's count
    assert(e((4L, 5L)) == 1L)
    // cap larger than every basket is a no-op
    assert(edges(rows, cap = 10) == edges(rows))
  }

  test("null basket or item rows are dropped; empty input yields empty edges") {
    import spark.implicits._
    val df = Seq[(Option[Long], Option[Long])](
      (Some(1L), Some(10L)), (None, Some(20L)), (Some(1L), None), (Some(1L), Some(30L)))
      .toDF("bk", "i")
    val out = CooccurEdges.edges(df, "bk", "i")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((10L, 30L), (30L, 10L)))
    assert(CooccurEdges.edges(Seq.empty[(Long, Long)].toDF("bk", "i"), "bk", "i")
      .count() == 0)
  }

  test("pmi: hand-computed basket probabilities, exact at 6 dp") {
    import spark.implicits._
    // N=4 baskets; n10=3, n20=3, n30=2; n(10,20)=2, n(10,30)=1, n(20,30)=1
    val rows = Seq((1L, 10L), (1L, 20L), (2L, 10L), (2L, 20L),
      (3L, 10L), (3L, 30L), (4L, 20L), (4L, 30L))
    val out = CooccurEdges.edgesWithPmi(rows.toDF("bk", "i"), "bk", "i")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(out((10L, 20L)) == ((2L, -0.117783, 0.5)))   // ln(2*4/9), 2/(3+3-2)
    assert(out((20L, 10L)) == ((2L, -0.117783, 0.5)))   // symmetric
    assert(out((10L, 30L)) == ((1L, -0.405465, 0.25)))  // ln(1*4/6), 1/(3+2-1)
    assert(out((20L, 30L)) == ((1L, -0.405465, 0.25)))
    // weight column identical to the plain edges() output
    val plain = CooccurEdges.edges(rows.toDF("bk", "i"), "bk", "i")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out.view.mapValues(_._1).toMap == plain)
  }

  test("property: capped weights are pointwise <= uncapped; equal once cap >= max basket") {
    val rnd = new scala.util.Random(23)
    for (trial <- 1 to 3) {
      val rows = Seq.fill(200)((rnd.nextInt(15).toLong, rnd.nextInt(30).toLong))
      val full = edges(rows)
      val maxBasket = rows.distinct.groupBy(_._1).values.map(_.size).max
      for (cap <- Seq(2, 4, 8)) {
        val capped = edges(rows, cap = cap)
        assert(capped.keySet.subsetOf(full.keySet), s"trial $trial cap $cap")
        capped.foreach { case (k, w) =>
          assert(w <= full(k), s"trial $trial cap $cap pair $k: $w > ${full(k)}")
        }
      }
      assert(edges(rows, cap = maxBasket) == full, s"trial $trial")
    }
  }

  test("matches the former inline SQL formulation (s45's uncapped shape)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(300)((rnd.nextInt(40).toLong, rnd.nextInt(25).toLong))
    val df = rows.toDF("bk", "i")
    df.createOrReplaceTempView("cooc_it")
    val inline = spark.sql(
      """SELECT x.i AS a, y.i AS b, COUNT(*) AS weight
        |FROM (SELECT DISTINCT bk, i FROM cooc_it) x
        |JOIN (SELECT DISTINCT bk, i FROM cooc_it) y
        |  ON x.bk = y.bk AND x.i != y.i
        |GROUP BY x.i, y.i HAVING COUNT(*) >= 2""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(edges(rows, minCount = 2L) == inline)
  }
}
