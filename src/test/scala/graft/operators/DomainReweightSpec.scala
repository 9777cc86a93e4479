package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.operators.sampling.DomainReweight

class DomainReweightSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("identical domain distributions get zero excess and share-proportional weights") {
    import spark.implicits._
    val docs = Seq(("a", "x y"), ("a", "x y"), ("b", "x y"))
      .toDF("dom", "text")
    val out = DomainReweight.weights(docs, "dom", "text")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(3), r.getDouble(4)))
      .sortBy(_._1)
    // p_d == p_corpus for both -> KL = 0, weights reduce to token shares
    assert(out(0) == (("a", 4L, 0.0, 0.666667)))
    assert(out(1) == (("b", 2L, 0.0, 0.333333)))
  }

  test("disjoint vocabularies: excess = ln(n/n_d) and T=1 weights equalize exactly") {
    import spark.implicits._
    val docs = Seq(("a", "x x x x"), ("b", "y y")).toDF("dom", "text")
    val out = DomainReweight.weights(docs, "dom", "text")
      .collect().map(r => (r.getString(0), r.getDouble(3), r.getDouble(4)))
      .sortBy(_._1).toSeq
    // KL(d||corpus) = ln(n/n_d) when vocabularies are disjoint, so
    // share_d * exp(KL) = 1 and T=1 weights near-equalize — "near"
    // because the excess is rounded to 4 dp BEFORE the exponent (the
    // cross-engine determinism contract), so replay the same rounding
    val exA = math.rint(math.log(6.0 / 4) * 1e4) / 1e4
    val exB = math.rint(math.log(3.0) * 1e4) / 1e4
    val (wA, wB) = ((4.0 / 6) * math.exp(exA), (2.0 / 6) * math.exp(exB))
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    assert(out == Seq(("a", exA, r6(wA / (wA + wB))), ("b", exB, r6(wB / (wA + wB)))))
    assert(out.map(_._3).forall(w => math.abs(w - 0.5) < 1e-4))
  }

  test("high temperature flattens the exponent back to raw shares") {
    import spark.implicits._
    val docs = Seq(("a", "x x x x"), ("b", "y y")).toDF("dom", "text")
    val out = DomainReweight.weights(docs, "dom", "text", temperature = 1e9)
      .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    assert(out("a") == 0.666667 && out("b") == 0.333333)
  }

  test("weights always normalize to 1 and empty tokens are ignored") {
    import spark.implicits._
    val docs = Seq(("a", "x  x"), ("b", "x y z"), ("c", "z z q"))
      .toDF("dom", "text")
    val rows = DomainReweight.weights(docs, "dom", "text", temperature = 0.7)
      .collect()
    val total = rows.map(_.getDouble(4)).sum
    assert(math.abs(total - 1.0) < 1e-5, s"weights sum $total")
    // double space in "x  x" must not create an empty token
    assert(rows.find(_.getString(0) == "a").get.getLong(1) == 2L)
  }

  test("plan shape: the (domain,word) count table is cached so the corpus shuffles once") {
    import spark.implicits._
    val docs = Seq(("a", "x y"), ("b", "y z")).toDF("dom", "text")
    val plan = DomainReweight.weights(docs, "dom", "text")
      .queryExecution.optimizedPlan.toString
    // all four consumers (word marginal, domain totals, grand total, KL
    // join) must read the cached count table, not re-run the explode
    assert(plan.contains("InMemoryRelation"), plan)
    assert(!plan.replaceFirst("(?s)InMemoryRelation.*", "").contains("Generate"), plan)
  }
}
