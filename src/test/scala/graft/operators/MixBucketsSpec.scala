package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.operators.sampling.TemperatureMix
import graft.operators.text.PerplexityBuckets

/** Operator-level semantics for the round-10 additions: CCNet perplexity
  * bucketing (p53 carries the oracle parity) and XLM-R/mT5 temperature
  * resampling (p54 likewise).
  */
class MixBucketsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def docs(rows: (Long, String, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "lang", "text")
  }

  // ---- PerplexityBuckets ----

  test("bucket assignment matches the exact ceil-tertile rule on the operator's own xent") {
    val d = docs((1L to 9L).map { i =>
      val fluent = "the cat sat on the mat and then it ran away home".split(" ")
      // progressively reverse a suffix: higher i => less corpus-typical order
      val t = (fluent.take(10 - i.toInt) ++ fluent.drop(10 - i.toInt).reverse)
        .mkString(" ")
      (i, "en", t + s" tail$i")
    }: _*)
    val out = PerplexityBuckets.assign(d, "doc_id", "text", "lang", nBuckets = 3)
      .collect()
    assert(out.length == 9)
    // reference model of the contract: cutoff_j = min xent whose
    // cumulative count satisfies cum * n >= tot * j; bucket = 1 + #cuts
    // strictly below this row's xent
    val xs = out.map(_.getAs[Double]("xent")).sorted
    val tot = xs.length
    def cut(j: Int): Double = xs.zipWithIndex
      .collectFirst { case (v, i) if (i + 1) * 3 >= tot.toLong * j => v }.get
    val (c1, c2) = (cut(1), cut(2))
    out.foreach { r =>
      val x = r.getAs[Double]("xent")
      val want = 1 + (if (x > c1) 1 else 0) + (if (x > c2) 1 else 0)
      assert(r.getAs[Int]("ppl_bucket") == want,
        s"doc ${r.getAs[Long]("doc_id")} xent=$x bucket=${r.getAs[Int]("ppl_bucket")} want=$want")
    }
    // bucket 1 = lowest xent (head), monotone in xent
    val sorted = out.sortBy(_.getAs[Double]("xent")).map(_.getAs[Int]("ppl_bucket")).toSeq
    assert(sorted == sorted.sorted)
  }

  test("value ties land in one bucket; languages bucket independently") {
    // two langs; fr docs all identical text => one xent value => all in bucket 1
    val d = docs(
      (1L, "en", "a b c d e f g h i j"),
      (2L, "en", "a b c d e f g h i j"),
      (3L, "en", "j i h g f e d c b a"),
      (4L, "fr", "un deux trois quatre cinq"),
      (5L, "fr", "un deux trois quatre cinq"),
      (6L, "fr", "un deux trois quatre cinq"))
    val out = PerplexityBuckets.assign(d, "doc_id", "text", "lang", nBuckets = 3)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("ppl_bucket")).toMap
    assert(out(4L) == 1 && out(5L) == 1 && out(6L) == 1)
    assert(out(1L) == out(2L)) // identical text, identical bucket
  }

  test("documents without a bigram are dropped") {
    val d = docs((1L, "en", "solo"), (2L, "en", "two words here and more"))
    val out = PerplexityBuckets.assign(d, "doc_id", "text", "lang")
    assert(out.collect().map(_.getAs[Long]("doc_id")).toSet == Set(2L))
  }

  // ---- TemperatureMix ----

  test("alpha=1 reproduces proportional rates; alpha=0 equalizes expected counts") {
    val d = docs(
      (1L to 80L).map(i => (i, "en", s"text $i")) ++
      (81L to 100L).map(i => (i, "fr", s"texte $i")): _*)
    val r1 = TemperatureMix.rates(d, "lang", alpha = 1.0, targetRows = 50)
    // proportional: every domain keeps the same rate k/N
    assert(math.abs(r1("en") - 0.5) < 1e-6 && math.abs(r1("fr") - 0.5) < 1e-6)
    val r0 = TemperatureMix.rates(d, "lang", alpha = 0.0, targetRows = 50)
    // uniform over domains: 25 expected from each => en 25/80, fr 25/20
    assert(math.abs(r0("en") - 0.3125) < 1e-6)
    assert(math.abs(r0("fr") - 1.25) < 1e-6)
  }

  test("alpha between 0 and 1 up-samples the low-resource domain; E[rows] ~ target") {
    val d = docs(
      (1L to 180L).map(i => (i, "en", s"text $i")) ++
      (181L to 200L).map(i => (i, "fr", s"texte $i")): _*)
    val r = TemperatureMix.rates(d, "lang", alpha = 0.3, targetRows = 100)
    assert(r("fr") > r("en")) // flattened toward uniform
    // expected total = sum over domains n_d * r_d ~ 100 (rounding at 6dp)
    val expTotal = 180 * r("en") + 20 * r("fr")
    assert(math.abs(expTotal - 100.0) < 0.01)
    val out = TemperatureMix.resample(d, "lang", "doc_id", alpha = 0.3,
      targetRows = 100, seed = 42)
    // deterministic: same seed, same rows
    val a = out.collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("copy_idx"))).toSet
    val b = TemperatureMix.resample(d, "lang", "doc_id", alpha = 0.3,
      targetRows = 100, seed = 42)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("copy_idx"))).toSet
    assert(a == b)
    // realized count within a loose CLT band of the target
    assert(math.abs(a.size - 100) < 30, s"realized ${a.size} vs target 100")
  }

  test("resample plan is shuffle-free after the rate fit") {
    val d = docs((1L to 50L).map(i => (i, if (i % 5 == 0) "fr" else "en", s"t $i")): _*)
    val out = TemperatureMix.resample(d, "lang", "doc_id", targetRows = 30)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }
}
