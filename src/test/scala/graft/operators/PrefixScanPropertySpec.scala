package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.TestSpark

/** ScalaCheck cross-checks of the two distributed prefix-scan
  * reformulations against naive sequential references — partition and
  * chunk BOUNDARIES are exactly where these can silently break, and a
  * pinned fixture only exercises one boundary layout:
  *  - SequencePack.chunkLayout (two-phase range-partitioned prefix sum)
  *    vs a plain sorted cumulative sum — integer algebra, must be EXACT,
  *    across several forced partition counts;
  *  - Ewma.smooth (segmented scan + carry fold) vs the textbook
  *    recurrence — algebraically equal but a different IEEE op order by
  *    design (the bit-exact contract is vs its own two-phase replay, the
  *    s-entry oracle), so the cross-check uses 1e-9 relative tolerance,
  *    with chunk=3 forcing many carry hand-offs.
  */
class PrefixScanPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def check(prop: Prop, n: Int): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n)
      .withWorkers(1), prop)
    assert(r.passed, r.status.toString)
  }

  test("property: chunkLayout equals the naive cumulative layout at any partition count") {
    import spark.implicits._
    val genDocs = for {
      n    <- Gen.choose(1, 40)
      toks <- Gen.listOfN(n, Gen.choose(0L, 50L))
      p    <- Gen.oneOf(1, 2, 5, 9)
    } yield (toks.zipWithIndex.map { case (t, i) => (i.toLong, t) }, p)
    val seqLen = 16
    check(Prop.forAll(genDocs) { case (docs, parts) =>
      val got = graft.operators.text.SequencePack.chunkLayout(
          docs.toDF("doc_id", "n_tok"), "doc_id", "n_tok", seqLen,
          partitions = parts)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5))).toSet
      var cum = 0L
      val want = docs.filter(_._2 > 0).sortBy(_._1).map { case (id, n) =>
        val start = cum; cum += n
        (id, n, start, start / seqLen, (cum - 1) / seqLen, start % seqLen)
      }.toSet
      if (got != want) println(s"PACK MISMATCH parts=$parts docs=$docs got=$got want=$want")
      got == want
    }, n = 8)
  }

  test("property: segmented EWMA matches the textbook recurrence within 1e-9 relative") {
    import spark.implicits._
    val genSeries = for {
      k  <- Gen.choose(1, 3)
      n  <- Gen.choose(1, 25)
      xs <- Gen.listOfN(k * n, Gen.choose(-100.0, 100.0))
    } yield xs.zipWithIndex.map { case (x, i) => ((i % k).toLong, (i / k).toLong, x) }
    val alpha = 0.3
    check(Prop.forAll(genSeries) { rows =>
      val got = graft.operators.temporal.Ewma.smooth(
          rows.toDF("k", "t", "x"), "k", "t", "x", alpha, chunk = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
      val want = rows.groupBy(_._1).flatMap { case (k, es) =>
        var s = 0.0
        es.sortBy(_._2).zipWithIndex.map { case ((_, t, x), i) =>
          s = if (i == 0) x else alpha * x + (1 - alpha) * s
          (k, t) -> s
        }
      }
      got.keySet == want.keySet && want.forall { case (kt, w) =>
        val g = got(kt)
        math.abs(g - w) <= 1e-9 * math.max(1.0, math.max(math.abs(g), math.abs(w)))
      }
    }, n = 8)
  }
}
