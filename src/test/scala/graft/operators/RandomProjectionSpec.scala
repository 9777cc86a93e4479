package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.operators.similarity.RandomProjection

class RandomProjectionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("sign matrix is a pure function of (seed, j, i) and roughly balanced") {
    val a = RandomProjection.signMatrix(64, 16, seed = 7)
    val b = RandomProjection.signMatrix(64, 16, seed = 7)
    assert(a == b)
    assert(a != RandomProjection.signMatrix(64, 16, seed = 8))
    assert(a.flatten.forall(s => s == 1.0 || s == -1.0))
    val plus = a.flatten.count(_ == 1.0)
    assert(plus > 400 && plus < 624, s"badly unbalanced signs: $plus/1024")
  }

  test("projection matches a driver-side replay of the same dots") {
    import spark.implicits._
    val rnd = new scala.util.Random(9)
    val vecs = (1L to 20L).map(i => (i, Array.fill(8)(rnd.nextFloat() * 2 - 1)))
    val out = RandomProjection.project(vecs.toDF("id", "v"), "v", "proj",
        inDim = 8, outDim = 4, seed = 3)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](2)).toMap
    val signs = RandomProjection.signMatrix(8, 4, seed = 3)
    vecs.foreach { case (id, v) =>
      val want = signs.map { row =>
        var acc = 0.0
        for (i <- 0 until 8) acc += v(i).toDouble * row(i)
        BigDecimal(acc / math.sqrt(4.0))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
      assert(out(id) == want, s"id $id")
    }
  }

  test("JL property on the fixture shape: pairwise distances survive 64->16") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val vecs = (1L to 30L).map(i => (i, Array.fill(64)(rnd.nextGaussian().toFloat)))
    val proj = RandomProjection.project(vecs.toDF("id", "v"), "v", "p",
        inDim = 64, outDim = 16, seed = 7)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](2).toArray).toMap
    def d2(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val orig = vecs.map { case (i, v) => i -> v.map(_.toDouble) }.toMap
    // distance ratios concentrate around k/d-normalized 1: with k=16 the
    // JL bound at this n gives a loose band; assert the ratio stays in a
    // generous envelope for EVERY pair (a wrong sign matrix or scale
    // would blow this immediately)
    // k=16 gives sd ~ sqrt(2/k) ~ 0.35 per ratio; 435 pairs reach ~4 sd
    // tails (measured max 2.77 on this seed), so the envelope is wide —
    // a wrong scale or sign matrix is off by 4-16x and still trips it
    val ratios = for {
      i <- 1L to 30L; j <- (i + 1) to 30L
    } yield d2(proj(i), proj(j)) / d2(orig(i), orig(j))
    assert(ratios.forall(r => r > 0.15 && r < 3.5),
      s"min=${ratios.min} max=${ratios.max}")
    // and the bulk concentrates near 1 (median within 20%)
    val med = ratios.sorted.apply(ratios.size / 2)
    assert(med > 0.8 && med < 1.25, s"median=$med")
  }

  test("short vectors project to null, never a silent prefix") {
    import spark.implicits._
    val df = Seq((1L, Array.fill(8)(1.0f)), (2L, Array.fill(4)(1.0f)))
      .toDF("id", "v")
    val out = RandomProjection.project(df, "v", "p", inDim = 8, outDim = 2, seed = 1)
      .collect().map(r => r.getLong(0) -> r.isNullAt(2)).toMap
    assert(out == Map(1L -> false, 2L -> true))
  }
}
