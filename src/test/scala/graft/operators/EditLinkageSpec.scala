package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.operators.text.EditLinkage

class EditLinkageSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def link(l: Seq[(Long, String)], r: Seq[(Long, String)],
                   maxDist: Int, q: Int = 3, cap: Long = 0L) = {
    import spark.implicits._
    EditLinkage.fuzzyJoin(l.toDF("id", "s"), "id", "s",
        r.toDF("id", "s"), "id", "s", maxDist, q, cap)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getInt(4))).toSet
  }

  test("typos within maxDist link; unrelated strings do not") {
    val clean = Seq((1L, "golden retriever"), (2L, "border collie"),
      (3L, "great dane"))
    val dirty = Seq((10L, "goldn retriever"),  // 1 deletion
      (20L, "bordr colliex"),                  // deletion + append = 2
      (30L, "pomeranian"))                     // unrelated
    assert(link(dirty, clean, maxDist = 2) ==
      Set((10L, 1L, 1), (20L, 2L, 2)))
  }

  test("exact duplicates come back at dist 0; maxDist 0 is exact match") {
    val a = Seq((1L, "alpha beta"), (2L, "gamma delta"))
    val b = Seq((5L, "alpha beta"), (6L, "gamma delt"))
    assert(link(a, b, maxDist = 0) == Set((1L, 5L, 0)))
    assert(link(a, b, maxDist = 1) == Set((1L, 5L, 0), (2L, 6L, 1)))
  }

  test("length-band prune never kills a true match at the boundary") {
    // lengths differ by exactly maxDist (two appended chars)
    val a = Seq((1L, "abcdefghij"))
    val b = Seq((2L, "abcdefghijXY"))
    assert(link(a, b, maxDist = 2) == Set((1L, 2L, 2)))
    // and one past the band is correctly impossible (ed >= len diff = 3)
    val c = Seq((3L, "abcdefghijXYZ"))
    assert(link(a, c, maxDist = 2).isEmpty)
  }

  test("completeness bound holds: no false negatives when len >= q(d+1)") {
    // exhaustive check against a naive cross product on a seeded corpus
    val rnd = new scala.util.Random(77)
    val vocab = Vector("castle", "stream", "meadow", "copper", "silver")
    def word() = {
      val base = vocab(rnd.nextInt(vocab.size)) + vocab(rnd.nextInt(vocab.size))
      rnd.nextInt(3) match {
        case 0 => base
        case 1 => base.updated(rnd.nextInt(base.length), 'z') // substitute
        case 2 =>
          val i = 1 + rnd.nextInt(base.length - 1)
          base.substring(0, i) + base.substring(math.min(i + 1, base.length)) // delete
      }
    }
    val a = (1L to 40L).map(i => (i, word()))
    val b = (101L to 140L).map(i => (i, word()))
    val got = link(a, b, maxDist = 2)
    val want = (for {
      (ai, as) <- a; (bi, bs) <- b
      d = naiveLev(as, bs) if d <= 2
    } yield (ai, bi, d)).toSet
    assert(got == want, s"missing=${want -- got} extra=${got -- want}")
  }

  test("strings shorter than q never index (and never throw)") {
    val a = Seq((1L, "ab"), (2L, "abcd"))
    val b = Seq((3L, "ab"), (4L, "abcd"))
    // "ab" has no 3-gram: documented slip-through, not an error
    assert(link(a, b, maxDist = 1) == Set((2L, 4L, 0)))
  }

  test("hot-gram cap drops capped pairs deterministically") {
    // every right string shares the gram "aaa"; cap 2 drops that gram,
    // and the pair survives only via another sub-cap gram
    val l = Seq((1L, "aaabbb"))
    val r = Seq((10L, "aaabbc"), (11L, "aaaxyz"), (12L, "aaapqr"))
    assert(link(l, r, maxDist = 2, cap = 2L) == Set((1L, 10L, 1)))
    // uncapped, the same call also verifies (and rejects) the far pairs
    assert(link(l, r, maxDist = 2) == Set((1L, 10L, 1)))
  }

  private def naiveLev(s: String, t: String): Int = {
    val d = Array.tabulate(s.length + 1, t.length + 1)((i, j) =>
      if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to s.length; j <- 1 to t.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (s(i - 1) == t(j - 1)) 0 else 1))
    d(s.length)(t.length)
  }
}
