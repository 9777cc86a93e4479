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

  test("count filter keeps repeat-gram true pairs (distinct-gram bound, r20)") {
    // repeated grams are the risky case for the distinct-gram count-filter
    // bound (|D(s)| << |s| − q + 1): verify against the naive cross product
    val reps = Seq((1L, "abababababab"), (2L, "xyxyxyxyxyxy"),
      (3L, "aaaaaaabbbbb"), (4L, "ababababab"))
    val dirt = Seq((11L, "abababababaZ"), // 1 sub at the tail
      (12L, "xyxyxyxyxy"),                // 2 deletions
      (13L, "aaaaaabbbbb"),               // 1 deletion
      (14L, "babababab"))                 // 1 front deletion, repeat-heavy
    val got = link(dirt, reps, maxDist = 2)
    val want = (for {
      (ai, as) <- dirt; (bi, bs) <- reps
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

  test("maxGramFreq recall table: measured pair recall at three cap levels (p105 fixture)") {
    // the cap's recall trade, MEASURED (VERDICT r15 #5): p105's clean
    // registry + typo'd feed at sf0.01, capped candidate generation vs
    // the uncapped ground truth
    val spark2 = spark
    import spark2.implicits._
    import org.apache.spark.sql.functions._
    val nameExpr =
      """concat(
        |  CASE CAST((c_custkey * 7) % 8 AS INT)
        |    WHEN 0 THEN 'amber' WHEN 1 THEN 'birch' WHEN 2 THEN 'cedar'
        |    WHEN 3 THEN 'delta' WHEN 4 THEN 'ember' WHEN 5 THEN 'fjord'
        |    WHEN 6 THEN 'grove' ELSE 'haven' END, ' ',
        |  CASE CAST((c_custkey div 8) % 8 AS INT)
        |    WHEN 0 THEN 'mill' WHEN 1 THEN 'ford' WHEN 2 THEN 'gate'
        |    WHEN 3 THEN 'field' WHEN 4 THEN 'stone' WHEN 5 THEN 'brook'
        |    WHEN 6 THEN 'ridge' ELSE 'marsh' END, ' ',
        |  CAST(c_custkey % 500 AS STRING))""".stripMargin
    val clean = spark.read.parquet("/root/testdata/sf0.01/customer.parquet")
      .filter($"c_custkey" < 800)
      .select($"c_custkey".as("rid"), expr(nameExpr).as("rs"))
    val dirty = clean.select(($"rid" + 100000L).as("lid"),
      expr("""CASE CAST(rid % 4 AS INT)
        | WHEN 1 THEN concat(substring(rs, 1, 3), substring(rs, 5))
        | WHEN 2 THEN concat(substring(rs, 1, 1), 'x', substring(rs, 3))
        | WHEN 3 THEN concat(substring(rs, 1, 5), 'q', substring(rs, 6))
        | ELSE rs END""".stripMargin).as("ls"))
    def pairs(cap: Long, both: Boolean): Set[(Long, Long)] =
      EditLinkage.fuzzyJoin(dirty, "lid", "ls", clean, "rid", "rs",
          maxDist = 2, maxGramFreq = cap, capBoth = both)
        .select("l_id", "r_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = pairs(0L, both = false)
    assert(truth.nonEmpty)
    def recallOf(both: Boolean): Map[Long, Double] = Seq(256L, 64L, 16L).map { cap =>
      val r = (pairs(cap, both) & truth).size.toDouble / truth.size
      println(f"[recall-table] maxGramFreq=$cap%4d capBoth=$both%-5s " +
        f"pair_recall=$r%.4f (truth=${truth.size})")
      cap -> r
    }.toMap
    val right = recallOf(both = false)
    val bothR = recallOf(both = true)
    // monotone: a looser cap can only keep more pairs; the both-side cap
    // can only drop more than the right-only cap
    assert(right(256L) >= right(64L) && right(64L) >= right(16L))
    Seq(256L, 64L, 16L).foreach(c => assert(bothR(c) <= right(c)))
    // measured values, pinned exactly (deterministic fixture + cap):
    // cited in EditLinkage's scaladoc — update BOTH on any fixture change
    assert(right(256L) == 1.0 && bothR(256L) == 1.0)
    assert(math.abs(bothR(64L) - 0.7891) < 0.0001, s"both 64: ${bothR(64L)}")
    assert(math.abs(bothR(16L) - 0.4044) < 0.0001, s"both 16: ${bothR(16L)}")
    // right-only values asserted loosely here, exactly in the scaladoc
    // (printed above): re-pin on any fixture change
    assert(right(64L) >= bothR(64L) && right(16L) >= bothR(16L))
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
