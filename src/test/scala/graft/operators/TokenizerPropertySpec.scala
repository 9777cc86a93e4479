package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.operators.text.BpeCodec

/** ScalaCheck cross-check of the pair-indexed heap BpeCodec against the
  * obvious sequential reference (scan the merge table in rank order, one
  * greedy left-to-right pass per rank). LmTokenizerSpec pins the codec on
  * trained tables; this property feeds ADVERSARIAL tables a trainer never
  * produces — duplicate pairs, merges whose output is another merge's
  * input, pairs that only exist mid-word after earlier merges — where the
  * heap's rank-skipping (`r > ptr`) and re-seeding logic could diverge.
  */
class TokenizerPropertySpec extends AnyFunSuite {

  private def naive(w: String, merges: Seq[(String, String)]): Seq[String] = {
    var syms: Seq[String] = w.split("").toSeq
    for ((l, r) <- merges) {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      for (x <- syms) {
        if (out.nonEmpty && out.last == l && x == r) out(out.length - 1) = l + r
        else out += x
      }
      syms = out.toSeq
    }
    syms
  }

  test("property: BpeCodec equals the sequential-scan reference on arbitrary merge tables") {
    val sym = Gen.oneOf("a", "b", "c")
    val genWord = Gen.choose(1, 12).flatMap(l => Gen.listOfN(l, sym).map(_.mkString))
    val piece = Gen.choose(1, 3).flatMap(l => Gen.listOfN(l, sym).map(_.mkString))
    val genMerges = Gen.choose(0, 12).flatMap(k =>
      Gen.listOfN(k, Gen.zip(piece, piece)))
    val prop = Prop.forAll(genWord, genMerges) { (w, merges) =>
      val got = new BpeCodec(merges).encodeWord(w).toSeq
      val want = naive(w, merges)
      if (got != want) println(s"CODEC MISMATCH w=$w merges=$merges got=$got want=$want")
      got == want
    }
    val r = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(500).withWorkers(1), prop)
    assert(r.passed, r.status.toString)
  }
}
