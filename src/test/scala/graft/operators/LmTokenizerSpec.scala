package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.operators.text.{BpeTrain, UnigramLm}

/** Unigram-LM scoring and BPE merge learning (the p26–p28 CORRECTNESS
  * entries cover oracle parity; these pin operator-level semantics:
  * exact-vs-capped vocab, tie-breaking, greedy non-overlapping merges).
  */
class LmTokenizerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  // ---- UnigramLm ----

  test("exact cross-entropy matches hand-computed values") {
    // counts: a:2 b:2 c:1, N=5
    val out = UnigramLm.crossEntropy(docs(1L -> "a a b", 2L -> "b c"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out(1L) == ((3L, 0.9163)))  // -ln(2/5)
    assert(out(2L) == ((2L, 1.2629)))  // (-ln(2/5)-ln(1/5))/2
  }

  test("capped vocab pools OOV tokens into one UNK mass") {
    // counts: a:2 b:2 c:1 d:1, N=6; topV=2 keeps {a,b}; oov mass = 2
    val out = UnigramLm.crossEntropy(
        docs(1L -> "a a b b", 2L -> "c d"), "doc_id", "text", topV = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out(2L) == 1.0986) // both tokens score ln(6/2) = ln 3
    assert(out(1L) == 1.0986) // in-vocab: -avg ln(2/6) = ln 3 too
  }

  test("token-less documents are dropped") {
    val ids = UnigramLm.crossEntropy(docs(1L -> "a b", 2L -> ""), "doc_id", "text")
      .collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L))
  }

  // ---- BpeTrain ----

  test("learnMerges reproduces the reference implementation on the pinned corpus") {
    val got = BpeTrain.learnMerges(docs(
        1L -> "the cat sat on the mat",
        2L -> "the cats sat on the mats",
        3L -> "a cat and a rat",
        4L -> "the rats and the cats"), "text", 6)
      .orderBy("rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(got == Seq((1, "a", "t", 10L), (2, "h", "e", 6L), (3, "t", "he", 6L),
      (4, "at", "s", 4L), (5, "a", "n", 2L), (6, "an", "d", 2L)))
  }

  test("distributed path (cap=0) equals the driver fast path") {
    val corpus = docs(
      1L -> "the cat sat on the mat",
      2L -> "the cats sat on the mats",
      3L -> "a cat and a rat",
      4L -> "the rats and the cats")
    val driver = BpeTrain.learnMerges(corpus, "text", 6)
      .orderBy("rank").collect().map(_.toSeq).toSeq
    val dist = BpeTrain.learnMerges(corpus, "text", 6, driverDictCap = 0)
      .orderBy("rank").collect().map(_.toSeq).toSeq
    assert(driver == dist)
  }

  test("learnMerges stops early when no pair remains") {
    val got = BpeTrain.learnMerges(docs(1L -> "a b c"), "text", 5)
      .orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    assert(got.isEmpty)
  }

  test("merges are greedy left-to-right and non-overlapping") {
    // 'aaa' with merge (a,a): [aa, a], never [a, aa] or re-merged [aaa]
    val merges = BpeTrain.learnMerges(docs(1L -> "aaa aaa"), "text", 1)
      .collect().map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(merges == Seq(("a", "a", 4L))) // 2 adjacent pairs x word freq 2
    val n = BpeTrain.withBpeTokenCount(docs(1L -> "aaa"), "text", Seq("a" -> "a"))
      .collect()(0).getLong(2)
    assert(n == 2L)
  }

  test("withBpeTokenCount with no merges counts characters") {
    val n = BpeTrain.withBpeTokenCount(docs(1L -> "ab cde"), "text", Nil)
      .collect()(0).getLong(2)
    assert(n == 5L)
  }
}
