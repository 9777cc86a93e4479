package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.operators.text.DocChunk

class DocChunkSentenceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def chunks(text: String, target: Int): Seq[(Long, String, Long)] = {
    import spark.implicits._
    DocChunk.chunkBySentences(Seq((1L, text)).toDF("doc_id", "text"),
        "doc_id", "text", target)
      .orderBy("chunk_id").collect()
      .map(r => (r.getAs[Long]("chunk_id"), r.getAs[String]("chunk"),
        r.getAs[Long]("n_sentences"))).toSeq
  }

  test("length-quantized assembly: sentences stay whole, chunks near target") {
    // lens 8,6,4,9 with +1 joins; charsBefore: 0,9,16,21 -> chunks 0,0,1,2
    val out = chunks("Aaa bbb. Cc dd! Eee? Ff gg hh.", 10)
    assert(out == Seq(
      (0L, "Aaa bbb. Cc dd!", 2L),
      (1L, "Eee?", 1L),
      (2L, "Ff gg hh.", 1L)))
  }

  test("a terminal-punctuation-free tail still becomes a sentence") {
    val out = chunks("One. and then no punctuation tail", 100)
    assert(out == Seq((0L, "One. and then no punctuation tail", 2L)))
  }

  test("oversized sentences are never split; later chunk ids skip ahead") {
    val out = chunks("Short. " + ("x" * 50) + ". End.", 10)
    // the 51-char monster lands whole in one chunk (with "Short." — its
    // start position is still inside chunk 0: quantized, not greedy)
    assert(out.count(_._2.contains("x" * 50 + ".")) == 1)
    // "End." starts at charsBefore 7 + 52 = 59 -> chunk 5
    assert(out.map(_._1) == Seq(0L, 5L))
    assert(out.map(_._3).sum == 3L)
  }

  test("docs chunk independently; null text yields nothing") {
    import spark.implicits._
    val df = Seq((1L, "A. B."), (2L, null.asInstanceOf[String]),
      (3L, "C!")).toDF("doc_id", "text")
    val out = DocChunk.chunkBySentences(df, "doc_id", "text", 100)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("chunk")).toMap
    assert(out == Map(1L -> "A. B.", 3L -> "C!"))
  }
}
