package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.operators.text.{WordPiece, WordPieceEncoder}

class WordPieceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("greedy longest-match-first, not shortest or rank-based") {
    val e = new WordPieceEncoder(Seq("a", "ab", "abc", "##d", "##cd"), "[UNK]")
    // "abc" beats "ab"+"##cd" because the FIRST match is maximal
    assert(e.encodeWord("abcd").toSeq == Seq("abc", "##d"))
  }

  test("whole word collapses to UNK when any step fails") {
    val e = new WordPieceEncoder(Seq("a", "ab", "##c"), "[UNK]")
    assert(e.encodeWord("abq").toSeq == Seq("[UNK]"))
    // initial vs continuation sets are distinct: 'b' is not word-initial
    assert(e.encodeWord("bc").toSeq == Seq("[UNK]"))
  }

  test("continuations carry the ## prefix in the output") {
    val e = new WordPieceEncoder(Seq("un", "##do", "##ab", "##le"), "[UNK]")
    assert(e.encodeWord("undoable").toSeq == Seq("un", "##do", "##ab", "##le"))
  }

  test("DataFrame surface: flattened pieces, n_unk, null text stays null") {
    import spark.implicits._
    val df = Seq((1L, "ab q ab"), (2L, null.asInstanceOf[String]))
      .toDF("id", "txt")
    val out = WordPiece.withWordPieces(df, "txt",
        Seq("a", "##b"), unk = "[UNK]")
      .collect().map(r => r.getLong(0) ->
        (r.getAs[scala.collection.Seq[String]]("wp_pieces"), r.getAs[Any]("n_unk"))).toMap
    assert(out(1L)._1.toSeq == Seq("a", "##b", "[UNK]", "a", "##b"))
    assert(out(1L)._2 == 1L)
    assert(out(2L)._1 == null && out(2L)._2 == null)
  }
}
