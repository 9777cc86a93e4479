package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.operators.text.Snippets

class SnippetsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def run(text: String, qterms: Seq[String], window: Int = 4,
                  stride: Int = 4): (String, Int) = {
    import spark.implicits._
    val r = Snippets.bestWindow(Seq((text, qterms)).toDF("text", "qt"),
      "text", "qt", window, stride).collect()(0)
    (r.getAs[String]("snippet"), r.getAs[Int]("n_hits"))
  }

  test("picks the window with the most query-term occurrences") {
    assert(run("a b c a d a x y", Seq("a")) == (("a b c a", 2)))
    // the later window wins when it genuinely has more hits
    assert(run("x y z w a b a a", Seq("a")) == (("a b a a", 3)))
  }

  test("ties keep the EARLIEST window; case-insensitive match") {
    assert(run("a x x x a x x x", Seq("a")) == (("a x x x", 1)))
    assert(run("A b c d", Seq("a"))._2 == 1) // text lowercased
  }

  test("short docs are one whole window; nulls and empties degrade cleanly") {
    assert(run("a b", Seq("b"), window = 8) == (("a b", 1)))
    import spark.implicits._
    val rows = Snippets.bestWindow(
        Seq((null.asInstanceOf[String], Seq("a")), ("", Seq("a")))
          .toDF("text", "qt"), "text", "qt")
      .collect().map(r => (r.getAs[String]("snippet"), r.getAs[Int]("n_hits")))
    assert(rows(0) == ((null, 0)))
    assert(rows(1) == (("", 0)))
  }
}
