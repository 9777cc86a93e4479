package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.operators.text.TextNormalize

class TextNormalizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def norm(s: String, lowercase: Boolean = false): String = {
    import spark.implicits._
    Seq(Tuple1(s)).toDF("t")
      .select(TextNormalize.normalizeCol(org.apache.spark.sql.functions.col("t"),
        lowercase).as("n"))
      .collect()(0).getString(0)
  }

  test("NFC composes decomposed accents") {
    // e + combining acute (2 code points) -> U+00E9 (1 code point)
    assert(norm("Cafe\u0301") == "Caf\u00e9")
    assert(norm("Cafe\u0301").length == 4)
  }

  test("tabs/newlines become single spaces, never fusing words") {
    assert(norm("a\tb\n\nc\r\nd") == "a b c d")
  }

  test("control and format chars are stripped (bell, ZWJ, BOM, soft hyphen)") {
    assert(norm("a\u0007b\u200dc\ufeffd\u00ade") == "abcde")
  }

  test("space runs collapse and the result is trimmed") {
    assert(norm("  a   b  ") == "a b")
  }

  test("optional lowercase; nulls stay null; audit columns count chars") {
    import spark.implicits._
    assert(norm("AbC", lowercase = true) == "abc")
    val df = Seq((1L, "A\u0301  B"), (2L, null.asInstanceOf[String]))
      .toDF("id", "text")
    val rows = TextNormalize.normalize(df, "text").collect()
      .map(r => r.getLong(0) -> (r.getAs[String]("text"),
        r.getAs[Any]("n_chars_raw"), r.getAs[Any]("n_chars_norm"))).toMap
    assert(rows(1L) == (("\u00c1 B", 5, 3)))
    assert(rows(2L) == ((null, null, null)))
  }
}
