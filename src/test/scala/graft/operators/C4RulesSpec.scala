package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.operators.text.C4Rules

class C4RulesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("line keepers: terminal punctuation AND five words required") {
    import spark.implicits._
    val df = Seq((1L, Seq(
      "this sentence has enough words and ends properly.",  // kept
      "short stop.",                                        // < 5 words
      "plenty of words here but no terminal punctuation",   // no punct
      "does five words suffice here?",                      // kept (5 words, ?)
      "an exclamation with the needed word count!",         // kept
      "a quoted ending also counts as terminal \""          // kept (quote)
    ).mkString("\n"))).toDF("doc_id", "text")
    val r = C4Rules.battery(df, "text").select("n_lines", "n_kept", "text_c4").head()
    assert(r.getLong(0) == 6L && r.getLong(1) == 4L)
    assert(!r.getString(2).contains("short stop"))
    assert(r.getString(2).contains("does five words suffice here?"))
  }

  test("document predicates: sentence floor and blocked phrases") {
    import spark.implicits._
    val good = "First full sentence with enough words here.\n" +
      "Second full sentence with enough words too!\n" +
      "Third full sentence rounds out the document?"
    val df = Seq(
      (1L, good),
      (2L, "Only one proper sentence lives in this document."),
      (3L, good + "\nLorem IPSUM dolor sit amet is blocked."),
      (4L, good.replace("words here", "words { here"))
    ).toDF("doc_id", "text")
    val out = C4Rules.battery(df, "text")
      .select("doc_id", "c4_pass", "n_sentences")
      .collect().map(r => r.getLong(0) -> ((r.getBoolean(1), r.getLong(2)))).toMap
    assert(out(1L) == ((true, 3L)))
    assert(out(2L) == ((false, 1L)))   // below the 3-sentence floor
    assert(out(3L)._1 == false)        // case-insensitive lorem ipsum
    assert(out(4L)._1 == false)        // curly brace = code marker
  }

  test("sentence count is measured on the RETAINED text only") {
    import spark.implicits._
    // punctuation in dropped lines must not count toward the floor
    val df = Seq((1L, "a. b! c? d!\n" +  // dropped: 4 words < 5
      "One full sentence with enough words to keep.")).toDF("doc_id", "text")
    val r = C4Rules.battery(df, "text").select("n_sentences", "c4_pass").head()
    assert(r.getLong(0) == 1L && !r.getBoolean(1))
  }

  test("plan shape: the battery is a zero-shuffle per-row projection") {
    import spark.implicits._
    val df = Seq((1L, "A line that ends with enough words.")).toDF("doc_id", "text")
    val plan = C4Rules.battery(df, "text").queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
