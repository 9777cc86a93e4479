package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.operators.text.BoilerplateLines

class BoilerplateLinesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def fixture = {
    import spark.implicits._
    // header in all 5 docs, footer in 3, bodies unique; doc 5 is chrome-only
    Seq(
      (1L, "SUBSCRIBE NOW\nreal content about cats\nCOPYRIGHT FOOTER"),
      (2L, "SUBSCRIBE NOW\nreal content about dogs\nCOPYRIGHT FOOTER"),
      (3L, "SUBSCRIBE NOW\nunique musings on parquet files"),
      (4L, "SUBSCRIBE NOW\nanother unique body line\nCOPYRIGHT FOOTER"),
      (5L, "SUBSCRIBE NOW")
    ).toDF("doc_id", "text")
  }

  test("lines above the doc-frequency floor are stripped, bodies kept in order") {
    val out = BoilerplateLines
      .removeFrequent(fixture, "doc_id", "text", minDocs = 3)
      .select("doc_id", "text_clean", "n_lines", "n_kept")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(out(0) == ((1L, "real content about cats", 3L, 1L)))
    assert(out(1) == ((2L, "real content about dogs", 3L, 1L)))
    assert(out(2) == ((3L, "unique musings on parquet files", 2L, 1L)))
    assert(out(3) == ((4L, "another unique body line", 3L, 1L)))
    // chrome-only doc survives as an empty string, not a dropped row
    assert(out(4) == ((5L, "", 1L, 0L)))
  }

  test("document frequency counts documents, not occurrences") {
    import spark.implicits._
    // "dup line" appears twice in ONE doc -> df=1, never boilerplate
    val df = Seq(
      (1L, "dup line\ndup line\nbody one"),
      (2L, "body two"),
      (3L, "body three")
    ).toDF("doc_id", "text")
    val freq = BoilerplateLines.lineDocFreq(df, "doc_id", "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(freq("dup line") == 1L)
    val out = BoilerplateLines.removeFrequent(df, "doc_id", "text", minDocs = 2)
      .select("doc_id", "text_clean").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "dup line\ndup line\nbody one")
  }

  test("document frequency is COUNT(DISTINCT doc) when a doc spans multiple rows") {
    import spark.implicits._
    // doc 1 re-delivered as two rows (chunked/replayed input): "chrome"
    // must count ONE document, not two rows — the documented contract and
    // what the p55 oracle's COUNT(DISTINCT doc_id) computes
    val df = Seq(
      (1L, "chrome\nbody a"),
      (1L, "chrome\nbody b"),
      (2L, "chrome\nbody c")
    ).toDF("doc_id", "text")
    val freq = BoilerplateLines.lineDocFreq(df, "doc_id", "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(freq("chrome") == 2L, freq)
  }

  test("short lines are exempt and the trim key ignores edge whitespace") {
    import spark.implicits._
    val df = Seq(
      (1L, "ok\nSHARED CHROME LINE \nbody a"),
      (2L, "ok\n SHARED CHROME LINE\nbody b"),
      (3L, "ok\nSHARED CHROME LINE\nbody c")
    ).toDF("doc_id", "text")
    val out = BoilerplateLines
      .removeFrequent(df, "doc_id", "text", minDocs = 3, minChars = 6)
      .select("doc_id", "text_clean").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // "ok" has df=3 but is under minChars; chrome matches through trim
    assert(out(1L) == "ok\nbody a" && out(2L) == "ok\nbody b" && out(3L) == "ok\nbody c")
  }

  test("deterministic cap keeps the highest-df lines with (df desc, line asc) tie-break") {
    import spark.implicits._
    val df = Seq(
      (1L, "AAAAAA chrome\nBBBBBB chrome\nbody 1"),
      (2L, "AAAAAA chrome\nBBBBBB chrome\nbody 2"),
      (3L, "AAAAAA chrome\nbody 3")
    ).toDF("doc_id", "text")
    val top = BoilerplateLines
      .frequentLines(df, "doc_id", "text", minDocs = 2, maxBoiler = 1)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(top.toSeq == Seq(("AAAAAA chrome", 3L)))
    // with the cap at 1 only the retained line is stripped
    val out = BoilerplateLines
      .removeFrequent(df, "doc_id", "text", minDocs = 2, maxBoiler = 1)
      .select("doc_id", "text_clean").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "BBBBBB chrome\nbody 1")
  }

  test("within-doc line dedup keeps first occurrences in order, zero shuffle") {
    import spark.implicits._
    val df = Seq(
      (1L, "a line\nb line\na line\nc line\nb line"),
      (2L, "solo")
    ).toDF("doc_id", "text")
    val out = BoilerplateLines.dedupWithinDoc(df, "text")
    val rows = out.select("doc_id", "text_dedup", "n_lines", "n_kept")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(rows(0) == ((1L, "a line\nb line\nc line", 5L, 3L)))
    assert(rows(1) == ((2L, "solo", 1L, 1L)))
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("plan shape: cleaning pass adds no exchange; freq is the two-phase distinct agg") {
    import spark.implicits._
    val df = Seq((1L, "a\nb"), (2L, "a\nc")).toDF("doc_id", "text")
    val cleaned = BoilerplateLines.strip(df, "text", Seq("shared chrome"))
    val plan = cleaned.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    // COUNT(DISTINCT doc) plans as two bounded exchanges — (line, doc)
    // dedup then the (line) count — both with partial aggregation
    val freqPlan = BoilerplateLines.lineDocFreq(df, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(freqPlan.split("Exchange").length - 1 <= 2, freqPlan)
  }

  test("maxBoiler-scale boiler sets plan as an INSET hash probe, not a per-line scan") {
    import spark.implicits._
    // full maxBoiler default (10k literals): the In -> InSet rewrite must
    // hold inside the HOF lambda at the size strip() actually runs with,
    // protecting the O(1)-per-line membership claim from optimizer drift
    val boiler = (0 until 10000).map(i => s"chrome line $i")
    // range-based input: a local Seq would be constant-folded into a
    // LocalRelation and the probe would vanish from the optimized plan
    val df = spark.range(1).select($"id".as("doc_id"),
      org.apache.spark.sql.functions.lit("chrome line 7\nreal body").as("text"))
    val out = BoilerplateLines.strip(df, "text", boiler)
    val plan = out.queryExecution.optimizedPlan.toString
    assert(plan.toUpperCase.contains("INSET"), plan.take(2000))
    assert(out.select("text_clean").head().getString(0) == "real body")
  }
}
