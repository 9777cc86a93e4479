package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import org.apache.spark.sql.functions._

class StringExpressionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def jw(a: String, b: String): Double =
    JaroWinklerImpl.similarity(
      a.getBytes("UTF-8"), b.getBytes("UTF-8"))

  test("pins DuckDB jaro_winkler_similarity bit-for-bit on probed pairs") {
    // every constant below is DuckDB 's output, probed 2026-08-15; the
    // kernel was additionally cross-checked bit-level on 12000 random
    // pairs over three alphabets (0 mismatches)
    assert(jw("MARTHA", "MARHTA") == 0.9611111111111111)
    assert(jw("DIXON", "DICKSONX") == 0.8133333333333332)
    assert(jw("JELLYFISH", "SMELLYFISH") == 0.8962962962962964)
    assert(jw("DWAYNE", "DUANE") == 0.8400000000000001)
    assert(jw("CRATE", "TRACE") == 0.7333333333333334)
    assert(jw("abcdef", "fedcba") == 0.38888888888888884)
    assert(jw("PREFIX", "PREFIXXXXX") == 0.92)
    assert(jw("aaaaaaaaaa", "aaaaaaaaab") == 0.96)
    // boost gate: jaro 0.6 with a 4-char prefix stays unboosted
    assert(jw("ABCDXXXXXX", "ABCDYYYYYY") == 0.6)
    // odd transposition count floors (the 380/4000 lesson)
    assert(jw("fcbc", "cbfcfff") == 0.7738095238095237)
    // byte-level semantics: 'é' is two UTF-8 bytes in DuckDB too
    assert(jw("éclair", "eclair") == 0.8492063492063492)
    assert(jw("straße", "strasse") == 0.8857142857142858)
  }

  test("edge cases: empties are 0, identity is 1, disjoint is 0") {
    assert(jw("", "") == 0.0 && jw("", "abc") == 0.0 && jw("abc", "") == 0.0)
    assert(jw("abc", "abc") == 1.0)
    assert(jw("a", "b") == 0.0)
    assert(jw("ab", "ba") == 0.0) // window 0: only same-position matches
  }

  test("symmetric on seeded random pairs") {
    val rnd = new scala.util.Random(5150)
    for (_ <- 1 to 500) {
      val a = Seq.fill(rnd.nextInt(12))(('a' + rnd.nextInt(4)).toChar).mkString
      val b = Seq.fill(rnd.nextInt(12))(('a' + rnd.nextInt(4)).toChar).mkString
      assert(jw(a, b) == jw(b, a), s"'$a' vs '$b'")
    }
  }

  test("registered SQL function; codegen survives two instances per stage") {
    import spark.implicits._
    val df = Seq(("MARTHA", "MARHTA", "DWAYNE", "DUANE"))
      .toDF("a", "b", "c", "d")
    // two instances of the expression in ONE projection — the Janino
    // fresh-locals trap (pinned for ArrDot at BenchSpec.scala); verify
    // under codegen.fallback=false so a silent interpreted fallback fails
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val r = df.selectExpr(
        "jaro_winkler_similarity(a, b) AS x",
        "jaro_winkler_similarity(c, d) AS y",
        "jaro_winkler_similarity(a, a) AS z").collect()(0)
      assert(r.getDouble(0) == 0.9611111111111111)
      assert(r.getDouble(1) == 0.8400000000000001)
      assert(r.getDouble(2) == 1.0)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
      case None => spark.conf.unset("spark.sql.codegen.fallback")
    }
    // null propagation through the expression
    val n = spark.sql(
      "SELECT jaro_winkler_similarity(CAST(NULL AS STRING), 'x') AS v")
      .collect()(0)
    assert(n.isNullAt(0))
  }
}
