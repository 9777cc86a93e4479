package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.operators.sampling.ImportanceSelect

/** DSIR importance selection (p44 covers DuckDB oracle parity end-to-end;
  * these pin the operator-level semantics: hashing bounds, the
  * target==raw null case, directional scoring, and seeded resampling).
  */
class ImportanceSelectSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("bucketExpr is deterministic and lands in [0, buckets) in both hash modes") {
    import spark.implicits._
    val words = Seq("alpha", "beta beta", "语言", "", "x").toDF("w")
    for (portable <- Seq(false, true)) {
      val b = words.select(
        ImportanceSelect.bucketExpr(col("w"), 128, portable).as("b"))
        .collect().map(_.getInt(0))
      assert(b.forall(x => x >= 0 && x < 128))
      val again = words.select(
        ImportanceSelect.bucketExpr(col("w"), 128, portable).as("b"))
        .collect().map(_.getInt(0))
      assert(b.sameElements(again))
    }
  }

  test("ngrams = unigrams + bigrams; short and empty docs are safe") {
    import spark.implicits._
    val df = docs(1L -> "a b c", 2L -> "solo", 3L -> "", 4L -> "  ")
    val n = df.select(col("doc_id"), size(ImportanceSelect.ngramsExpr("text")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(n == Map(1L -> 5, 2L -> 1, 3L -> 0, 4L -> 0)) // 3 uni + 2 bi
  }

  test("target == raw gives identically zero log ratios") {
    val df = docs(1L -> "a b c d", 2L -> "c d e f", 3L -> "x y z")
    val lr = ImportanceSelect.fitLogRatios(df, df, "text", buckets = 64)
    assert(lr.length == 64)
    assert(lr.forall(_ == 0.0)) // same counts, same totals — exact zero
  }

  test("docs matching the target vocabulary outscore off-target docs") {
    val target = docs(
      1L -> "science method experiment hypothesis result",
      2L -> "experiment result science analysis method")
    val raw = docs(
      10L -> "science experiment result method analysis",  // on-target
      11L -> "buy cheap pills now click here win prize",    // off-target
      12L -> "science prize method click analysis here")    // mixed
    val lr = ImportanceSelect.fitLogRatios(target, raw, "text", buckets = 512)
    val s = ImportanceSelect.score(raw, "doc_id", "text", lr, buckets = 512)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(s(10L) > s(12L) && s(12L) > s(11L))
  }

  test("select returns exactly k rows, highest weights first") {
    val target = docs(1L -> "aa bb cc dd", 2L -> "cc dd ee")
    val raw = docs((10L to 19L).map(i =>
      i -> (if (i % 2 == 0) "aa bb cc dd ee" else "zz yy xx ww vv")): _*)
    val out = ImportanceSelect.select(raw, target, "doc_id", "text", k = 3,
      buckets = 256).collect()
    assert(out.length == 3)
    assert(out.map(_.getLong(0)).forall(_ % 2 == 0)) // all on-target docs
    val ws = out.map(_.getDouble(2))
    assert(ws.sameElements(ws.sorted.reverse))
  }

  test("gumbelSelect is reproducible per seed and varies across seeds") {
    val target = docs(1L -> "aa bb cc")
    val raw = docs((1L to 200L).map(i => i -> s"aa tok$i bb"): _*)
    def pick(seed: Long) = ImportanceSelect
      .gumbelSelect(raw, target, "doc_id", "text", k = 10, seed = seed,
        buckets = 256)
      .collect().map(_.getLong(0)).toSet
    assert(pick(7L) == pick(7L))
    assert(pick(7L) != pick(8L)) // 10-of-200 collision is ~impossible
  }
}
