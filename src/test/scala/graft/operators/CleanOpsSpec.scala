package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.operators.dedup.Decontaminate
import graft.operators.text.{PiiScrub, QualityRules, TextAnalysis}

/** Corpus-cleaning operators: decontamination, repetition filter, PII
  * scrub (the p21–p23 CORRECTNESS entries cover the oracle parity; these
  * pin the operator-level edge semantics).
  */
class CleanOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  // ---- Decontaminate ----

  test("decontaminate flags only train docs sharing an n-gram with eval") {
    val train = docs(
      1L -> "alpha beta gamma delta epsilon zeta", // shares 4-gram with eval doc
      2L -> "one two three four five six",         // clean
      3L -> "alpha beta gamma delta other words")  // shares the same 4-gram
    val eval = docs(10L -> "prefix alpha beta gamma delta suffix")
    val flagged = Decontaminate.overlap(train, eval, "doc_id", "text", n = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(flagged.keySet == Set(1L, 3L))
    assert(flagged(1L) == 1L) // exactly one shared distinct 4-gram
  }

  test("bloom prefilter mode returns exactly the overlap output (false positives confirmed away)") {
    val train = docs(
      1L -> "alpha beta gamma delta epsilon zeta",
      2L -> "one two three four five six",
      3L -> "alpha beta gamma delta other words")
    val eval = docs(10L -> "prefix alpha beta gamma delta suffix")
    val exact = Decontaminate.overlap(train, eval, "doc_id", "text", n = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // a sloppy 30% fpp filter admits plenty of false candidates; the
    // confirm join must strip them all — output identical to exact mode
    val bloom = Decontaminate.overlapBloom(train, eval, "doc_id", "text",
        n = 4, fpp = 0.3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(bloom == exact)
    assert(bloom.keySet == Set(1L, 3L))
  }

  test("containment scores each (train, eval) pair by |∩|/|eval|") {
    // eval doc 10 has 3 distinct 4-grams: "q1 q2 q3 q4", "q2 q3 q4 q5",
    // "q3 q4 q5 q6". Train doc 1 embeds the full question (3/3); doc 2
    // only its first 4-gram (1/3); doc 3 shares nothing.
    val train = docs(
      1L -> "intro words q1 q2 q3 q4 q5 q6 outro",
      2L -> "only q1 q2 q3 q4 here but nothing else",
      3L -> "completely unrelated text with other words")
    val eval = docs(10L -> "q1 q2 q3 q4 q5 q6")
    val pairs = Decontaminate.containment(train, eval, "doc_id", "text",
        n = 4, threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(pairs.toSet == Set((1L, 10L, 3L, 1.0), (2L, 10L, 1L, 0.3333)))
    // threshold above 1/3 drops the partial pair
    val strict = Decontaminate.containment(train, eval, "doc_id", "text",
        n = 4, threshold = 0.5).collect().map(_.getLong(0)).toSet
    assert(strict == Set(1L))
  }

  test("Gopher rules flag each failure mode independently") {
    import graft.operators.text.QualityRules
    val good = Seq.fill(6)("the quick brown fox jumps over it and that dog").mkString(" ")
    val corpus = docs(
      1L -> good,                                       // passes everything
      2L -> "short the and",                            // too few words
      3L -> Seq.fill(30)("####### ###").mkString(" "),  // symbol ratio + no stopwords
      4L -> (good + " " + Seq.fill(40)("12345").mkString(" ")), // digit ratio
      5L -> Seq.fill(40)("zz qq ww").mkString(" "))     // no stopword hits
    val out = QualityRules.gopher(corpus, "text", minWords = 10)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("gopher_pass")).toMap
    assert(out == Map(1L -> 1, 2L -> 0, 3L -> 0, 4L -> 0, 5L -> 0))
    val kept = QualityRules.gopherFilter(corpus, "text", minWords = 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L))
  }

  test("Gopher repetition battery: hand-computed char-mass fractions") {
    import graft.operators.text.QualityRules
    val corpus = docs(
      1L -> "spark spark spark data",     // "spark spark" x2, cm=19
      2L -> "a b c d e a b c d e a")     // "a b c d e" + "b c d e a" dup 5-grams
    val out = QualityRules.repetition(corpus, "text")
      .orderBy("doc_id")
      .select("doc_id", "top2_char_frac", "dup5_char_frac", "rep_pass")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getInt(3)))
    // doc 1: top 2-gram "spark spark" cnt=2, mass=2*(11-1)=20 over cm=19 —
    // overlapping occurrences legitimately push the fraction past 1
    assert(out(0) == (1L, 1.0526, 0.0, 0), s"got ${out(0)}")
    // doc 2: two distinct duplicated 5-grams, mass 2*5+2*5=20 over cm=11,
    // capped at 1.0
    assert(out(1)._1 == 2L && out(1)._3 == 1.0 && out(1)._4 == 0, s"got ${out(1)}")
  }

  test("blocklist screen: hit mass, punctuation-stripped matching, flag threshold") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the Spark, engine runs spark jobs fast"),   // 2 hits / 7 tokens
      (2L, "clean prose with nothing banned at all"),   // 0 hits
      (3L, "SPARK! spark spark"),                       // 3 / 3 -> blocked
      (4L, "")                                          // empty: 0 tokens
    ).toDF("doc_id", "text")
    val bl = Seq("spark", "vector").toDF("term")
    val out = QualityRules.blocklist(docs, "doc_id", "text", bl, "term",
        maxFrac = 0.3)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("n_hits"),
          r.getAs[Long]("n_terms"), r.getAs[Double]("hit_frac"),
          r.getAs[Boolean]("blocked")))).toMap
    assert(out(1L) == ((7L, 2L, 1L, 0.285714, false)))
    assert(out(2L) == ((7L, 0L, 0L, 0.0, false)))
    assert(out(3L) == ((3L, 3L, 1L, 1.0, true)))
    assert(out(4L) == ((0L, 0L, 0L, 0.0, false)))
  }

  test("decontaminate clean drops flagged docs and keeps the rest intact") {
    val train = docs(1L -> "a b c d e f", 2L -> "g h i j k l")
    val eval = docs(10L -> "x a b c d y")
    val kept = Decontaminate.clean(train, eval, "doc_id", "text", n = 4)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L))
  }

  test("decontaminate minOverlap raises the bar") {
    val train = docs(1L -> "a b c d x y z w") // shares 'a b c d' only
    val eval = docs(10L -> "a b c d q r s t")
    assert(Decontaminate.overlap(train, eval, "doc_id", "text", n = 4, minOverlap = 2).count() == 0)
    assert(Decontaminate.overlap(train, eval, "doc_id", "text", n = 4, minOverlap = 1).count() == 1)
  }

  test("decontaminate never shuffles the train side (broadcast eval)") {
    val train = docs(1L -> "a b c d e f")
    val eval = docs(10L -> "a b c d q r")
    val plan = Decontaminate.clean(train, eval, "doc_id", "text", n = 4)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"))
  }

  // ---- repetitionStats ----

  test("repetitionStats: fully repeated text scores high, varied text zero") {
    val out = TextAnalysis.repetitionStats(
      docs(1L -> "spam spam spam spam spam spam spam spam",
           2L -> "each word here appears exactly once total"), "text")
      .select("doc_id", "n_ngrams", "n_distinct_ngrams", "dup_ngram_ratio", "is_repetitive")
      .collect().map(r => r.getLong(0) -> r).toMap
    val spam = out(1L)
    assert(spam.getLong(1) == 6L && spam.getLong(2) == 1L) // 6 trigrams, all 'spam spam spam'
    assert(spam.getDouble(3) > 0.8 && spam.getBoolean(4))
    val varied = out(2L)
    assert(varied.getDouble(3) == 0.0 && !varied.getBoolean(4))
  }

  test("repetitionStats: docs shorter than n have zero ngrams and ratio 0") {
    val r = TextAnalysis.repetitionStats(docs(1L -> "two words"), "text").head()
    assert(r.getAs[Long]("n_ngrams") == 0L && r.getAs[Double]("dup_ngram_ratio") == 0.0)
    assert(!r.getAs[Boolean]("is_repetitive"))
  }

  // ---- PiiScrub ----

  test("pii scrub redacts and counts each category") {
    val r = PiiScrub.scrub(docs(
      1L -> "mail a.user+tag@sub.example.org call 415-555-0042 host 192.168.1.10 end"),
      "text").head()
    assert(r.getAs[Long]("n_emails") == 1L)
    assert(r.getAs[Long]("n_phones") == 1L)
    assert(r.getAs[Long]("n_ips") == 1L)
    assert(r.getAs[String]("text_scrubbed") ==
      "mail <EMAIL> call <PHONE> host <IP> end")
  }

  test("pii scrub: digits inside an email count once, as an email") {
    val r = PiiScrub.scrub(docs(1L -> "user123@example.com"), "text").head()
    assert(r.getAs[Long]("n_emails") == 1L && r.getAs[Long]("n_phones") == 0L)
    assert(r.getAs[String]("text_scrubbed") == "<EMAIL>")
  }

  test("pii scrub leaves clean text untouched with zero counts") {
    val r = PiiScrub.scrub(docs(1L -> "no pii here just words"), "text").head()
    assert(r.getAs[Long]("n_emails") == 0L && r.getAs[Long]("n_phones") == 0L &&
      r.getAs[Long]("n_ips") == 0L)
    assert(r.getAs[String]("text_scrubbed") == "no pii here just words")
  }

  test("pii scrub stays whole-stage-codegen (no UDF in the plan)") {
    // a parquet-backed frame, not a literal Seq — Catalyst folds literals
    // into a LocalTableScan with no codegen stage to inspect
    val src = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val plan = PiiScrub.scrub(src, "text")
      .queryExecution.executedPlan.toString
    // "*(n)" prefixes mark whole-stage-codegen stages in the plan string
    assert(plan.contains("*(1) Project"))
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"))
  }
}
