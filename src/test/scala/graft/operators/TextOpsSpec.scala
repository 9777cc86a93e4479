package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.operators.dedup.TextDedup
import graft.operators.text.TextAnalysis

class TextOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("LSH banding auto-tune: inflection tracks the threshold, budget respected") {
    for (t <- Seq(0.5, 0.7, 0.8, 0.9); n <- Seq(64, 96, 128)) {
      val (b, r) = TextDedup.banding(t, n)
      assert(b * r <= n && b * r > n / 2, s"t=$t n=$n got b=$b r=$r")
      val inflection = math.pow(1.0 / b, 1.0 / r)
      // within 0.15 of the target, and a near-threshold pair keeps a high
      // collision probability: 1 - (1 - t^r)^b
      assert(math.abs(inflection - t) < 0.15, s"t=$t n=$n inflection=$inflection")
      val pCatch = 1 - math.pow(1 - math.pow(t + 0.1, r), b)
      assert(pCatch > 0.85, s"t=$t n=$n b=$b r=$r pCatch=$pCatch")
    }
    // higher threshold must push toward more rows per band (sharper curve)
    assert(TextDedup.banding(0.9, 96)._2 > TextDedup.banding(0.5, 96)._2)
  }

  test("wordEntropy: uniform doc maximizes norm_entropy, repeated word zeroes it") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b c d"),        // uniform over 4 types -> H = ln 4, norm 1
      (2L, "a a a a"),        // single type -> H = 0, norm 0 by contract
      (3L, "a a a b"),        // skewed
      (4L, "a  b")            // double space: empty token ignored
    ).toDF("doc_id", "text")
    val out = TextAnalysis.wordEntropy(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    def r4(x: Double) = math.rint(x * 1e4) / 1e4
    assert(out(1L) == ((4L, 4L, r4(math.log(4)), 1.0)))
    assert(out(2L) == ((4L, 1L, 0.0, 0.0)))
    // H(3/4,1/4) = ln4 - (3 ln 3)/4
    assert(out(3L)._3 == r4(math.log(4) - 3 * math.log(3) / 4))
    assert(out(4L) == ((2L, 2L, r4(math.log(2)), 1.0)))
  }

  test("minHashSelfJoinTuned finds the same pairs as the exact jaccard join") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "the quick brown fox jumps over the lazy dog again and again tonight"),
      (3L, "completely different content with no overlap to anything else here"),
      (4L, "yet another unrelated document about spark catalyst optimizer rules")
    ).toDF("doc_id", "text")
    val sh = TextDedup.shingles(docs, "doc_id", "text", 3)
    val tuned = TextDedup.minHashSelfJoinTuned(sh, 0.5)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = TextDedup.jaccardSelfJoin(sh, 0.5)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(tuned == exact && tuned == Set((1L, 2L)))
  }

  test("word_window_hashes matches the HOF construction exactly") {
    val df = spark.sql(
      """select word_window_hashes('  the   quick\tbrown fox  ', 2) as fast,
        |  transform(sequence(0, size(filter(split('  the   quick\tbrown fox  ', '\\s+'),
        |    x -> length(x) > 0)) - 2),
        |    i -> md5(array_join(slice(filter(split('  the   quick\tbrown fox  ', '\\s+'),
        |      x -> length(x) > 0), i + 1, 2), ' '))) as slow""".stripMargin)
    val r = df.head()
    assert(r.getSeq[String](0) == r.getSeq[String](1))
    assert(r.getSeq[String](0).length == 3)
    // short text and k <= 0 yield empty, null yields null
    assert(spark.sql("select word_window_hashes('one two', 5) as f")
      .head().getSeq[String](0).isEmpty)
    assert(spark.sql("select word_window_hashes(cast(null as string), 3) as f")
      .head().isNullAt(0))
  }

  test("SubstringDedup: cross-doc span trimmed, first occurrence kept, self-repeat caught") {
    import spark.implicits._
    import graft.operators.text.SubstringDedup
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "zzz alpha beta gamma delta qqq"),    // shares a 4-token run with 1
      (3L, "mmm nnn ooo mmm nnn ooo"),           // repeats itself
      (4L, "unique words only here"),
      (5L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val spans = SubstringDedup.duplicateSpans(docs, "doc_id", "text", k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    // doc 2: dup windows at pos 1 ("alpha beta gamma") and 2 ("beta gamma
    // delta") merge into one maximal span [1,5); doc 3: the second
    // "mmm nnn ooo" is [3,6); doc 1 holds every canonical occurrence
    assert(spans == Set((2L, 1, 5), (3L, 3, 6)))
    val cleaned = SubstringDedup.removeSpans(docs, "doc_id", "text", k = 3)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getInt(2))).toMap
    assert(cleaned(1L) == ("alpha beta gamma delta epsilon", 0))
    assert(cleaned(2L) == ("zzz qqq", 1))
    assert(cleaned(3L) == ("mmm nnn ooo", 1))
    assert(cleaned(4L) == ("unique words only here", 0))
    assert(cleaned(5L)._1 == null && cleaned(5L)._2 == 0)
  }

  test("SubstringDedup: result is partitioning-independent and idempotent") {
    import spark.implicits._
    import graft.operators.text.SubstringDedup
    val docs = (1L to 20L).map { i =>
      val boiler = "this exact license header appears in many files verbatim"
      (i, if (i % 3 == 0) s"body $i text $boiler tail $i" else s"body $i text only tail $i")
    }.toDF("doc_id", "text")
    def key(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("doc_id").collect().map(_.toSeq).toSeq
    val once = SubstringDedup.removeSpans(docs, "doc_id", "text", k = 5)
    assert(key(once) ==
      key(SubstringDedup.removeSpans(docs.repartition(13), "doc_id", "text", k = 5)))
    // idempotent: a second pass finds nothing left to trim
    val twice = SubstringDedup.removeSpans(
      once.drop("n_dup_spans"), "doc_id", "text", k = 5)
    assert(twice.filter("n_dup_spans > 0").count() == 0)
    // exactly one canonical copy of the boiler text survives corpus-wide
    val holders = once.filter("text like '%license header%'").count()
    assert(holders == 1)
  }

  test("winnow_fingerprints: shared substring of length >= w+k-1 shares a fingerprint") {
    val df = spark.sql(
      """select winnow_fingerprints('xxxx SHARED-CHUNK-OF-TEXT yyyy', 8, 4) as a,
        |       winnow_fingerprints('aaaa SHARED-CHUNK-OF-TEXT bbbb', 8, 4) as b""".stripMargin)
    val r = df.head()
    val shared = r.getSeq[Long](0).toSet intersect r.getSeq[Long](1).toSet
    assert(shared.nonEmpty) // SIGMOD'03 guarantee: >= 11-char shared substring
  }

  test("winnow_fingerprints is deterministic and sorted") {
    val a = spark.sql("select winnow_fingerprints('the quick brown fox', 5, 3) as f").head().getSeq[Long](0)
    val b = spark.sql("select winnow_fingerprints('the quick brown fox', 5, 3) as f").head().getSeq[Long](0)
    assert(a == b && a == a.sorted && a.nonEmpty)
  }

  test("winnow_fingerprints on short text returns empty, not error") {
    val f = spark.sql("select winnow_fingerprints('ab', 8, 4) as f").head().getSeq[Long](0)
    assert(f.isEmpty)
  }

  test("winnowSelfJoin finds documents sharing long substrings") {
    import spark.implicits._
    val docs = Seq(
      (1L, "completely unrelated document about spark plans"),
      (2L, "THIS EXACT PLAGIARIZED SENTENCE APPEARS TWICE IN THE CORPUS ok"),
      (3L, "intro text THIS EXACT PLAGIARIZED SENTENCE APPEARS TWICE IN THE CORPUS outro"),
      (4L, "another unrelated one about duckdb oracles")).toDF("doc_id", "text")
    val pairs = TextDedup.winnowSelfJoin(docs, "doc_id", "text", k = 8, w = 4, minShared = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == Seq((2L, 3L)))
  }

  test("lang-id picks the profile with most stopword hits, ties alphabetical") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the cat and the dog of a to"),   // en
      (2L, "der hund und die katze ist"),    // de
      (3L, "le chat et la les est"),         // fr -> fr beats es? 'est' in both fr and es profiles
      (4L, "zzz qqq www")).toDF("doc_id", "text")
    val out = TextAnalysis.withLangId(docs, "text")
      .select("doc_id", "lang_pred").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "en")
    assert(out(2L) == "de")
    assert(out(3L) == "fr")
    assert(out(4L) == "unknown")
  }

  test("dedupParagraphs keeps first corpus-wide occurrence and rebuilds in order") {
    import spark.implicits._
    val docs = Seq(
      (1L, "A<p>B"), (2L, "B<p>C"), (3L, "A<p>C<p>D")).toDF("doc_id", "text")
    val out = TextDedup.dedupParagraphs(docs, "doc_id", "text", "<p>")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getInt(3)))).toMap
    assert(out(1L) == (("A<p>B", 2L, 2)))   // both first occurrences
    assert(out(2L) == (("C", 1L, 2)))       // B already seen in doc 1
    assert(out(3L) == (("D", 1L, 3)))       // A and C already seen
  }

  test("dedupParagraphs: a fully-duplicate doc survives with empty text") {
    import spark.implicits._
    val docs = Seq((1L, "X<p>Y"), (2L, "X<p>Y")).toDF("doc_id", "text")
    val out = TextDedup.dedupParagraphs(docs, "doc_id", "text", "<p>")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(out(1L) == (("X<p>Y", 2L)))
    assert(out(2L) == (("", 0L)))
  }

  test("SequencePack layout equals the naive prefix sum on any partitioning") {
    import spark.implicits._
    import graft.operators.text.SequencePack
    val rnd = new scala.util.Random(5)
    val rows = (1L to 500L).map(i => (i, 1L + rnd.nextInt(50)))
    // scrambled input partitioning + a forced 5-way range layout: the
    // two-phase prefix sum must still equal the sequential reference
    val df = rows.toDF("doc_id", "n_tok").repartition(7)
    val out = SequencePack.chunkLayout(df, "doc_id", "n_tok", seqLen = 64, partitions = 5)
      .orderBy("doc_id").collect()
    assert(out.length == rows.length)
    var off = 0L
    rows.zip(out).foreach { case ((id, n), r) =>
      assert(r.getLong(0) == id)
      assert(r.getLong(1) == n, s"n_tokens for doc $id")
      assert(r.getLong(2) == off, s"tok_start for doc $id")
      assert(r.getLong(3) == off / 64, s"first_chunk for doc $id")
      assert(r.getLong(4) == (off + n - 1) / 64, s"last_chunk for doc $id")
      assert(r.getLong(5) == off % 64, s"offset_in_chunk for doc $id")
      off += n
    }
    // a doc spanning chunks reports the full range; zero-token rows drop
    val tiny = Seq((1L, 10L), (2L, 0L), (3L, 130L)).toDF("doc_id", "n_tok")
    val t = SequencePack.chunkLayout(tiny, "doc_id", "n_tok", seqLen = 64)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(4)))
    assert(t.toSeq == Seq((1L, 0L, 0L), (3L, 0L, 2L))) // 10..139 spans chunks 0-2
  }
}
