package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.operators.dedup.TextDedup
import graft.operators.text.TextAnalysis

class TextOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

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
}
