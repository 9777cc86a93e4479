package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.operators.text.EntityResolve

class EntityResolveSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def resolve(rows: Seq[(Long, String)], maxDist: Int = 2) = {
    import spark.implicits._
    EntityResolve.resolve(rows.toDF("id", "s"), "id", "s", maxDist)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getString(3))).toMap
  }

  test("transitive chains collapse into one entity with the min-id golden record") {
    // 1≈2 (1 edit), 2≈3 (1 edit), but 1 vs 3 is 2 edits — at maxDist=1
    // linkage alone never pairs 1 with 3; components must
    val rows = Seq((1L, "golden retriever"), (2L, "goldan retriever"),
      (3L, "goldan retriefer"), (9L, "border collie"))
    val r = resolve(rows, maxDist = 1)
    assert(r(1L) == ((1L, "golden retriever")))
    assert(r(2L) == ((1L, "golden retriever")))
    assert(r(3L) == ((1L, "golden retriever")), "transitive member joins via 2")
    assert(r(9L) == ((9L, "border collie")), "singleton is its own entity")
  }

  test("every registry row comes back exactly once") {
    val rows = Seq((5L, "alpha beta"), (6L, "alpha beta"), (7L, "unrelated thing"))
    import spark.implicits._
    val out = EntityResolve.resolve(rows.toDF("id", "s"), "id", "s", 2)
    assert(out.count() == 3)
    assert(resolve(rows)(6L) == ((5L, "alpha beta")))
  }

  test("resolveBest elects the max-score member, ties to the smallest id") {
    import spark.implicits._
    // one entity {1,2,3}: scores 1,7,7 -> canon is id 2 (tie with 3)
    val rows = Seq((1L, "golden retriever", 1L), (2L, "goldan retriever", 7L),
      (3L, "goldan retriefer", 7L), (9L, "border collie", 0L))
      .toDF("id", "s", "score")
    val out = EntityResolve.resolveBest(rows, "id", "s", "score", maxDist = 1)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getString(4)))
      .toMap
    assert(out(1L) == ((1L, 2L, "goldan retriever")))
    assert(out(3L) == ((1L, 2L, "goldan retriever")))
    assert(out(9L) == ((9L, 9L, "border collie")), "singleton elects itself")
  }

  test("electGolden on pre-labeled rows == resolveBest end-to-end (re-election path)") {
    import spark.implicits._
    val rows = Seq((1L, "golden retriever", 1L), (2L, "goldan retriever", 7L),
      (3L, "goldan retriefer", 7L), (9L, "border collie", 0L))
      .toDF("id", "s", "score")
    val full = EntityResolve.resolveBest(rows, "id", "s", "score", maxDist = 1)
      .orderBy("rec_id").collect().toSeq
    // feed the labels from a plain resolve back through electGolden only
    val labeled = EntityResolve.resolve(rows, "id", "s", maxDist = 1)
      .select($"rec_id".as("id"), $"rec_str".as("s"), $"entity")
      .join(rows.select($"id", $"score"), Seq("id"))
    val reElect = EntityResolve.electGolden(labeled, "id", "s", "score", "entity")
      .orderBy("rec_id").collect().toSeq
    assert(reElect == full)
  }

  test("field merges: longest / majority / latest / max follow their pinned tie rules") {
    import spark.implicits._
    val rows = Seq(
      // entity {1,2,3}: alias longest = "ccc-long" (len 8); tier majority =
      // 5 (two votes vs one); phone latest = 111 (max ts 30); amt max = 9
      (1L, "golden retriever", 1L, "aa", 5L, 10L, Some(7L), 30L),
      (2L, "goldan retriever", 7L, "ccc-long", 5L, 20L, Some(9L), 10L),
      (3L, "goldan retriefer", 7L, null, 4L, 30L, Some(111L), 20L),
      (9L, "border collie", 0L, null, 2L, 5L, None, 1L))
      .map { case (id, s, sc, al, ti, ts, ph, amt) =>
        (id, s, sc, Option(al), ti, ts, ph.map(_.toString).orNull, amt) }
      .toDF("id", "s", "score", "alias", "tier", "ts", "phone", "amt")
    val out = EntityResolve.resolveBest(rows, "id", "s", "score", maxDist = 1,
        mergeFields = Seq("alias" -> "longest", "tier" -> "majority",
          "phone" -> "latest", "amt" -> "max"),
        recencyCol = "ts")
      .collect().map(r => r.getLong(0) ->
        (r.getString(5), r.getLong(6), r.getString(7), r.getLong(8))).toMap
    assert(out(1L) == (("ccc-long", 5L, "111", 30L)))
    assert(out(2L) == out(1L) && out(3L) == out(1L))
    // singleton with an all-null alias/phone: merged columns stay null
    val nine = EntityResolve.resolveBest(rows, "id", "s", "score", maxDist = 1,
        mergeFields = Seq("alias" -> "longest", "phone" -> "latest"),
        recencyCol = "ts")
      .filter($"rec_id" === 9L).head()
    assert(nine.isNullAt(5) && nine.isNullAt(6))
  }

  test("mergeFields may name idCol/strCol/scoreCol themselves (ADVICE r16)") {
    import spark.implicits._
    val rows = Seq((1L, "golden retriever", 1L), (2L, "goldan retriever", 7L),
      (3L, "goldan retriefer", 7L), (9L, "border collie", 0L))
      .toDF("id", "s", "score")
    // merging the score with max, the id with min, the string with longest
    // previously died with an unresolved-column AnalysisException (the
    // columns are renamed rec_id/rec_str/__score__ before the merge aggs)
    val out = EntityResolve.resolveBest(rows, "id", "s", "score", maxDist = 1,
        mergeFields = Seq("score" -> "max", "id" -> "min", "s" -> "longest"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(5), r.getLong(6), r.getString(7))).toMap
    assert(out(1L) == ((7L, 1L, "golden retriever"))) // longest tie (all len 16) → larger value
    assert(out(2L) == out(1L) && out(3L) == out(1L))
    assert(out(9L) == ((0L, 9L, "border collie")))
    // `latest` keyed on the score column resolves too
    val latest = EntityResolve.resolveBest(rows, "id", "s", "score", maxDist = 1,
        mergeFields = Seq("s" -> "latest"), recencyCol = "score")
      .collect().map(r => r.getLong(0) -> r.getString(5)).toMap
    assert(latest(1L) == "goldan retriever") // max score 7, tie → larger string
  }
}
