package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Correctness of the scale-stress blow-up generator (the timing sweep
  * itself is a manual per-round main — see [[ScaleSweep]]): the blown-up
  * tables must be m× the rows with disjoint re-keyed id ranges, the
  * mod-20 split proportions must survive (s26's eval split), copy-tagged
  * text must share no 3-gram shingle across copies (dedup joins stay
  * linear), and sign-flipped embedding copies must not be near-dups of
  * their originals.
  */
class ScaleSweepSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val base = "/root/testdata/sf0.001"
  private lazy val out = {
    val d = java.nio.file.Files.createTempDirectory("graft_blowup").toString
    ScaleSweep.blowUp(spark, base, 3, d)
    d
  }

  test("blow-up multiplies rows with disjoint key ranges") {
    import spark.implicits._
    for ((tbl, key) <- Seq("documents" -> "doc_id", "embeddings" -> "vec_id",
        "customer" -> "c_custkey", "orders" -> "o_orderkey")) {
      val orig = spark.read.parquet(s"$base/$tbl.parquet")
      val blown = spark.read.parquet(s"$out/$tbl.parquet")
      assert(blown.count() == 3 * orig.count(), tbl)
      assert(blown.select(key).distinct().count() ==
        3 * orig.select(key).distinct().count(), s"$tbl keys must stay unique")
    }
    // mod-20 proportions survive (stride divisible by 20)
    val d0 = spark.read.parquet(s"$base/documents.parquet")
      .filter($"doc_id" % 20 === 0).count()
    val db = spark.read.parquet(s"$out/documents.parquet")
      .filter($"doc_id" % 20 === 0).count()
    assert(db == 3 * d0, "doc_id % 20 split must scale proportionally")
  }

  test("copy-tagged text shares no 3-gram shingle across copies") {
    import spark.implicits._
    val sh = graft.operators.dedup.TextDedup.shingles(
      spark.read.parquet(s"$out/documents.parquet"), "doc_id", "text", 3)
      .withColumn("copy", $"doc_id" / lit(10000000L) cast "long")
    // every shingle's doc set must sit inside ONE copy: tagging every 3rd
    // word means all 3-gram windows contain a tagged word
    val cross = sh.select(explode($"shingles").as("s"), $"copy").distinct()
      .groupBy($"s").agg(countDistinct($"copy").as("nc"))
      .filter($"nc" > 1).count()
    assert(cross == 0, s"$cross shingles crossed copies")
  }

  test("mixed embedding copies are not near-dups of their originals") {
    // aligned (original, copy-of-same-vector) pairs are the worst case
    // for synthetic near-dup inflation; the orthogonal per-copy mixer
    // must keep essentially all of them below the 0.45 pair threshold,
    // or the sweep's pair output would grow super-linearly BY
    // CONSTRUCTION rather than by operator behavior
    import spark.implicits._
    val e = spark.read.parquet(s"$out/embeddings.parquet")
    val a = e.filter($"vec_id" < 10000000L)
      .select($"vec_id".as("ida"), $"embedding".as("va"))
    val b = e.filter($"vec_id" >= 10000000L && $"vec_id" < 20000000L)
      .select(($"vec_id" - 10000000L).as("idb"), $"embedding".as("vb"))
    val sims = a.join(b, $"ida" === $"idb")
      .select(abs(expr(
        "arr_cosine(cast(va as array<double>), cast(vb as array<double>))")).as("sim"))
      .collect().map(_.getDouble(0))
    val over = sims.count(_ >= 0.45)
    assert(over <= math.max(1, sims.length / 50),
      s"$over/${sims.length} aligned copy pairs cleared the 0.45 threshold")
  }
}
