package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.operators.sampling.ClusterSample

/** Cluster-balanced sampling (p46 covers DuckDB oracle parity; these pin
  * assignment/tie-break/quota semantics on hand-built geometry).
  */
class ClusterSampleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def vecs(rows: (Long, Seq[Double])*) = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
  }

  // two orthogonal centroids
  private def cents = vecs(0L -> Seq(1.0, 0.0), 1L -> Seq(0.0, 1.0))
    .select(col("vec_id").as("cid"), col("embedding").as("cv"))

  test("assign picks the nearest centroid; ties go to the smallest cid") {
    val corpus = vecs(
      10L -> Seq(0.9, 0.1),  // → centroid 0
      11L -> Seq(0.1, 0.9),  // → centroid 1
      12L -> Seq(0.5, 0.5))  // equidistant → smallest cid (0)
    val a = ClusterSample.assign(corpus, "vec_id", "embedding", cents, "cid", "cv")
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("cluster")).toMap
    assert(a == Map(10L -> 0, 11L -> 1, 12L -> 0))
  }

  test("null vectors are dropped, not assigned") {
    import spark.implicits._
    val corpus = Seq((10L, Some(Seq(1.0, 0.0))), (11L, Option.empty[Seq[Double]]))
      .toDF("vec_id", "embedding")
    val ids = ClusterSample.assign(corpus, "vec_id", "embedding", cents, "cid", "cv")
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(10L))
  }

  test("balanced keeps m per cluster; central takes highest sims, spread lowest") {
    // four docs near centroid 0 at decreasing similarity, one near centroid 1
    val corpus = vecs(
      10L -> Seq(1.0, 0.0), 11L -> Seq(0.95, 0.05), 12L -> Seq(0.8, 0.2),
      13L -> Seq(0.7, 0.3), 20L -> Seq(0.0, 1.0))
    def ids(central: Boolean) = ClusterSample
      .balanced(corpus, "vec_id", "embedding", cents, "cid", "cv", m = 2,
        central = central)
      .filter(col("cluster") === 0).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    assert(ids(central = true) == Set(10L, 11L))
    assert(ids(central = false) == Set(12L, 13L))
    val c1 = ClusterSample.balanced(corpus, "vec_id", "embedding", cents,
      "cid", "cv", m = 2).filter(col("cluster") === 1)
      .collect().map(_.getLong(0)).toSet
    assert(c1 == Set(20L))
  }

  test("KMeans fit → ClusterSample through the DSL (s27): invariants + determinism") {
    // the seeded k-means|| fit itself is not DuckDB-replayable (s27's
    // oracle boundary sits at the exported centroids); the fit-side
    // invariants live here: the fitted model's k centroids drive the
    // assignment, every cluster's quota holds, the selection is a subset
    // of the corpus, and a re-run is identical
    def runOnce(): Map[Int, Long] = graft.dsl.ScriptRunner.runToDF(
      s"""load parquet.`/root/testdata/sf0.001/embeddings.parquet` as ck_embs;
         |select vec_id, embedding,
         |  vec_dense(to_array_double(embedding)) as features
         |from ck_embs as ck_feat;
         |train ck_feat as KMeans.`/tmp/graft_ck_km` where k="8"
         |  and seed="7" and maxIter="5" as ck_ts;
         |run ck_embs as ClusterSample.`` where
         |  centroidsModel="/tmp/graft_ck_km" and mode="central" and m="40"
         |  as ck_bal;
         |select cluster, count(*) as n from ck_bal
         |group by cluster order by cluster as ck_out;""".stripMargin, spark)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val h1 = runOnce()
    assert(h1.keys.forall(c => c >= 0 && c < 8), s"cluster ids out of range: $h1")
    assert(h1.values.forall(_ <= 40L), s"quota violated: $h1")
    assert(h1.values.sum > 0 && h1.size > 1, s"degenerate clustering: $h1")
    val h2 = runOnce()
    assert(h2 == h1, "fit + sample must be deterministic run-to-run")
  }
}
