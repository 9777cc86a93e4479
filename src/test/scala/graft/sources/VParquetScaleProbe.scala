package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.Tag
import graft.TestSpark
import org.apache.spark.sql.functions._

/** Manual scale probe (not part of the default gate assertions beyond
  * sanity): 600k-row bucketed table, 100-row CDC merge — checks the merge
  * cost is bucket-proportional and prints the timing + plan facts.
  */
class VParquetScaleProbe extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("bucketed CDC merge touches few buckets and stays sub-second-ish", Tag("probe")) {
    import spark.implicits._
    val t = java.nio.file.Files.createTempDirectory("vp_probe").toString + "/t"
    val base = spark.range(600000).select($"id".as("k"),
      concat(lit("v"), $"id").as("v"))
    VParquet.merge(base, t, Seq("k"), Some(64), None)
    val m0 = VParquet.readManifest(spark, t, 0)
    val batch = spark.range(100).select(($"id" * 6000).as("k"), lit("UPD").as("v"))
    val t0 = System.nanoTime
    VParquet.merge(batch, t, Seq("k"), Some(64), None)
    val secs = (System.nanoTime - t0) / 1e9
    // warm second merge on ONE key: touches 1 bucket only
    val t1 = System.nanoTime
    VParquet.merge(spark.range(1).select(lit(7L).as("k"), lit("ONE").as("v")),
      t, Seq("k"), Some(64), None)
    info(f"one_key_merge_secs=${(System.nanoTime - t1) / 1e9}%.2f " +
      s"files_v2=${VParquet.readManifest(spark, t, 2).files.size}")
    val m1 = VParquet.readManifest(spark, t, 1)
    val carried = m1.files.map(_.path).toSet
      .intersect(m0.files.map(_.path).toSet).size
    info(f"merge_secs=$secs%.2f files_v0=${m0.files.size} " +
      f"files_v1=${m1.files.size} carried=$carried")
    // 100 distinct keys over 64 buckets: some buckets untouched w.h.p. —
    // their files must be carried by reference, not rewritten
    assert(carried > 0)
    assert(m1.files.size <= m0.files.size + 64)
    val cur = VParquet.loadVersion(spark, t, None, None)
    assert(cur.count() == 600000)
    assert(cur.filter($"v" === "UPD").count() == 100)
  }
}
