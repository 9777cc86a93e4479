package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.dsl.ScriptRunner
import graft.operators.scale.Skew

/** Scale-machinery audits: salting correctness + bucketed co-located joins
  * (the 100 TB design levers the builder prompt names explicitly).
  */
class ScaleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("saltedJoin matches the plain join result") {
    import spark.implicits._
    val big = (1 to 1000).map(i => (i % 3, i)).toDF("k", "v") // 3 hot keys
    val small = Seq((0, "a"), (1, "b"), (2, "c")).toDF("k", "name")
    val plain = big.join(small, Seq("k")).select("k", "v", "name")
      .collect().map(_.toString).sorted.toSeq
    val salted = Skew.saltedJoin(big, small, Seq("k"), saltFactor = 8)
      .select("k", "v", "name").collect().map(_.toString).sorted.toSeq
    assert(salted == plain)
  }

  test("saltedSum matches the plain aggregation") {
    import spark.implicits._
    val df = (1 to 1000).map(i => (i % 2, i.toDouble)).toDF("k", "x")
    val plain = df.groupBy("k").sum("x").collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val salted = Skew.saltedSum(df, Seq("k"), "x", saltFactor = 8).collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(salted == plain)
  }

  test("bucketed tables join without a shuffle exchange") {
    Seq("b_orders", "b_customer").foreach { t =>
      spark.sql(s"drop table if exists $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) org.apache.commons.io.FileUtils.deleteDirectory(loc)
    }
    ScriptRunner.run(
      s"""load parquet.`$sf/orders.parquet` as o_src;
         |load parquet.`$sf/customer.parquet` as c_src;
         |drop table if exists b_orders;
         |drop table if exists b_customer;
         |save overwrite o_src as hive.`b_orders` where bucketBy="o_custkey" and numBuckets="4";
         |save overwrite c_src as hive.`b_customer` where bucketBy="c_custkey" and numBuckets="4";""".stripMargin,
      spark)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force a sort-merge join: broadcast would bypass the bucketing
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_orders")
        .join(spark.table("b_customer"),
          spark.table("b_orders")("o_custkey") === spark.table("b_customer")("c_custkey"))
      joined.count() // materialize with AQE final plan
      val plan = joined.queryExecution.executedPlan.toString
      // bucketing co-locates both sides: no shuffle (hash-partitioning) exchange
      assert(!plan.contains("Exchange hashpartitioning"), plan)
      assert(plan.contains("SortMergeJoin"), plan)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      ScriptRunner.run("drop table b_orders; drop table b_customer;", spark)
    }
  }
}
