package graft.ets

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.dsl.ScriptRunner

/** The Arrow subprocess bridge (VERDICT r18 stretch #7): real python3
  * workers when the environment has them, `assume`-skipped otherwise —
  * the same environment-gating convention as the Kafka/Delta slots.
  */
class PythonTransformSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def available: Boolean = PythonTransformET.unavailableReason.isEmpty

  test("PythonTransform: DSL round trip — pyarrow compute over a table") {
    assume(available, s"skipped: ${PythonTransformET.unavailableReason.getOrElse("")}")
    val df = ScriptRunner.runToDF(
      s"""load parquet.`$sf/nation.parquet` as pt_nation;
         |select n_nationkey, n_name from pt_nation as pt_in;
         |run pt_in as PythonTransform.`` where schema="n_nationkey int, uname string"
         |and code='''
         |import pyarrow as pa
         |import pyarrow.compute as pc
         |def transform(table):
         |    return pa.table({
         |        "n_nationkey": table.column("n_nationkey"),
         |        "uname": pc.utf8_upper(table.column("n_name")),
         |    })
         |''' as pt_out;
         |select * from pt_out order by n_nationkey as pt_final;""".stripMargin, spark)
    val rows = df.collect().map(r => (r.getInt(0), r.getString(1)))
    val want = spark.read.parquet(s"$sf/nation.parquet")
      .selectExpr("n_nationkey", "upper(n_name) as uname")
      .orderBy("n_nationkey")
      .collect().map(r => (r.getInt(0), r.getString(1)))
    assert(rows.toSeq == want.toSeq)
  }

  test("PythonTransform: multi-batch + row-count-changing transform (filter in python)") {
    assume(available, s"skipped: ${PythonTransformET.unavailableReason.getOrElse("")}")
    import spark.implicits._
    val src = spark.range(0, 10000).select($"id")
    src.createOrReplaceTempView("pt_ids")
    val df = ScriptRunner.runToDF(
      """run pt_ids as PythonTransform.`` where schema="id bigint, dbl bigint"
        |and batchSize="512" and code='''
        |import pyarrow as pa
        |import pyarrow.compute as pc
        |def transform(table):
        |    keep = table.filter(pc.equal(pc.bit_wise_and(table.column("id"), 1), 0))
        |    return pa.table({"id": keep.column("id"),
        |                     "dbl": pc.multiply(keep.column("id"), 2)})
        |''' as pt_even;""".stripMargin, spark)
    assert(df.count() == 5000)
    assert(df.selectExpr("sum(case when dbl = id * 2 then 0 else 1 end)")
      .head().getLong(0) == 0L)
  }

  test("PythonTransform: worker error surfaces with the python stderr, not a hang") {
    assume(available, s"skipped: ${PythonTransformET.unavailableReason.getOrElse("")}")
    import spark.implicits._
    spark.range(0, 10).toDF("id").createOrReplaceTempView("pt_boom")
    val e = intercept[Exception] {
      ScriptRunner.runToDF(
        """run pt_boom as PythonTransform.`` where schema="id bigint" and code='''
          |def transform(table):
          |    raise ValueError("boom from python")
          |''' as pt_out;""".stripMargin, spark).collect()
    }
    def chain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).map(_.getMessage).toSeq
    assert(chain(e).exists(m => m != null && m.contains("boom from python")))
  }

  test("""ScriptUDF lang="python": scalar round trip over real CPython""") {
    assume(PythonUdf.unavailableReason.isEmpty,
      s"skipped: ${PythonUdf.unavailableReason.getOrElse("")}")
    val df = ScriptRunner.runToDF(
      s"""register ScriptUDF.`` as pyNorm where lang="python" and dataType="string"
         |and code='''
         |def apply(s, n):
         |    return ("%s|%d" % (s.strip().lower(), n * 2))
         |''';
         |load parquet.`$sf/nation.parquet` as pyu_nation;
         |select pyNorm(n_name, n_nationkey) as r from pyu_nation
         |  order by n_nationkey limit 2 as pyu_out;""".stripMargin, spark)
    val got = df.collect().map(_.getString(0)).toSeq
    val want = spark.read.parquet(s"$sf/nation.parquet")
      .selectExpr("concat(lower(trim(n_name)), '|', n_nationkey * 2) as r", "n_nationkey")
      .orderBy("n_nationkey").limit(2).collect().map(_.getString(0)).toSeq
    assert(got == want)
  }

  test("""ScriptUDF lang="python": array/long types + python error propagation""") {
    assume(PythonUdf.unavailableReason.isEmpty,
      s"skipped: ${PythonUdf.unavailableReason.getOrElse("")}")
    val df = ScriptRunner.runToDF(
      """register ScriptUDF.`` as pySum where lang="python" and dataType="long"
        |and code='''
        |def apply(xs):
        |    return sum(xs)
        |''';
        |select pySum(array(1L, 2L, 3L)) as s as pyu_arr;""".stripMargin, spark)
    assert(df.head().getLong(0) == 6L)
    // a python exception surfaces as a job failure naming the error
    val e = intercept[Exception] {
      ScriptRunner.runToDF(
        """register ScriptUDF.`` as pyBoom where lang="python" and dataType="long"
          |and code='''
          |def apply(x):
          |    raise RuntimeError("pyboom")
          |''';
          |select pyBoom(1L) as s as pyu_boom;""".stripMargin, spark).collect()
    }
    def chain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).map(_.getMessage).toSeq
    assert(chain(e).exists(m => m != null && m.contains("pyboom")))
  }

  test("PythonTransform: a hanging transform is killed at the timeout, not held forever") {
    // VERDICT r19 #4 / ADVICE r19: a user transform that blocks must fail
    // the task with an actionable error within the bound, never hold it
    // until an external kill
    assume(available, s"skipped: ${PythonTransformET.unavailableReason.getOrElse("")}")
    import spark.implicits._
    spark.range(0, 8).toDF("id").coalesce(1).createOrReplaceTempView("pt_hang")
    val t0 = System.nanoTime()
    val e = intercept[Exception] {
      ScriptRunner.runToDF(
        """run pt_hang as PythonTransform.`` where schema="id bigint"
          |and timeout="2" and code='''
          |import time
          |def transform(table):
          |    time.sleep(3600)
          |''' as pt_out;""".stripMargin, spark).collect()
    }
    val sec = (System.nanoTime() - t0) / 1e9
    assert(sec < 60.0, s"hang was not bounded: took $sec s")
    def chain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).map(_.getMessage).toSeq
    assert(chain(e).exists(m => m != null && m.contains("no output for")))
  }

  test("""ScriptUDF lang="python" rejects udfType="udaf" loudly (ADVICE r19)""") {
    // throws at registration time, BEFORE the python3 probe — no assume
    val e = intercept[Exception] {
      ScriptRunner.runToDF(
        """register ScriptUDF.`` as pyAgg where lang="python" and udfType="udaf"
          |and dataType="long" and code='''
          |def apply(x):
          |    return x
          |''';""".stripMargin, spark)
    }
    def chain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).map(_.getMessage).toSeq
    assert(chain(e).exists(m => m != null &&
      m.contains("""supports udfType="udf" only""")))
  }

  test("PythonTransform: schema mismatch is an actionable error") {
    assume(available, s"skipped: ${PythonTransformET.unavailableReason.getOrElse("")}")
    import spark.implicits._
    spark.range(0, 10).toDF("id").createOrReplaceTempView("pt_schema")
    val e = intercept[Exception] {
      ScriptRunner.runToDF(
        """run pt_schema as PythonTransform.`` where schema="wrong string" and code='''
          |def transform(table):
          |    return table
          |''' as pt_out;""".stripMargin, spark).collect()
    }
    def chain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).map(_.getMessage).toSeq
    assert(chain(e).exists(m => m != null && m.contains("expected")))
  }
}
