package graft.ets

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.dsl.ScriptRunner

/** ScriptUDF E2E in the reference's DslSpec style
  * (reference test: tech/mlsql/test/dsl/DslSpec.scala:159 "ScalaScriptUDF").
  */
class ScriptUDFSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def runDF(script: String) = ScriptRunner.runToDF(script, spark)

  test("bare-def scala UDF via code option") {
    val df = runDF(
      """register ScriptUDF.`` as plusFun where lang="scala" and udfType="udf"
        |  and code='''def apply(a: Long, b: Long): Long = a + b''';
        |select plusFun(1L, 2L) as r as out;""".stripMargin)
    assert(df.head().getLong(0) == 3L)
  }

  test("UDF from a script table (load script.`v` pattern)") {
    val df = runDF(
      """set udfCode = '''def apply(s: String): String = s.toUpperCase''';
        |load script.`udfCode` as codeTable;
        |register ScriptUDF.`codeTable` as upperFun;
        |select upperFun('graft') as r as out;""".stripMargin)
    assert(df.head().getString(0) == "GRAFT")
  }

  test("class-based UDF with className/methodName") {
    val df = runDF(
      """register ScriptUDF.`` as echoFun where
        |  className="Echo" and methodName="echo"
        |  and code='''class Echo { def echo(s: String): String = "echo:" + s }''';
        |select echoFun('x') as r as out;""".stripMargin)
    assert(df.head().getString(0) == "echo:x")
  }

  test("UDF over table columns") {
    val df = runDF(
      s"""load parquet.`/root/testdata/sf0.001/nation.parquet` as nation;
         |register ScriptUDF.`` as keyTimesTwo where
         |  code='''def apply(k: Int): Int = k * 2''';
         |select n_nationkey, keyTimesTwo(n_nationkey) as dbl from nation
         |  order by n_nationkey as out;""".stripMargin)
    val rows = df.collect()
    assert(rows.forall(r => r.getInt(1) == r.getInt(0) * 2))
  }

  test("Aggregator-based UDAF") {
    val df = runDF(
      """register ScriptUDF.`` as mySum where udfType="udaf" and className="SumAgg"
        |  and code='''
        |import org.apache.spark.sql.expressions.Aggregator
        |import org.apache.spark.sql.Encoder
        |import org.apache.spark.sql.Encoders
        |class SumAgg extends Aggregator[Long, Long, Long] {
        |  def zero: Long = 0L
        |  def reduce(b: Long, a: Long): Long = b + a
        |  def merge(b1: Long, b2: Long): Long = b1 + b2
        |  def finish(r: Long): Long = r
        |  def bufferEncoder: Encoder[Long] = Encoders.scalaLong
        |  def outputEncoder: Encoder[Long] = Encoders.scalaLong
        |}''';
        |select mySum(x) as total from (select explode(array(1L, 2L, 3L)) as x) as out;""".stripMargin)
    assert(df.head().getLong(0) == 6L)
  }

  test("compilation errors surface with the generated source") {
    val e = intercept[IllegalArgumentException] {
      runDF(
        """register ScriptUDF.`` as badFun where code='''def apply(a: Int) = nonsense''';
          |select badFun(1) as r as out;""".stripMargin)
    }
    assert(e.getMessage.contains("ScriptUDF compilation failed"))
  }

  test("compiled UDFs are cached by code hash") {
    val script =
      """register ScriptUDF.`` as cachedFun where code='''def apply(a: Int): Int = a + 10''';
        |select cachedFun(5) as r as out;""".stripMargin
    val t0 = System.nanoTime(); runDF(script); val cold = System.nanoTime() - t0
    val t1 = System.nanoTime(); runDF(script); val warm = System.nanoTime() - t1
    assert(warm < cold)
  }
}
