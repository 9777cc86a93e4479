package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.dsl.ScriptRunner

/** End-to-end JDBC source/sink against embedded Derby — the real
  * execution of what earlier rounds could only dialect-test: DSL
  * connect/load/save, directQuery, and the keyed upsert (standard-SQL
  * update-then-insert fallback path).
  */
class JdbcSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def freshUrl(): String = {
    val dir = Files.createTempDirectory("graft_derby_src").toFile
    dir.delete()
    s"jdbc:derby:${dir.getAbsolutePath};create=true"
  }

  test("DSL connect + save + load round trip") {
    val url = freshUrl()
    ScriptRunner.run(
      s"""connect jdbc where url="$url" as db1;
         |select 1 as k, 'x' as v as t_in;
         |save overwrite t_in as jdbc.`db1.RT`;""".stripMargin, spark)
    val back = ScriptRunner.runToDF(
      s"""connect jdbc where url="$url" as db1;
         |load jdbc.`db1.RT` as t_out;""".stripMargin, spark)
    assert(back.collect().map(r => (r.getInt(0), r.getString(1))).toSeq == Seq((1, "x")))
  }

  test("directQuery pushes verbatim SQL to the database") {
    val url = freshUrl()
    spark.range(0, 10).select(col("id").as("k"), (col("id") * 2).as("dbl"))
      .write.format("jdbc").option("url", url).option("dbtable", "DQ").save()
    val df = ScriptRunner.runToDF(
      s"""connect jdbc where url="$url" as db2;
         |load jdbc.`db2.ignored` where directQuery='''SELECT COUNT(*) AS n FROM DQ WHERE "k" >= 5''' as dq;""".stripMargin,
      spark)
    assert(df.collect().head.get(0).toString.toLong == 5L)
  }

  test("keyed upsert on an engine without a native upsert clause (update-then-insert)") {
    val url = freshUrl()
    // seed (1,a),(2,b) with a real PK so a broken fallback would violate it
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.executeUpdate("""CREATE TABLE UP ("k" INT PRIMARY KEY, "v" VARCHAR(16))""")
      st.executeUpdate("""INSERT INTO UP VALUES (1, 'a'), (2, 'b')""")
    } finally conn.close()
    // upsert (2,B) update, (3,C) insert, plus a same-key duplicate (3,C2):
    // last occurrence wins, and the PK proves no double insert happened
    ScriptRunner.run(
      s"""connect jdbc where url="$url" as db3;
         |select * from (values (2, 'B'), (3, 'C'), (3, 'C2')) as t(k, v) as up_in;
         |save append up_in as jdbc.`db3.UP` where idCol="k";""".stripMargin, spark)
    val out = spark.read.format("jdbc").option("url", url).option("dbtable", "UP")
      .load().collect().map(r => (r.getInt(0), r.getString(1))).sortBy(_._1).toSeq
    assert(out == Seq((1, "a"), (2, "B"), (3, "C2")))
  }

  test("JDBC command ET executes DDL/DML statements in order") {
    val url = freshUrl()
    val df = ScriptRunner.runToDF(
      s"""connect jdbc where url="$url" as db4;
         |run command as JDBC.`db4` where
         |  driver-statement-0="CREATE TABLE CMD(i INT)" and
         |  driver-statement-1="INSERT INTO CMD VALUES (7), (8)";
         |load jdbc.`db4.CMD` as cmd_out;""".stripMargin, spark)
    assert(df.collect().map(_.getInt(0)).sorted.toSeq == Seq(7, 8))
  }

  test("streamJDBC sink: micro-batches land in the database, idCol re-delivery stays idempotent") {
    val url = freshUrl()
    val conn = java.sql.DriverManager.getConnection(url)
    try conn.createStatement().executeUpdate(
      """CREATE TABLE SJ ("k" INT PRIMARY KEY, "v" VARCHAR(16))""")
    finally conn.close()
    def runOnce(name: String): Unit = {
      val ctx = ScriptRunner.run(
        s"""set streamName = "$name";
           |connect jdbc where url="$url" as db5;
           |select * from (values (1, 'a'), (2, 'b'), (3, 'c')) as t(k, v) as sj_in;
           |load mockStream.`sj_in` as sj_stream;
           |save append sj_stream as streamJDBC.`db5.SJ` where idCol="k"
           |  and mode="append"
           |  and checkpointLocation="${Files.createTempDirectory(s"ck_$name")}"
           |  and duration="0";""".stripMargin, spark)
      val q = ctx.streams(name)
      q.processAllAvailable()
      q.stop()
    }
    runOnce("sjdbc1")
    runOnce("sjdbc2") // same rows again: upsert path, PK proves idempotence
    val out = spark.read.format("jdbc").option("url", url).option("dbtable", "SJ")
      .load().collect().map(r => (r.getInt(0), r.getString(1))).sortBy(_._1).toSeq
    assert(out == Seq((1, "a"), (2, "b"), (3, "c")))
  }

  test("upsert of 2500 rows batches across the 1000-row flush boundary") {
    val url = freshUrl()
    spark.range(0, 500).select(col("id").cast("int").as("k"),
        lit("old").as("v"))
      .write.format("jdbc").option("url", url).option("dbtable", "BIG")
      .option("createTableColumnTypes", "v VARCHAR(16)").save()
    val up = spark.range(0, 2500).select(col("id").cast("int").as("k"),
      concat(lit("new_"), col("id")).as("v"))
    JdbcUpsert.upsert(up, Map("url" -> url, "dbtable" -> "BIG", "idCol" -> "k"))
    val out = spark.read.format("jdbc").option("url", url)
      .option("dbtable", "BIG").load()
    assert(out.count() == 2500)
    assert(out.filter(col("v") === "old").count() == 0)
    assert(out.filter(col("v") === "new_499").count() == 1)
  }
}
