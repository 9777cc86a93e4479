package graft.dsl

import org.scalatest.funsuite.AnyFunSuite
import graft.dsl.Parsing._

class ParsingSpec extends AnyFunSuite {

  test("maskQuoted hides quoted regions but keeps positions") {
    val s = """select 'a;s' as x"""
    val m = maskQuoted(s)
    assert(m.length == s.length)
    assert(!m.contains(";"))
    assert(m.contains("select"))
    assert(m.contains("as x"))
  }

  test("maskQuoted handles triple-quoted blocks") {
    val s = "set a = '''x as y where z''' where type=\"text\""
    val m = maskQuoted(s)
    assert(!m.contains("x as y"))
    assert(m.contains("where type="))
  }

  test("maskQuoted handles backticks") {
    val m = maskQuoted("load parquet.`/p/a where b.parquet` as t")
    assert(!m.contains("where b"))
    assert(m.contains("as t"))
  }

  test("stripTrailingAs takes the LAST top-level as") {
    val (body, t) = stripTrailingAs("select a as b, c from x as out")
    assert(t.contains("out"))
    assert(body == "select a as b, c from x")
  }

  test("stripTrailingAs ignores `as` inside strings") {
    val (body, t) = stripTrailingAs("select 'x as y' from t as out2")
    assert(t.contains("out2"))
    assert(body == "select 'x as y' from t")
  }

  test("stripTrailingAs returns None when no trailing as") {
    val (_, t) = stripTrailingAs("select a from t")
    assert(t.isEmpty)
  }

  test("parsePathRef splits format at the first dot, strips backticks") {
    assert(parsePathRef("parquet.`/a/b.parquet`") == PathRef("parquet", "/a/b.parquet"))
    assert(parsePathRef("jdbc.`db.table`") == PathRef("jdbc", "db.table"))
    assert(parsePathRef("jsonStr.rawdata") == PathRef("jsonStr", "rawdata"))
    assert(parsePathRef("ScriptUDF.``") == PathRef("ScriptUDF", ""))
    assert(parsePathRef("console") == PathRef("console", ""))
  }

  test("splitOptionsClause splits at top-level where/options only") {
    val (before, clause) = splitOptionsClause("""csv.`/p` where header="true" and sep=",".""")
    assert(before == "csv.`/p`")
    assert(clause.startsWith("header="))
    val (b2, c2) = splitOptionsClause("parquet.`/x where y`")
    assert(b2 == "parquet.`/x where y`" && c2 == "")
  }

  test("stripPartitionBy extracts the column list") {
    val (rest, cols) = stripPartitionBy("parquet.`/p` partitionBy a, b where k=\"v\"")
    assert(cols == Seq("a", "b"))
    assert(rest.contains("parquet.`/p`") && rest.contains("where"))
  }

  test("nextToken respects quoting") {
    val (tok, rest) = nextToken("parquet.`/a b/c` as t")
    assert(tok == "parquet.`/a b/c`")
    assert(rest == "as t")
  }
}
