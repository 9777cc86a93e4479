package graft.dsl

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

class StatementSplitterSpec extends AnyFunSuite {

  test("splits on semicolons") {
    assert(StatementSplitter.split("a;b; c ;") == Seq("a", "b", "c"))
  }

  test("semicolons inside strings do not split") {
    assert(StatementSplitter.split("select 'a;b' as x; next") ==
      Seq("select 'a;b' as x", "next"))
  }

  test("triple-quoted blocks span semicolons and newlines") {
    val s = "set a = '''x;\ny;''' ; select 1 as t;"
    assert(StatementSplitter.split(s) == Seq("set a = '''x;\ny;'''", "select 1 as t"))
  }

  test("backticked paths with semicolons survive") {
    assert(StatementSplitter.split("load csv.`/a;b` as t;") == Seq("load csv.`/a;b` as t"))
  }

  test("-- comments are stripped to end of line") {
    val s = "select 1 -- trailing; comment\n as t;"
    assert(StatementSplitter.split(s) == Seq("select 1 \n as t"))
  }

  test("property: joining split statements with ';' re-splits identically") {
    val stmtGen = Gen.nonEmptyListOf(Gen.oneOf(
      Gen.alphaNumStr.suchThat(_.nonEmpty),
      Gen.const("'a;b'"), Gen.const("`p;q`"), Gen.const("'''x;\ny'''")
    )).map(_.mkString(" "))
    val prop = Prop.forAll(Gen.nonEmptyListOf(stmtGen)) { stmts =>
      val script = stmts.map(_ + ";").mkString("\n")
      StatementSplitter.split(script) == stmts.map(_.trim).filter(_.nonEmpty)
    }
    val result = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(result.passed, result.status.toString)
  }
}
