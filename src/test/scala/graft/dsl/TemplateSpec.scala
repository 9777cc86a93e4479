package graft.dsl

import org.scalatest.funsuite.AnyFunSuite

class TemplateSpec extends AnyFunSuite {

  test("merge substitutes known vars, leaves unknown verbatim") {
    val env = Map("a" -> "1", "b.c" -> "x")
    assert(Template.merge("v=${a} w=${ b.c } u=${nope}", env) == "v=1 w=x u=${nope}")
  }

  test("merge handles replacement text containing $ and backslash") {
    assert(Template.merge("${p}", Map("p" -> """c:\x$y""")) == """c:\x$y""")
  }

  test("parseOptions handles all three quote forms") {
    val opts = Template.parseOptions(
      """a="v1" and b='v2' and c='''multi "quoted" line'''""", Map.empty)
    assert(opts == Map("a" -> "v1", "b" -> "v2", "c" -> """multi "quoted" line"""))
  }

  test("parseOptions unescapes and applies templating to values") {
    val opts = Template.parseOptions("""k="x \"y\" ${v}"""", Map("v" -> "z"))
    assert(opts("k") == """x "y" z""")
  }

  test("parseOptions: keys may contain dots and dashes") {
    val opts = Template.parseOptions("""spark.sql.shuffle.partitions="8" and a-b="c"""", Map.empty)
    assert(opts("spark.sql.shuffle.partitions") == "8" && opts("a-b") == "c")
  }
}
