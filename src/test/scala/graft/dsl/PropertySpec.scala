package graft.dsl

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** ScalaCheck properties for the parsing/templating spine. */
class PropertySpec extends AnyFunSuite {

  private def check(prop: Prop, n: Int = 200): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(r.passed, r.status.toString)
  }

  private val ident: Gen[String] = for {
    h <- Gen.alphaChar
    t <- Gen.listOfN(5, Gen.alphaNumChar)
  } yield (h :: t).mkString

  test("maskQuoted preserves length and top-level text for any input") {
    val g = Gen.listOf(Gen.oneOf(
      Gen.alphaNumStr, Gen.const("'q;q'"), Gen.const("\"d d\""),
      Gen.const("`b.b`"), Gen.const("'''t\nt'''"), Gen.const(";"), Gen.const(" as ")
    )).map(_.mkString(" "))
    check(Prop.forAll(g) { s => Parsing.maskQuoted(s).length == s.length })
  }

  test("template merge substitutes every defined var and only those") {
    val kv = for { k <- ident; v <- Gen.alphaNumStr } yield (k, v)
    check(Prop.forAll(Gen.mapOf(kv), ident) { (env, extra) =>
      val known = env.keys.toSeq.sorted
      val text = known.map(k => s"$${$k}").mkString(" ") + s" $${__undefined_$extra}"
      val merged = Template.merge(text, env)
      known.forall(k => merged.contains(env(k)) || env(k).isEmpty) &&
        merged.contains(s"$${__undefined_$extra}")
    })
  }

  test("template merge resolves variable chains transitively (fixpoint)") {
    val g = for {
      names <- Gen.listOfN(6, ident).map(_.distinct).suchThat(_.size >= 2)
      leaf <- Gen.alphaNumStr.suchThat(_.nonEmpty)
    } yield (names, leaf)
    check(Prop.forAll(g) { case (names, leaf) =>
      // names(0) -> ${names(1)} -> ... -> leaf
      val env = names.init.zip(names.tail).map { case (a, b) => a -> s"$${$b}" }.toMap +
        (names.last -> leaf)
      Template.merge(s"$${${names.head}}", env) == leaf
    })
  }

  test("resolvePath with a prefix never yields a path outside it for relative inputs") {
    val seg = Gen.oneOf(ident, Gen.const(".."), Gen.const("."))
    val rel = Gen.nonEmptyListOf(seg).map(_.mkString("/"))
    val ctx = new ScriptContext(null, "/home/tenant")
    check(Prop.forAll(rel) { p =>
      try {
        val r = ctx.resolvePath(p)
        r == "/home/tenant" || r.startsWith("/home/tenant/")
      } catch { case _: IllegalArgumentException => true } // escape rejected
    })
  }

  test("parseOptions round-trips generated key/value pairs") {
    val kv = for {
      k <- ident
      v <- Gen.alphaNumStr.suchThat(v => !v.contains("\"") && !v.contains("\\"))
    } yield (k, v)
    check(Prop.forAll(Gen.nonEmptyMap(kv)) { opts =>
      val clause = opts.map { case (k, v) => s"""$k="$v"""" }.mkString(" and ")
      Template.parseOptions(clause, Map.empty) == opts
    })
  }

  test("stripTrailingAs returns a name exactly when a top-level trailing as exists") {
    check(Prop.forAll(ident, Gen.alphaNumStr) { (tbl, body0) =>
      val body = s"select '$body0' from x"
      val (b, t) = Parsing.stripTrailingAs(s"$body as $tbl")
      b == body && t.contains(tbl)
    })
  }

  test("unquoteValue strips exactly one quoting level") {
    check(Prop.forAll(Gen.alphaNumStr) { v =>
      ScriptRunner.unquoteValue(s""""$v"""") == v &&
        ScriptRunner.unquoteValue(s"'$v'") == v &&
        ScriptRunner.unquoteValue(s"'''$v'''") == v
    })
  }
}
