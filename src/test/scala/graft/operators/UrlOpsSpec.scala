package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.operators.text.UrlOps

class UrlOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def canon(u: String): (String, String, String) = {
    import spark.implicits._
    val r = UrlOps.canonicalize(Seq(Tuple1(u)).toDF("url"), "url").collect()(0)
    (r.getAs[String]("url_canon"), r.getAs[String]("host"),
      r.getAs[String]("domain"))
  }

  test("scheme/host lowercase, www and default port strip, fragment drop") {
    assert(canon("HTTPS://WWW.Example.COM:443/Path/One#frag") ==
      (("https://example.com/Path/One", "example.com", "example.com")))
    assert(canon("http://www.Site.org:80/") ==
      (("http://site.org", "site.org", "site.org")))
    // non-default port survives; non-matching scheme keeps its port
    assert(canon("https://a.b.com:8443/x")._1 == "https://a.b.com:8443/x")
  }

  test("path case preserved, trailing slash stripped, root path dropped") {
    assert(canon("https://e.com/A/B/")._1 == "https://e.com/A/B")
    assert(canon("https://e.com/")._1 == "https://e.com")
  }

  test("tracking params drop, survivors sort, emptied query loses its ?") {
    assert(canon("https://e.com/p?utm_source=x&b=2&a=1&gclid=g")._1 ==
      "https://e.com/p?a=1&b=2")
    assert(canon("https://e.com/p?utm_campaign=c&fbclid=f&ref=r")._1 ==
      "https://e.com/p")
    // query case preserved, '=' - less params kept
    assert(canon("https://e.com/p?Z=9&flag")._1 == "https://e.com/p?Z=9&flag")
  }

  test("domain is the last two host labels; deep subdomains collapse") {
    assert(canon("https://a.b.news.example.co/x")._3 == "example.co")
  }

  test("the two crawl spellings of one page canonicalize identically") {
    val a = canon("HTTPS://WWW.Site.COM:443/a/?utm_source=x&b=2&a=1")._1
    val b = canon("https://site.com/a?a=1&b=2")._1
    assert(a == b && a == "https://site.com/a?a=1&b=2")
  }
}
