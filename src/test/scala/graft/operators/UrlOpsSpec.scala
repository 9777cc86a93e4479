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

  test("scheme-less strings pass through with only the fragment stripped") {
    assert(canon("www.example.com/x?a=1#f")._1 == "www.example.com/x?a=1")
    assert(canon("not a url at all")._1 == "not a url at all")
  }

  test("domain is the last two host labels; deep subdomains collapse") {
    assert(canon("https://a.b.news.example.co/x")._3 == "example.co")
  }

  test("a retained non-default port never leaks into the domain") {
    // the canonical host keeps :8080, but per-domain grouping must not
    // collapse every ported host under '' (ADVICE r14)
    assert(canon("https://shop.example.com:8080/x") ==
      (("https://shop.example.com:8080/x", "shop.example.com:8080",
        "example.com")))
    // default port on a non-http(s) scheme also stays in host, not domain
    assert(canon("ftp://files.example.org:21/pub")._3 == "example.org")
  }

  test("the two crawl spellings of one page canonicalize identically") {
    val a = canon("HTTPS://WWW.Site.COM:443/a/?utm_source=x&b=2&a=1")._1
    val b = canon("https://site.com/a?a=1&b=2")._1
    assert(a == b && a == "https://site.com/a?a=1&b=2")
  }

  test("property: canonicalization is idempotent and spelling-invariant (seeded 200)") {
    import spark.implicits._
    val rnd = new scala.util.Random(4242)
    def randUrl(): (String, String) = {
      val scheme = Seq("http", "https")(rnd.nextInt(2))
      val host = Seq("alpha", "beta", "gamma")(rnd.nextInt(3)) +
        rnd.nextInt(50) + ".example" + (if (rnd.nextBoolean()) ".com" else ".org")
      val path = (0 until rnd.nextInt(3)).map(_ =>
        Seq("A", "b", "Cc", "d9")(rnd.nextInt(4))).mkString("/", "/", "")
      val keep = (0 until rnd.nextInt(3)).map(i => s"k$i=${rnd.nextInt(9)}")
      val canonQ = keep.sorted.mkString("&")
      val canonical = s"$scheme://$host${if (path == "/") "" else path}" +
        (if (canonQ.isEmpty) "" else s"?$canonQ")
      // a messy crawl spelling of the SAME page
      val port = if (scheme == "http") ":80" else ":443"
      val track = Seq("utm_source=z", "gclid=1", "fbclid=2")(rnd.nextInt(3))
      val q = rnd.shuffle(keep :+ track).mkString("&")
      val messy = s"${scheme.toUpperCase}://WWW.${host.toUpperCase}$port" +
        s"$path${if (path.endsWith("/")) "" else "/"}?$q#frag"
      (canonical, messy)
    }
    val pairs = Seq.fill(200)(randUrl())
    val df = pairs.toDF("expected", "url")
    val out = UrlOps.canonicalize(df, "url")
      .withColumn("recanon", UrlOps.canonicalCol(org.apache.spark.sql.functions.col("url_canon")))
      .collect()
    out.foreach { r =>
      assert(r.getAs[String]("url_canon") == r.getAs[String]("expected"),
        s"messy=${r.getAs[String]("url")}")
      assert(r.getAs[String]("recanon") == r.getAs[String]("url_canon"),
        s"not idempotent: ${r.getAs[String]("url_canon")}")
    }
  }
}
