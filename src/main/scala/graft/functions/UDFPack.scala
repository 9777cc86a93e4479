package graft.functions

import java.security.MessageDigest
import java.text.SimpleDateFormat
import java.util.TimeZone
import org.apache.spark.ml.linalg.{DenseMatrix, DenseVector, Matrix, SparseVector, Vector, Vectors}
import org.apache.spark.sql.SparkSession

/** Built-in UDF pack (reference: streaming/core/compositor/spark/udf/
  * Functions.scala:42-537 and tech/mlsql/crawler/udf/Functions.scala:89 —
  * same names and semantics, re-implemented as plain Scala closures over
  * `org.apache.spark.ml.linalg` types).
  *
  * Deliberate deviations vs the reference, per SURVEY §2.5:
  *  - `array_intersect` is NOT re-registered: Spark's codegen'd builtin of
  *    the same name covers it (difference: the builtin dedups the result,
  *    the reference's `Seq.intersect` keeps multiplicity — scripts relying
  *    on duplicate survivors must dedup explicitly);
  *  - network-egress crawler functions (`crawler_http`, `crawler_request`,
  *    `crawler_request_image`) are registered but fail with a clear
  *    offline-build error on use;
  *  - `parse` (ansj NLP segmentation) loads ansj reflectively exactly like
  *    the reference and falls back to a deterministic CJK-char/whitespace
  *    segmenter when the jar is absent;
  *  - `crawler_auto_extract_body` (boilerpipe in the reference) is an
  *    honest tag-stripping heuristic, `crawler_extract_xpath` (JsoupXpath)
  *    handles well-formed XML only (null on unparseable input, as the
  *    reference returns null on extraction failure).
  *
  * Scale note: per-row closures (no state, no driver data); vector math is
  * O(d) per row. For the similarity hot paths prefer the codegen'd
  * [[graft.functions.VecExpressions]] (`arr_cosine` etc.) — these UDFs
  * exist for reference capability parity on `ml.linalg` Vector columns.
  */
object UDFPack {

  private def fmt(pattern: String): SimpleDateFormat = {
    val f = new SimpleDateFormat(pattern)
    f.setTimeZone(TimeZone.getTimeZone("UTC"))
    f
  }

  def register(spark: SparkSession): Unit = {
    if (spark.conf.getOption("spark.graft.udfpack.registered").contains("true")) return
    val u = spark.udf

    // ---- vector algebra (Functions.scala:69-300) ----
    u.register("vec_dense", (a: Seq[Double]) => Vectors.dense(a.toArray))
    u.register("vec_array", (v: Vector) => v.toArray.toSeq)
    u.register("vec_sparse", (size: Int, kv: Map[Int, Double]) =>
      Vectors.sparse(size, kv.toSeq))
    u.register("vec_argmax", (v: Vector) => v.argmax)
    u.register("vec_norm", (v: Vector, p: Double) => Vectors.norm(v, p))
    u.register("vec_sqdist", (a: Vector, b: Vector) => Vectors.sqdist(a, b))
    u.register("vec_mk_string", (sep: String, v: Vector) => v.toArray.mkString(sep))
    u.register("vec_concat", (vs: Seq[Vector]) =>
      Vectors.dense(vs.flatMap(_.toArray).toArray))
    u.register("vec_slice", (v: Vector, indices: Seq[Int]) =>
      Vectors.dense(indices.map(v.apply).toArray))
    // reference signature: the range comes as a 2-element array
    // (Functions.scala:126-134 — vec_range(vec, array(start, end)))
    u.register("vec_range", (v: Vector, inds: Seq[Int]) => {
      require(inds.size == 2, "vec_range expects array(start, end)")
      Vectors.dense(v.toArray.slice(inds(0), inds(1)))
    })
    u.register("vec_cosine", (a: Vector, b: Vector) => {
      val x = a.toArray; val y = b.toArray
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      val n = math.min(x.length, y.length)
      while (i < n) { dot += x(i) * y(i); na += x(i) * x(i); nb += y(i) * y(i); i += 1 }
      dot / (math.sqrt(na) * math.sqrt(nb))
    })
    def wise(f: (Double, Double) => Double): (Vector, Vector) => Vector =
      (a, b) => Vectors.dense(a.toArray.zip(b.toArray).map { case (x, y) => f(x, y) })
    u.register("vec_wise_mul", wise(_ * _))
    u.register("vec_wise_add", wise(_ + _))
    u.register("vec_wise_dif", wise(_ - _))
    u.register("vec_wise_mod", wise(_ % _))
    u.register("vec_inplace_add", (v: Vector, x: Double) =>
      Vectors.dense(v.toArray.map(_ + x)))
    u.register("vec_inplace_ew_mul", (v: Vector, x: Double) =>
      Vectors.dense(v.toArray.map(_ * x)))
    u.register("vec_ceil", (v: Vector) => Vectors.dense(v.toArray.map(math.ceil)))
    u.register("vec_floor", (v: Vector) => Vectors.dense(v.toArray.map(math.floor)))
    u.register("vec_mean", (v: Vector) => v.toArray.sum / v.size)
    u.register("vec_stddev", (v: Vector) => {
      val arr = v.toArray
      val m = arr.sum / arr.length
      math.sqrt(arr.map(x => (x - m) * (x - m)).sum / (arr.length - 1))
    })

    // ---- matrices (Functions.scala:157,240,257) ----
    u.register("matrix_dense", (rows: Seq[Seq[Double]]) => {
      val nr = rows.length; val nc = if (nr == 0) 0 else rows.head.length
      new DenseMatrix(nr, nc, Array.tabulate(nr * nc)(i => rows(i % nr)(i / nr)))
    })
    u.register("matrix_array", (m: Matrix) =>
      m.rowIter.map(_.toArray.toSeq).toSeq)
    u.register("matrix_sum", (m: Matrix, axis: Int) => {
      val rows = m.rowIter.map(_.toArray).toArray
      if (axis == 0) rows.transpose.map(_.sum).toSeq else rows.map(_.sum).toSeq
    })

    // ---- one-hot encoding (Functions.scala:290,378) ----
    u.register("onehot", (i: Int, size: Int) =>
      Vectors.sparse(size, Seq((i, 1.0))))
    u.register("array_onehot", (is: Seq[Int], size: Int) =>
      Vectors.sparse(size, is.distinct.sorted.map(i => (i, 1.0))))

    // ---- array helpers (Functions.scala:304-431) ----
    u.register("array_index", (a: Seq[String], x: String) => a.indexOf(x))
    u.register("array_number_concat", (a: Seq[Seq[Double]]) => a.flatten)
    u.register("array_number_to_string", (a: Seq[Double]) => a.map(_.toString))
    u.register("array_string_to_double", (a: Seq[String]) => a.map(_.toDouble))
    u.register("array_string_to_float", (a: Seq[String]) => a.map(_.toFloat))
    u.register("array_string_to_int", (a: Seq[String]) => a.map(_.toInt))
    u.register("to_array_double", (a: Seq[Any]) => a.map {
      case d: Double => d
      case f: Float => f.toDouble
      case l: Long => l.toDouble
      case i: Int => i.toDouble
      case s: String => s.toDouble
      case other => throw new IllegalArgumentException(s"to_array_double: $other")
    })
    u.register("padding_int_array", (a: Seq[Int], len: Int, fill: Int) =>
      if (a.length >= len) a.take(len) else a ++ Seq.fill(len - a.length)(fill))
    u.register("ngram", (a: Seq[String], n: Int) =>
      if (a.length < n) Seq.empty[String] else a.sliding(n).map(_.mkString(" ")).toSeq)

    // ---- maps ----
    u.register("map_value_int_to_double", (m: Map[String, Int]) =>
      m.map { case (k, v) => k -> v.toDouble })

    // ---- misc (Functions.scala:51,57,414,435; crawler Functions.scala:89) ----
    u.register("mkString", (sep: String, a: Seq[String]) => a.mkString(sep))
    // nondeterministic: without the marking, subexpression elimination
    // would collapse `SELECT uuid() a, uuid() b` into ONE value, and
    // re-evaluation across retries/pushdowns would change ids per row
    u.register("uuid", org.apache.spark.sql.functions.udf(
      () => java.util.UUID.randomUUID().toString.replace("-", "")).asNondeterministic())
    u.register("keepChinese", (s: String, keepPunct: Boolean, keep: Seq[String]) => {
      val sb = new StringBuilder
      s.foreach { c =>
        val isCjk = Character.UnicodeScript.of(c) == Character.UnicodeScript.HAN
        val isPunct = "，。！？；：、《》（）".indexOf(c) >= 0
        if (isCjk || (keepPunct && isPunct) || (keep != null && keep.contains(c.toString))) sb.append(c)
      }
      sb.toString
    })
    u.register("crawler_md5", (s: String) =>
      MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString)
    u.register("byteStringAsBytes", (s: String) => parseByteString(s, 1L))
    u.register("byteStringAsKb", (s: String) => parseByteString(s, 1L) / 1024)
    u.register("byteStringAsMb", (s: String) => parseByteString(s, 1L) / (1024 * 1024))
    u.register("byteStringAsGb", (s: String) => parseByteString(s, 1L) / (1024L * 1024 * 1024))

    // ---- time (Functions.scala:505-537) ----
    u.register("parseDateAsLong", (dt: String, pattern: String) =>
      fmt(pattern).parse(dt).getTime)
    u.register("parseLongAsDate", (ms: Long, pattern: String) =>
      fmt(pattern).format(new java.util.Date(ms)))
    u.register("timePlus", (ms: Long, amount: String) => ms + parseDuration(amount))
    u.register("timeMinus", (ms: Long, amount: String) => ms - parseDuration(amount))
    // wall-clock-dependent → nondeterministic (same reasoning as uuid)
    u.register("timeAgo", org.apache.spark.sql.functions.udf(
      (amount: String) => System.currentTimeMillis() - parseDuration(amount))
      .asNondeterministic())

    // ---- reference Functions.scala tail (:41-48 parse, :62-67 sleep,
    //      :316-339 array_slice/array_concat, :407-412 decodeKafka,
    //      :459-462 two-arg byteStringAs) ----
    // side-effecting → must not be elided/collapsed by the optimizer
    u.register("sleep", org.apache.spark.sql.functions.udf(
      (ms: Long) => { Thread.sleep(ms); "" }).asNondeterministic())
    u.register("parse", (s: String) => segment(s))
    // null value = Kafka tombstone record — pass the null through
    u.register("decodeKafka", (b: Array[Byte]) =>
      if (b == null) null else new String(b, "UTF-8"))
    u.register("array_slice", (a: Seq[String], from: Int, to: Int) =>
      if (a == null) null
      else if (to == -1) a.slice(from, a.length)
      else a.slice(from, to))
    u.register("array_concat", (a: Seq[Seq[String]]) =>
      if (a == null) null else a.filter(_ != null).flatten)
    u.register("byteStringAs", (s: String, unit: String) =>
      parseByteString(s, 1L) / (unit.toUpperCase match {
        case "BYTE" | "B" => 1L
        case "KiB" | "KIB" | "KB" => 1024L
        case "MiB" | "MIB" | "MB" => 1024L * 1024
        case "GiB" | "GIB" | "GB" => 1024L * 1024 * 1024
        case "TiB" | "TIB" | "TB" => 1024L * 1024 * 1024 * 1024
        case other => throw new IllegalArgumentException(s"unknown byte unit '$other'")
      }))

    // ---- crawler pack (reference: tech/mlsql/crawler/udf/Functions.scala) ----
    u.register("crawler_auto_extract_title", (html: String) =>
      if (html == null) null
      else "(?is)<title[^>]*>(.*?)</title>".r.findFirstMatchIn(html)
        .map(_.group(1).trim).orNull)
    u.register("crawler_auto_extract_body", (html: String) =>
      if (html == null) null else extractBody(html))
    u.register("crawler_extract_xpath", (html: String, xpath: String) =>
      extractXpath(html, xpath))
    def egress(name: String): String => String = (_: String) =>
      throw new UnsupportedOperationException(
        s"$name requires network egress, which is not available in this offline build")
    u.register("crawler_http", (url: String, method: String, params: Map[String, String]) =>
      egress("crawler_http")(url))
    u.register("crawler_request", egress("crawler_request"))
    u.register("crawler_request_image", egress("crawler_request_image"))

    spark.conf.set("spark.graft.udfpack.registered", "true")
  }

  /** `parse`: ansj NLP segmentation via reflection when the jar is present
    * (exactly the reference's loading strategy, Functions.scala:42-48);
    * otherwise a deterministic fallback — CJK codepoints one token each,
    * latin/digit runs whitespace-delimited.
    */
  // ansj resolved ONCE per JVM (this runs per row on the parse /
  // Word2ArrayInPlace hot path — a per-row Class.forName miss plus thrown
  // ClassNotFoundException would dominate the actual work)
  private lazy val ansjParse: Option[java.lang.reflect.Method] =
    try Some(Class.forName("org.ansj.splitWord.analysis.NlpAnalysis")
      .getMethod("parse", classOf[String]))
    catch { case _: ClassNotFoundException => None }

  private[graft] def segment(s: String): Seq[String] = {
    if (s == null) return null
    ansjParse match {
      case Some(parseMethod) =>
        val tmp = parseMethod.invoke(null, s)
        val terms = tmp.getClass.getMethod("getTerms").invoke(tmp)
          .asInstanceOf[java.util.List[AnyRef]]
        import scala.jdk.CollectionConverters._
        terms.asScala.toSeq.map(t => t.getClass.getMethod("getName").invoke(t).toString)
      case None =>
        val out = scala.collection.mutable.ArrayBuffer[String]()
        val cur = new StringBuilder
        def flush(): Unit = if (cur.nonEmpty) { out += cur.toString; cur.clear() }
        s.foreach { ch =>
          if (Character.isIdeographic(ch)) { flush(); out += ch.toString }
          else if (Character.isLetterOrDigit(ch)) cur.append(ch)
          else flush()
        }
        flush()
        out.toSeq
    }
  }

  /** Tag-stripping article-text heuristic standing in for the reference's
    * boilerpipe ArticleExtractor (no such jar offline): drop script/style
    * subtrees, strip tags, decode the common entities, collapse whitespace.
    */
  private[functions] def extractBody(html: String): String =
    html.replaceAll("(?is)<(script|style)[^>]*>.*?</\\1>", " ")
      .replaceAll("(?s)<!--.*?-->", " ")
      .replaceAll("(?s)<[^>]+>", " ")
      .replace("&nbsp;", " ").replace("&amp;", "&")
      .replace("&lt;", "<").replace("&gt;", ">").replace("&quot;", "\"")
      .replaceAll("\\s+", " ").trim

  /** XPath 1.0 over well-formed XML via the JDK's parser; null when the
    * input does not parse or the expression matches nothing (the reference
    * returns null on extraction failure too).
    */
  // factory construction does a ServiceLoader classpath scan — done once
  // per thread, never per row (DocumentBuilder/XPath instances themselves
  // are not thread-safe, hence ThreadLocal rather than a shared instance)
  private val xmlFactory =
    ThreadLocal.withInitial[javax.xml.parsers.DocumentBuilderFactory](() => {
      // the input is UNTRUSTED corpus content: disable doctypes/external
      // entities outright (XXE file reads, billion-laughs expansion)
      val f = javax.xml.parsers.DocumentBuilderFactory.newInstance()
      f.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
      f.setFeature("http://xml.org/sax/features/external-general-entities", false)
      f.setFeature("http://xml.org/sax/features/external-parameter-entities", false)
      f.setXIncludeAware(false)
      f.setExpandEntityReferences(false)
      f
    })
  private val xpathFactory =
    ThreadLocal.withInitial[javax.xml.xpath.XPathFactory](() =>
      javax.xml.xpath.XPathFactory.newInstance())

  private[functions] def extractXpath(html: String, xpath: String): String = {
    if (html == null) return null
    try {
      val doc = xmlFactory.get().newDocumentBuilder()
        .parse(new java.io.ByteArrayInputStream(html.getBytes("UTF-8")))
      val res = xpathFactory.get().newXPath().evaluate(xpath, doc)
      if (res == null || res.isEmpty) null else res
    } catch { case _: Exception => null }
  }

  /** "3 day" / "2 hour" / "30 minute" / "10 second" → millis. */
  private[functions] def parseDuration(s: String): Long = {
    val Array(n, unit) = s.trim.split("\\s+", 2)
    val ms = unit.toLowerCase.stripSuffix("s") match {
      case "day" => 86400000L
      case "hour" => 3600000L
      case "minute" => 60000L
      case "second" => 1000L
      case "milli" | "millisecond" => 1L
      case other => throw new IllegalArgumentException(s"unknown time unit '$other'")
    }
    n.toLong * ms
  }

  /** "1kb"/"10 mb"/"3g"/"42" → bytes (reference byteStringAsBytes). */
  private[functions] def parseByteString(s: String, default: Long): Long = {
    val m = "(?i)^\\s*(\\d+)\\s*([kmgtp]?)b?\\s*$".r.findFirstMatchIn(s)
      .getOrElse(throw new IllegalArgumentException(s"bad byte string '$s'"))
    val mult = m.group(2).toLowerCase match {
      case "" => 1L
      case "k" => 1024L
      case "m" => 1024L * 1024
      case "g" => 1024L * 1024 * 1024
      case "t" => 1024L * 1024 * 1024 * 1024
      case "p" => 1024L * 1024 * 1024 * 1024 * 1024
    }
    m.group(1).toLong * mult
  }
}
