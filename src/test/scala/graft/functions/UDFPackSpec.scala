package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class UDFPackSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def one(sql: String): Any = { TestSpark.spark; spark.sql(sql).head().get(0) }

  test("vector constructors and accessors") {
    assert(one("select vec_argmax(vec_dense(array(1.0, 5.0, 3.0)))") == 1)
    assert(one("select vec_array(vec_dense(array(1.0, 2.0)))") == Seq(1.0, 2.0))
    assert(one("select vec_mk_string(',', vec_dense(array(1.0, 2.0)))") == "1.0,2.0")
    assert(one("select vec_argmax(vec_sparse(5, map(3, 9.0)))") == 3)
  }

  test("vec_slice by indices and vec_range by [start,end) pair (reference signatures)") {
    assert(one("select vec_array(vec_slice(vec_dense(array(1.0,2.0,3.0,4.0)), array(0, 2)))")
      == Seq(1.0, 3.0))
    assert(one("select vec_array(vec_range(vec_dense(array(1.0,2.0,3.0,4.0)), array(1, 3)))")
      == Seq(2.0, 3.0))
  }

  test("vector algebra") {
    assert(one("select vec_sqdist(vec_dense(array(0.0, 0.0)), vec_dense(array(3.0, 4.0)))") == 25.0)
    assert(one("select vec_norm(vec_dense(array(3.0, 4.0)), 2.0)") == 5.0)
    val cos = one("select vec_cosine(vec_dense(array(1.0, 0.0)), vec_dense(array(0.0, 1.0)))")
    assert(math.abs(cos.asInstanceOf[Double]) < 1e-12)
    assert(one("select vec_array(vec_wise_add(vec_dense(array(1.0)), vec_dense(array(2.0))))") == Seq(3.0))
    assert(one("select vec_array(vec_inplace_ew_mul(vec_dense(array(2.0, 3.0)), 2.0))") == Seq(4.0, 6.0))
    assert(one("select vec_mean(vec_dense(array(1.0, 2.0, 3.0)))") == 2.0)
    assert(one("select round(vec_stddev(vec_dense(array(1.0, 2.0, 3.0))), 6)") == 1.0)
    assert(one("select vec_array(vec_concat(array(vec_dense(array(1.0)), vec_dense(array(2.0)))))") == Seq(1.0, 2.0))
  }

  test("matrix functions") {
    assert(one("select matrix_array(matrix_dense(array(array(1.0, 2.0), array(3.0, 4.0))))") ==
      Seq(Seq(1.0, 2.0), Seq(3.0, 4.0)))
    assert(one("select matrix_sum(matrix_dense(array(array(1.0, 2.0), array(3.0, 4.0))), 0)") ==
      Seq(4.0, 6.0))
    assert(one("select matrix_sum(matrix_dense(array(array(1.0, 2.0), array(3.0, 4.0))), 1)") ==
      Seq(3.0, 7.0))
  }

  test("onehot") {
    assert(one("select vec_array(onehot(1, 3))") == Seq(0.0, 1.0, 0.0))
    assert(one("select vec_array(array_onehot(array(0, 2), 3))") == Seq(1.0, 0.0, 1.0))
  }

  test("array helpers") {
    assert(one("select array_index(array('a','b','c'), 'b')") == 1)
    assert(one("select array_string_to_double(array('1.5','2.5'))") == Seq(1.5, 2.5))
    assert(one("select padding_int_array(array(1,2), 4, 0)") == Seq(1, 2, 0, 0))
    assert(one("select ngram(array('a','b','c'), 2)") == Seq("a b", "b c"))
    assert(one("select mkString('-', array('x','y'))") == "x-y")
  }

  test("misc: md5, byteString, keepChinese, uuid") {
    assert(one("select crawler_md5('abc')") == "900150983cd24fb0d6963f7d28e17f72")
    assert(one("select byteStringAsBytes('1kb')") == 1024L)
    assert(one("select byteStringAsMb('3g')") == 3072L)
    assert(one("select keepChinese('a中b文c', false, array())") == "中文")
    assert(one("select length(uuid())") == 32)
  }

  test("udf tail: parse fallback, sleep, array_slice/concat, decodeKafka, byteStringAs") {
    assert(one("select parse('hello world42 x')") == Seq("hello", "world42", "x"))
    // CJK codepoints segment one char each in the fallback
    assert(one("select parse('天气nice')") == Seq("天", "气", "nice"))
    assert(one("select array_slice(array('a','b','c','d'), 1, -1)") == Seq("b", "c", "d"))
    assert(one("select array_slice(array('a','b','c','d'), 0, 2)") == Seq("a", "b"))
    assert(one("select array_concat(array(array('a'), array('b','c')))") == Seq("a", "b", "c"))
    assert(one("select decodeKafka(cast('abc' as binary))") == "abc")
    assert(one("select byteStringAs('1g', 'MB')") == 1024L)
    assert(one("select sleep(1)") == "")
  }

  test("crawler pack: title/body/xpath heuristics; egress functions fail clearly") {
    val html = "<html><head><title>A Title</title><script>var x=1;</script></head>" +
      "<body><p>Body &amp; text</p></body></html>"
    assert(one(s"select crawler_auto_extract_title('$html')") == "A Title")
    assert(one(s"select crawler_auto_extract_body('$html')") == "A Title Body & text")
    assert(one(s"select crawler_extract_xpath('$html', '/html/body/p')") == "Body & text")
    assert(one("select crawler_extract_xpath('not <valid', '/a')") == null)
    val e = intercept[Exception] { one("select crawler_request('http://x')") }
    assert(e.getMessage.contains("egress") || e.getCause != null)
  }

  test("time functions") {
    assert(one("select parseDateAsLong('19700101 00:00:01', 'yyyyMMdd HH:mm:ss')") == 1000L)
    assert(one("select parseLongAsDate(1000, 'yyyyMMdd HH:mm:ss')") == "19700101 00:00:01")
    assert(one("select timePlus(0, '1 hour')") == 3600000L)
    assert(one("select timeMinus(7200000, '1 hour')") == 3600000L)
  }

  test("uuid is nondeterministic: two calls in one projection differ") {
    val r = spark.sql("select uuid() as a, uuid() as b").head()
    assert(r.getString(0) != r.getString(1),
      "subexpression elimination collapsed uuid() — it must be registered nondeterministic")
  }
}
