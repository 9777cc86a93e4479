package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native string-similarity expressions beyond Spark's built-ins
  * (levenshtein is built in; Jaro-Winkler is not). Same extension
  * pattern as [[VecExpressions]]: injected via the public
  * `SparkSessionExtensions` API, codegen-friendly (one static call from
  * the generated stage, no UDF boxing), per-row — zero shuffle at any
  * corpus size.
  */
object StringExpressions {

  def inject(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("jaro_winkler_similarity"),
      new ExpressionInfo(classOf[JaroWinklerSim].getName, null,
        "jaro_winkler_similarity",
        "jaro_winkler_similarity(a, b) - Jaro-Winkler similarity in [0,1] " +
          "(same name/semantics as DuckDB's)", ""),
      (cs: Seq[Expression]) => JaroWinklerSim(cs(0), cs(1))))
  }
}

/** Jaro-Winkler similarity (Winkler 1990): Jaro similarity boosted by up
  * to 4 chars of common prefix (scale 0.1) when the base Jaro exceeds
  * 0.7. Named and behaving like DuckDB's `jaro_winkler_similarity` so
  * oracles replay it verbatim — including BYTE-level comparison (DuckDB
  * compares UTF-8 bytes, not code points: probed 'éclair'/'eclair' →
  * 0.849206 = the 7-vs-6-byte Jaro) and 0.0 when either side is empty.
  * The byte grain also means no UTF8String→String decode on the hot
  * path. Cross-checked against DuckDB on randomized pairs in
  * StringExpressionsSpec + the p109 oracle.
  */
case class JaroWinklerSim(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"jaro_winkler_similarity requires (string, string), got ($a, $b)")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler_similarity"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerImpl.similarity(a.asInstanceOf[UTF8String].getBytes,
      b.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      ${ev.value} = graft.functions.JaroWinklerImpl.similarity(
        $a.getBytes(), $b.getBytes());
    """)

  override protected def withNewChildrenInternal(l: Expression, r: Expression): JaroWinklerSim =
    copy(left = l, right = r)
}

/** The byte-level Jaro-Winkler kernel. A plain object so the Scala
  * compiler emits a static forwarder the generated (Java) stage can call
  * directly.
  */
object JaroWinklerImpl {

  def similarity(a: Array[Byte], b: Array[Byte]): Double = {
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(math.max(la, lb) / 2 - 1, 0)
    val aMatched = new Array[Boolean](la)
    val bMatched = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!bMatched(j) && a(i) == b(j)) {
          aMatched(i) = true; bMatched(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: mismatched positions between the two matched
    // subsequences, halved with INTEGER floor — odd counts occur (the
    // matched subsequences need not be permutations of each other), and
    // DuckDB floors them: t2/2.0 left 380/4000 random pairs off by a few
    // ulps-to-percent, t2/2 matched 12000/12000 bit-for-bit
    var k = 0
    var t2 = 0
    i = 0
    while (i < la) {
      if (aMatched(i)) {
        while (!bMatched(k)) k += 1
        if (a(i) != b(k)) t2 += 1
        k += 1
      }
      i += 1
    }
    val md = m.toDouble
    val jaro = (md / la + md / lb + (md - t2 / 2) / md) / 3.0
    if (jaro <= 0.7) return jaro
    var prefix = 0
    val pMax = math.min(4, math.min(la, lb))
    while (prefix < pMax && a(prefix) == b(prefix)) prefix += 1
    jaro + prefix * 0.1 * (1.0 - jaro)
  }
}
