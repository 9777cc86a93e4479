package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the hot loops of the similarity
  * operators ([[graft.operators.similarity]]): a whole-array dot product /
  * cosine evaluated in one codegen'd pass instead of per-element
  * higher-order-function lambdas (the round-1 p8 bottleneck — 3 interpreted
  * `aggregate`/`zip_with` reductions per candidate pair).
  *
  * These are engine extensions in the sense of the reference's custom
  * expressions (reference: streamingpro-spark-3.0.0-adaptor/src/main/java/
  * org/apache/spark/sql/WowScalaUDF.scala — the reference also drops to a
  * custom expression when the public surface is too slow/limited).
  *
  * All operate on `array<double>` (inputs are implicitly cast, so
  * `array<float>` embedding columns work directly). Null array → null
  * result; element nulls are not expected in embedding data.
  */
object VecExpressions {

  /** Register every expression with a session-extensions injector (called
    * from [[graft.GraftSession]]). Using `injectFunction` keeps us on the
    * public `SparkSessionExtensions` API.
    */
  def inject(ext: SparkSessionExtensions): Unit = {
    def info(name: String, usage: String) =
      new ExpressionInfo(classOf[ArrCosine].getName, null, name, usage, "")
    ext.injectFunction((FunctionIdentifier("arr_dot"),
      info("arr_dot", "arr_dot(a, b) - dot product of two double arrays"),
      (cs: Seq[Expression]) => ArrDot(cs(0), cs(1))))
    ext.injectFunction((FunctionIdentifier("arr_cosine"),
      info("arr_cosine", "arr_cosine(a, b) - cosine similarity of two double arrays"),
      (cs: Seq[Expression]) => ArrCosine(cs(0), cs(1))))
    ext.injectFunction((FunctionIdentifier("arr_norm"),
      info("arr_norm", "arr_norm(a) - L2 norm of a double array"),
      (cs: Seq[Expression]) => ArrNorm(cs(0))))
    ext.injectFunction((FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(tokens) - 64-bit SimHash of an array of strings"),
      (cs: Seq[Expression]) => SimHash64(cs(0))))
    ext.injectFunction((FunctionIdentifier("minhash_sig"),
      info("minhash_sig", "minhash_sig(tokens, k) - k-element MinHash signature of an array of strings"),
      (cs: Seq[Expression]) => MinHashSig(cs(0), cs(1))))
  }

  /** Callers cast inputs to array<double> explicitly; reject anything else
    * at analysis time so getDouble never reads a float-width slot.
    */
  private[functions] def requireDoubleArrays(name: String, exprs: Expression*): TypeCheckResult = {
    val bad = exprs.find(e => e.dataType match {
      case ArrayType(DoubleType, _) => false
      case _ => true
    })
    bad match {
      case Some(e) => TypeCheckResult.TypeCheckFailure(
        s"$name requires array<double> inputs, got ${e.dataType}")
      case None => TypeCheckResult.TypeCheckSuccess
    }
  }
}

/** Dot product over two `array<double>` columns, single codegen'd loop. */
case class ArrDot(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {
  override def checkInputDataTypes(): TypeCheckResult = VecExpressions.requireDoubleArrays(prettyName, left, right)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "arr_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0; var i = 0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      int n = Math.min($a.numElements(), $b.numElements());
      double acc = 0.0;
      for (int i = 0; i < n; i++) { acc += $a.getDouble(i) * $b.getDouble(i); }
      ${ev.value} = acc;
    """)

  override protected def withNewChildrenInternal(l: Expression, r: Expression): ArrDot =
    copy(left = l, right = r)
}

/** Cosine similarity over two `array<double>` columns: dot and both norms
  * accumulated in ONE pass (vs three separate HOF reductions).
  */
case class ArrCosine(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {
  override def checkInputDataTypes(): TypeCheckResult = VecExpressions.requireDoubleArrays(prettyName, left, right)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "arr_cosine"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val xv = x.getDouble(i); val yv = y.getDouble(i)
      dot += xv * yv; na += xv * xv; nb += yv * yv; i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      int n = Math.min($a.numElements(), $b.numElements());
      double dot = 0.0, na = 0.0, nb = 0.0;
      for (int i = 0; i < n; i++) {
        double xv = $a.getDouble(i); double yv = $b.getDouble(i);
        dot += xv * yv; na += xv * xv; nb += yv * yv;
      }
      ${ev.value} = dot / (java.lang.Math.sqrt(na) * java.lang.Math.sqrt(nb));
    """)

  override protected def withNewChildrenInternal(l: Expression, r: Expression): ArrCosine =
    copy(left = l, right = r)
}

/** L2 norm of an `array<double>` column. */
case class ArrNorm(child: Expression)
    extends UnaryExpression with Serializable {
  override def checkInputDataTypes(): TypeCheckResult = VecExpressions.requireDoubleArrays(prettyName, child)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "arr_norm"

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var acc = 0.0; var i = 0
    val n = x.numElements()
    while (i < n) { val v = x.getDouble(i); acc += v * v; i += 1 }
    math.sqrt(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => s"""
      int n = $a.numElements();
      double acc = 0.0;
      for (int i = 0; i < n; i++) { double v = $a.getDouble(i); acc += v * v; }
      ${ev.value} = java.lang.Math.sqrt(acc);
    """)

  override protected def withNewChildInternal(c: Expression): ArrNorm = copy(child = c)
}

/** 64-bit SimHash over an `array<string>` token column: each token is
  * xxhash64'd (seed 42, Spark's default), each signature bit is the sign of
  * the per-bit +1/−1 vote sum. Per-row (not per-pair) work, so interpreted
  * eval is fine — no codegen needed.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback with Serializable {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires array<string>, got $other")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val h = XxHash64Function.hash(s, StringType, 42L)
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) { if (votes(j) > 0) sig |= (1L << j); j += 1 }
    sig
  }

  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(child = c)
}

/** k-element MinHash signature over an `array<string>` token set using the
  * standard double-hashing family g_i(s) = h1(s) + i·h2(s) (Kirsch &
  * Mitzenmacher): TWO xxhash64 evaluations per token instead of k — the
  * difference between 2·|tokens| and k·|tokens| hash calls per row, which
  * made the HOF formulation the corpus-dedup bottleneck. Per-row work, no
  * shuffle; interpreted eval is fine (one tight loop per row).
  */
case class MinHashSig(left: Expression, right: Expression)
    extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback with Serializable {
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), IntegerType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires (array<string>, int), got ($l, $r)")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(tokens: Any, k: Any): Any = {
    val arr = tokens.asInstanceOf[ArrayData]
    val numHashes = k.asInstanceOf[Int]
    val sig = Array.fill(numHashes)(Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val h1 = XxHash64Function.hash(s, StringType, 42L)
        val h2 = XxHash64Function.hash(s, StringType, 77L) | 1L // odd -> full-period
        var j = 0
        var g = h1
        while (j < numHashes) {
          if (g < sig(j)) sig(j) = g
          g += h2
          j += 1
        }
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(sig)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): MinHashSig =
    copy(left = l, right = r)
}
