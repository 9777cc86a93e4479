package graft.ets

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.{Encoder, SparkSession}
import org.apache.spark.sql.expressions.{Aggregator, UserDefinedFunction}
import org.apache.spark.sql.functions
import org.apache.spark.sql.types.DataType

/** `register ScriptUDF.`codeTable` as fn [where lang="scala" and
  * udfType="udf"|"udaf" and methodName="apply" and className="X"]` —
  * runtime-compiled Scala UDF/UDAF from script text
  * (reference: streamingpro-mlsql/.../algs/ScriptUDF.scala:39-101 and
  * streaming/udf/ScalaRuntimeCompileUDF.scala:36-104).
  *
  * Executor-safety design (SURVEY §2.6 re-design): ToolBox-generated
  * classes live in a driver-only classloader, so they can never be
  * DESERIALIZED on executors. Instead of shipping the compiled function,
  * we ship a small precompiled dispatcher ([[ScriptDispatch.FnN]] /
  * [[ScriptDispatch.Agg]]) that carries only the SOURCE string; each JVM
  * (driver and every executor) lazily toolbox-compiles it once, cached by
  * source hash. The driver still typed-compiles once to derive the return
  * `DataType` / encoders via the public `functions.udf`/`functions.udaf`,
  * so type inference is exactly Spark's own.
  *
  * Code forms: bare `def <methodName>` (default "apply"); `class X { def m }`
  * with className; udfType="udaf" with a `class X extends Aggregator[IN,BUF,OUT]`
  * (the Spark-4 replacement for the reference's deprecated
  * UserDefinedAggregateFunction contract). Encoders referenced by a UDAF
  * must be Spark-standard (Encoders.scalaLong etc.), not toolbox-defined
  * case classes. `lang="python"` runs the function in a real CPython
  * subprocess (no Jython; see [[PythonUdf]]) — row-at-a-time compat path;
  * the vectorized table path is [[PythonTransformET]].
  */
object ScriptUDFET extends ET {
  override def name = "ScriptUDF"

  /** The path part names a temp view holding code, never a filesystem path. */
  override def needsPathResolution: Boolean = false

  override def train(ctx: graft.dsl.ScriptContext, df: org.apache.spark.sql.DataFrame,
                     path: String, params: Map[String, String]): org.apache.spark.sql.DataFrame =
    throw new UnsupportedOperationException(
      "ScriptUDF is used via `register ScriptUDF.`...` as fn`, not train/run")

  private val cache = new ConcurrentHashMap[String, UserDefinedFunction]()

  override def load(spark: SparkSession, path: String, params: Map[String, String]): Any = {
    val code = params.get("code").getOrElse {
      require(path.nonEmpty, "ScriptUDF needs code='''...''' or a script table path")
      spark.table(path).select("content").head().getString(0)
    }
    (code, params)
  }

  override def predict(spark: SparkSession, model: Any, udfName: String,
                       params: Map[String, String]): UserDefinedFunction = {
    val (code, p) = model.asInstanceOf[(String, Map[String, String])]
    p.get("lang").filter(_ != "scala").foreach {
      case "python" =>
        // CPython subprocess with a JSON-line protocol (the reference runs
        // this on Jython; see PythonUdf scaladoc — per-row IPC, so the
        // vectorized table path is PythonTransform). dataType is required:
        // there is no driver-side probe to infer the return type from.
        // Only scalar UDFs exist on this path — reject udfType="udaf"
        // loudly instead of silently building a scalar (ADVICE r19).
        p.get("udfType").filter(_ != "udf").foreach { t =>
          throw new UnsupportedOperationException(
            s"""ScriptUDF lang="python" supports udfType="udf" only, got "$t" — write python aggregations with PythonTransform + SQL GROUP BY""")
        }
        PythonUdf.ensurePython3()
        val dt = p.getOrElse("dataType", throw new IllegalArgumentException(
          """ScriptUDF lang="python" requires dataType="<ddl type>" (e.g. dataType="long")"""))
        return cache.computeIfAbsent(s"py|$dt|${p.getOrElse("methodName", "apply")}|$code",
          _ => PythonUdf.build(code, p.getOrElse("methodName", "apply"),
            org.apache.spark.sql.types.DataType.fromDDL(dt),
            p.getOrElse("python", "python3"), udfName))
      case l =>
        throw new UnsupportedOperationException(
          s"ScriptUDF lang=\"$l\" is not supported; use lang=\"scala\" or lang=\"python\"")
    }
    val udfType = p.getOrElse("udfType", "udf")
    val methodName = p.getOrElse("methodName", "apply")
    val className = p.get("className")
    val key = s"$udfType|${className.getOrElse("")}|$methodName|$code"
    cache.computeIfAbsent(key, _ => udfType match {
      case "udf" => buildUdf(code, className, methodName)
      case "udaf" => buildUdaf(code, className.getOrElse(
        throw new IllegalArgumentException("udfType=udaf requires className")))
      case other => throw new IllegalArgumentException(s"udfType must be udf|udaf, got '$other'")
    })
  }

  private def buildUdf(code: String, className: Option[String], methodName: String): UserDefinedFunction = {
    val fnSrc = className match {
      case Some(cn) => s"{ $code\n (new $cn()).$methodName _ }"
      case None => s"{ $code\n $methodName _ }"
    }
    // driver-only typed probe: Spark derives the return DataType
    val typedSrc = s"{ $code\n org.apache.spark.sql.functions.udf(${
      className.map(cn => s"(new $cn()).$methodName").getOrElse(methodName)} _) }"
    val typed = ScriptCompiler.eval(typedSrc).asInstanceOf[UserDefinedFunction]
    val dataType = ScriptCompiler.reflectField(typed, "dataType").asInstanceOf[DataType]
    val rawFn = ScriptCompiler.eval(fnSrc).asInstanceOf[AnyRef]
    rawFn match {
      case _: Function0[_] => functions.udf(new ScriptDispatch.Fn0(fnSrc), dataType)
      case _: Function1[_, _] => functions.udf(new ScriptDispatch.Fn1(fnSrc), dataType)
      case _: Function2[_, _, _] => functions.udf(new ScriptDispatch.Fn2(fnSrc), dataType)
      case _: Function3[_, _, _, _] => functions.udf(new ScriptDispatch.Fn3(fnSrc), dataType)
      case _: Function4[_, _, _, _, _] => functions.udf(new ScriptDispatch.Fn4(fnSrc), dataType)
      case _: Function5[_, _, _, _, _, _] => functions.udf(new ScriptDispatch.Fn5(fnSrc), dataType)
      case other => throw new IllegalArgumentException(
        s"ScriptUDF supports 0..5 arguments, got ${other.getClass.getSimpleName}")
    }
  }

  private def buildUdaf(code: String, className: String): UserDefinedFunction = {
    val aggSrc = s"{ $code\n (new $className()): org.apache.spark.sql.expressions.Aggregator[_, _, _] }"
    // driver-only typed probe: Spark derives the input encoder
    val typedSrc = s"{ $code\n org.apache.spark.sql.functions.udaf(new $className()) }"
    val typed = ScriptCompiler.eval(typedSrc).asInstanceOf[UserDefinedFunction]
    val inputEncoder = ScriptCompiler.reflectField(typed, "inputEncoder").asInstanceOf[Encoder[Any]]
    functions.udaf(new ScriptDispatch.Agg(aggSrc), inputEncoder)
  }
}

/** Serializable dispatchers (Java UDF API — the typed-input-free surface
  * Spark sanctions for DataType-carrying UDFs): only graft classes + the
  * source string cross the wire; the actual user function is
  * toolbox-compiled lazily ONCE per JVM (driver and each executor), cached
  * by source text.
  */
object ScriptDispatch {
  import org.apache.spark.sql.api.java.{UDF0, UDF1, UDF2, UDF3, UDF4, UDF5}

  private def fn(src: String): AnyRef = ScriptCompiler.eval(src).asInstanceOf[AnyRef]

  final class Fn0(src: String) extends UDF0[Any] with Serializable {
    @transient private lazy val f = fn(src).asInstanceOf[Function0[Any]]
    def call(): Any = f()
  }
  final class Fn1(src: String) extends UDF1[Any, Any] with Serializable {
    @transient private lazy val f = fn(src).asInstanceOf[Function1[Any, Any]]
    def call(a: Any): Any = f(a)
  }
  final class Fn2(src: String) extends UDF2[Any, Any, Any] with Serializable {
    @transient private lazy val f = fn(src).asInstanceOf[Function2[Any, Any, Any]]
    def call(a: Any, b: Any): Any = f(a, b)
  }
  final class Fn3(src: String) extends UDF3[Any, Any, Any, Any] with Serializable {
    @transient private lazy val f = fn(src).asInstanceOf[Function3[Any, Any, Any, Any]]
    def call(a: Any, b: Any, c: Any): Any = f(a, b, c)
  }
  final class Fn4(src: String) extends UDF4[Any, Any, Any, Any, Any] with Serializable {
    @transient private lazy val f = fn(src).asInstanceOf[Function4[Any, Any, Any, Any, Any]]
    def call(a: Any, b: Any, c: Any, d: Any): Any = f(a, b, c, d)
  }
  final class Fn5(src: String) extends UDF5[Any, Any, Any, Any, Any, Any] with Serializable {
    @transient private lazy val f = fn(src).asInstanceOf[Function5[Any, Any, Any, Any, Any, Any]]
    def call(a: Any, b: Any, c: Any, d: Any, e: Any): Any = f(a, b, c, d, e)
  }

  /** Delegating Aggregator: zero/reduce/merge/finish run wherever Spark
    * calls them (driver or executor) against the per-JVM compiled inner
    * aggregator; buffer/output encoders are resolved on the driver at plan
    * time from the inner instance.
    */
  final class Agg(src: String) extends Aggregator[Any, Any, Any] with Serializable {
    @transient private lazy val inner =
      fn(src).asInstanceOf[Aggregator[Any, Any, Any]]
    def zero: Any = inner.zero
    def reduce(b: Any, a: Any): Any = inner.reduce(b, a)
    def merge(b1: Any, b2: Any): Any = inner.merge(b1, b2)
    def finish(reduction: Any): Any = inner.finish(reduction)
    def bufferEncoder: Encoder[Any] = inner.bufferEncoder
    def outputEncoder: Encoder[Any] = inner.outputEncoder
  }
}

/** Per-JVM toolbox compilation cache (driver AND executors both hit this
  * through [[ScriptDispatch]]).
  */
object ScriptCompiler {
  import scala.reflect.runtime.universe
  import scala.tools.reflect.ToolBox

  private val cache = new ConcurrentHashMap[String, Any]()

  private lazy val toolBox: ToolBox[universe.type] =
    universe.runtimeMirror(getClass.getClassLoader).mkToolBox()

  def eval(source: String): Any =
    cache.computeIfAbsent(source, _ =>
      try toolBox.synchronized { toolBox.eval(toolBox.parse(source)) }
      catch {
        case e: Throwable => throw new IllegalArgumentException(
          s"ScriptUDF compilation failed: ${e.getMessage}\n--- generated ---\n$source", e)
      })

  /** Read a field/accessor off a Spark case class across minor versions. */
  def reflectField(obj: Any, name: String): Any = {
    val m = obj.getClass.getMethods.find(_.getName == name).getOrElse(
      throw new IllegalStateException(
        s"${obj.getClass.getName} has no accessor '$name' — Spark internal shape changed"))
    m.invoke(obj)
  }
}
