package graft.ets

import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.types._

/** Python scalar script-UDFs over a persistent per-thread worker process
  * — the `register ScriptUDF.`t` as fn where lang="python"` path the
  * reference runs on Jython (streaming/udf/PythonRuntimeCompileUDF via
  * ScriptUDF.scala:39-101). Jython is absent offline, so the function
  * runs in a REAL CPython subprocess with a JSON-line protocol:
  * one request line `[arg, ...]` → one response line `{"ok": result}` or
  * `{"err": "..."}`.
  *
  * Scope: a compatibility path for row-at-a-time logic over JSON-able
  * types (null/bool/int/long/double/string, arrays/maps thereof).
  * Per-row IPC costs microseconds per call — fine for small/medium
  * tables and driver-side glue, wrong for a 100 TB scan; the scale path
  * is [[PythonTransformET]] (vectorized Arrow batches). The docs on both
  * point at each other.
  *
  * Worker lifecycle: one CPython process per (executor thread, code)
  * — thread-confined, so no locking on the hot path; processes die with
  * the JVM (stdin EOF). `dataType` (a DDL type string) is REQUIRED: with
  * no Jython driver-side probe there is nothing to infer the return type
  * from (the reference requires it for python UDFs too).
  */
object PythonUdf {

  /** None = python3 runs; Some(reason) otherwise. Probed once per JVM
    * (needs only the interpreter — the JSON protocol has no pyarrow
    * dependency, unlike [[PythonTransformET]]).
    */
  lazy val unavailableReason: Option[String] = try {
    val p = new ProcessBuilder("python3", "-c", "import json").start()
    val ok = p.waitFor(30, java.util.concurrent.TimeUnit.SECONDS)
    if (!ok) { p.destroyForcibly(); Some("python3 probe timed out") }
    else if (p.exitValue() != 0) Some("python3 exited nonzero on a trivial import")
    else None
  } catch { case _: java.io.IOException => Some("no python3 on PATH") }

  def ensurePython3(): Unit = unavailableReason.foreach { reason =>
    throw new UnsupportedOperationException(
      s"ScriptUDF lang=\"python\" needs python3 on every executor host ($reason)")
  }

  private[ets] val WorkerScript: String =
    """import sys, os, json
      |ns = {}
      |exec(os.environ["GRAFT_PY_CODE"], ns)
      |fn = ns[os.environ.get("GRAFT_PY_METHOD", "apply")]
      |out = sys.stdout
      |for line in sys.stdin:
      |    line = line.strip()
      |    if not line: continue
      |    try:
      |        r = fn(*json.loads(line))
      |        s = json.dumps({"ok": r})
      |    except Exception as e:
      |        s = json.dumps({"err": "%s: %s" % (type(e).__name__, e)})
      |    out.write(s); out.write("\n"); out.flush()
      |""".stripMargin

  /** A live worker process plus its line streams; thread-confined. */
  private final class Worker(code: String, method: String, python: String) {
    private val errFile = java.io.File.createTempFile("graft_pyudf_", ".stderr")
    private val proc = {
      val pb = new ProcessBuilder(python, "-c", WorkerScript)
      pb.environment().put("GRAFT_PY_CODE", code)
      pb.environment().put("GRAFT_PY_METHOD", method)
      pb.redirectError(ProcessBuilder.Redirect.to(errFile))
      pb.start()
    }
    private val w = new java.io.BufferedWriter(
      new java.io.OutputStreamWriter(proc.getOutputStream, "UTF-8"))
    private val r = new java.io.BufferedReader(
      new java.io.InputStreamReader(proc.getInputStream, "UTF-8"))

    def call(requestLine: String): String = {
      w.write(requestLine); w.write("\n"); w.flush()
      val resp = r.readLine()
      if (resp == null) {
        val tail = try new String(
          java.nio.file.Files.readAllBytes(errFile.toPath), "UTF-8").takeRight(2000)
        catch { case _: Throwable => "<stderr unavailable>" }
        throw new RuntimeException(s"python UDF worker died: $tail")
      }
      resp
    }
  }

  // one worker per (thread, code|method): thread confinement instead of a
  // lock — executor task threads are a small fixed pool, so the process
  // count is bounded by cores x distinct registered functions
  private val workers = new ThreadLocal[scala.collection.mutable.HashMap[String, Worker]] {
    override def initialValue() = scala.collection.mutable.HashMap.empty
  }

  /** Build the untyped scalar UDF. The register path cannot know the
    * call-site arity, and one Scala class cannot mix in several FunctionN
    * traits (their `tupled` members conflict irreconcilably), so the
    * function value is a dynamic Proxy implementing Function0..Function10
    * — Spark's ScalaUDF selects the interface by the call site's argument
    * count and only ever invokes `apply`, which all arities share after
    * erasure.
    */
  def build(code: String, method: String, returnType: DataType,
            python: String, udfName: String): UserDefinedFunction = {
    val interfaces: Array[Class[_]] = Array(
      classOf[Function0[_]], classOf[Function1[_, _]], classOf[Function2[_, _, _]],
      classOf[Function3[_, _, _, _]], classOf[Function4[_, _, _, _, _]],
      classOf[Function5[_, _, _, _, _, _]], classOf[Function6[_, _, _, _, _, _, _]],
      classOf[Function7[_, _, _, _, _, _, _, _]],
      classOf[Function8[_, _, _, _, _, _, _, _, _]],
      classOf[Function9[_, _, _, _, _, _, _, _, _, _]],
      classOf[Function10[_, _, _, _, _, _, _, _, _, _, _]])
    val f = java.lang.reflect.Proxy.newProxyInstance(
      getClass.getClassLoader, interfaces,
      new PyHandler(code, method, returnType, python))
    org.apache.spark.sql.graftshim.UdfShim.untyped(f, returnType, udfName)
  }

  /** Serializable invocation core behind the proxy: every `apply` is one
    * JSON-line round trip on the thread's worker. Captures only strings +
    * the return type, so it ships to executors cleanly; workers re-spawn
    * lazily per (thread, code) wherever the closure lands.
    */
  private final class PyHandler(code: String, method: String,
                                returnType: DataType, python: String)
    extends java.lang.reflect.InvocationHandler with Serializable {

    private def worker(): Worker = {
      val key = code + " " + method + " " + python
      workers.get().getOrElseUpdate(key, new Worker(code, method, python))
    }

    private def call(args: Seq[Any]): Any = {
      val req = JsonCodec.renderArray(args)
      JsonCodec.parse(worker().call(req)) match {
        case m: Map[_, _] =>
          val mm = m.asInstanceOf[Map[String, Any]]
          mm.get("err").foreach(e => throw new RuntimeException(
            s"python UDF raised: $e"))
          JsonCodec.coerce(mm.getOrElse("ok", null), returnType)
        case other => throw new IllegalStateException(
          s"unexpected python UDF response: $other")
      }
    }

    override def invoke(proxy: AnyRef, m: java.lang.reflect.Method,
                        args: Array[AnyRef]): AnyRef = m.getName match {
      case "apply" =>
        call(Option(args).map(_.toSeq).getOrElse(Nil)).asInstanceOf[AnyRef]
      case "toString" => s"pythonScriptUdf($method)"
      case "hashCode" => Int.box(System.identityHashCode(proxy))
      case "equals" => Boolean.box(args != null && (proxy eq args(0)))
      case other => throw new UnsupportedOperationException(
        s"python UDF function proxy supports only apply, not $other")
    }
  }


  /** Minimal JSON codec over the UDF's value universe (json4s rides the
    * Spark classpath; jackson does the parsing).
    */
  private[ets] object JsonCodec {
    import org.json4s._
    import org.json4s.jackson.JsonMethods

    def renderArray(args: Seq[Any]): String =
      JsonMethods.compact(JsonMethods.render(JArray(args.map(toJ).toList)))

    private def toJ(v: Any): JValue = v match {
      case null => JNull
      case s: String => JString(s)
      case b: Boolean => JBool(b)
      case b: Byte => JInt(BigInt(b.toInt))
      case s: Short => JInt(BigInt(s.toInt))
      case i: Int => JInt(BigInt(i))
      case l: Long => JInt(BigInt(l))
      case f: Float => JDouble(f.toDouble)
      case d: Double => JDouble(d)
      case d: java.math.BigDecimal => JDecimal(BigDecimal(d))
      case d: BigDecimal => JDecimal(d)
      case d: java.sql.Date => JString(d.toString)
      case t: java.sql.Timestamp => JString(t.toString)
      case seq: scala.collection.Seq[_] => JArray(seq.map(toJ).toList)
      case arr: Array[_] => JArray(arr.map(toJ).toList)
      case m: scala.collection.Map[_, _] =>
        JObject(m.map { case (k, v2) => k.toString -> toJ(v2) }.toList)
      case other => throw new UnsupportedOperationException(
        s"python UDF argument type ${other.getClass.getName} is not JSON-able; " +
          "supported: null/bool/ints/floats/string/decimal/date/timestamp/array/map " +
          "(for vectorized or binary data use PythonTransform instead)")
    }

    def parse(s: String): Any = fromJ(JsonMethods.parse(s))

    private def fromJ(j: JValue): Any = j match {
      case JNull | JNothing => null
      case JString(s) => s
      case JBool(b) => b
      case JInt(i) => i // BigInt; coerce() narrows per declared type
      case JLong(l) => l
      case JDouble(d) => d
      case JDecimal(d) => d
      case JArray(xs) => xs.map(fromJ)
      case JObject(fs) => fs.map { case (k, v) => k -> fromJ(v) }.toMap
      case JSet(xs) => xs.map(fromJ)
    }

    /** Narrow a parsed JSON value to the external value Spark expects for
      * `dt`; loud error on shape mismatch (a silent null would read as
      * "the python function returned null").
      */
    def coerce(v: Any, dt: DataType): Any = (v, dt) match {
      case (null, _) => null
      case (x, IntegerType) => num(x).toInt
      case (x, LongType) => num(x).toLong
      case (x, ShortType) => num(x).toShort
      case (x, ByteType) => num(x).toByte
      case (x, DoubleType) => dbl(x)
      case (x, FloatType) => dbl(x).toFloat
      case (x, _: DecimalType) => x match {
        case d: BigDecimal => d
        case other => BigDecimal(other.toString)
      }
      case (s: String, StringType) => s
      case (x, StringType) => x.toString
      case (b: Boolean, BooleanType) => b
      case (xs: List[_], ArrayType(et, _)) => xs.map(coerce(_, et))
      case (m: Map[_, _], MapType(StringType, vt, _)) =>
        m.asInstanceOf[Map[String, Any]].map { case (k, x) => k -> coerce(x, vt) }
      case (other, t) => throw new IllegalStateException(
        s"python UDF returned ${other.getClass.getSimpleName} '$other' " +
          s"where the declared dataType is ${t.sql}")
    }

    private def num(x: Any): BigInt = x match {
      case i: BigInt => i
      case l: Long => BigInt(l)
      case d: Double if d.isWhole => BigInt(d.toLong)
      case other => throw new IllegalStateException(
        s"python UDF returned non-integral '$other' for an integral dataType")
    }
    private def dbl(x: Any): Double = x match {
      case d: Double => d
      case i: BigInt => i.toDouble
      case d: BigDecimal => d.toDouble
      case other => throw new IllegalStateException(
        s"python UDF returned non-numeric '$other' for a floating dataType")
    }
  }
}
