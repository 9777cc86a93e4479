package graft.ets

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.StructType
import graft.dsl.ScriptContext

/** `run tbl as PythonTransform.`` where code='''...''' and
  * schema="a long, b string"` — apply user Python code to a table,
  * partition-wise, over Arrow IPC through a plain `python3` subprocess
  * (no Jython, no Py4J; see [[org.apache.spark.sql.graftshim.ArrowBridge]]).
  *
  * This is the offline re-expression of the reference's Python ET family
  * (streamingpro's SQLPythonAlg / tech/mlsql/ets/PythonCommand.scala:405,
  * Ray.scala:52-300 — all of which ship table slices to a python process
  * and read a table back; the reference needs a Ray/conda environment,
  * this needs `python3` with `pyarrow` importable on each executor host).
  *
  * Contract: `code` defines `def transform(table)` receiving ONE
  * `pyarrow.Table` per input batch (<= `batchSize` rows) and returning a
  * `pyarrow.Table`, `pyarrow.RecordBatch`, or `pandas.DataFrame` whose
  * schema matches `schema` exactly (names + types; int→int64=long,
  * float64=double, string, and their list types). `method` overrides the
  * function name. The transform is per-batch with no cross-batch state —
  * aggregate AFTER the transform in SQL, where Spark can shuffle it
  * properly; this keeps the operator embarrassingly parallel at any
  * corpus size (the mapInArrow posture).
  *
  * Availability is probed once per JVM (`python3 -c "import pyarrow"`);
  * without it the ET throws an actionable error naming the missing piece
  * (the registry-slot convention for environment-gated capabilities).
  *
  * Fork-per-task overhead, measured (ScaleSweep `python_transform_arrow`,
  * r20): the worker spawn + pyarrow import costs ~0.3-0.5 s per
  * partition; at 1x (small partitions) it dominates the stage, by 10x
  * rows it has amortized (t10/t1 = 2.33), and the 10x->50x ratio is
  * sub-linear (0.55, read-bound). Overhead is O(partitions), not
  * O(rows) — repartition tiny inputs before piping.
  */
object PythonTransformET extends NoPathET {
  override def name = "PythonTransform"

  /** None = available; Some(reason) = not usable in this environment. */
  lazy val unavailableReason: Option[String] = probe()

  private def probe(): Option[String] = try {
    val p = new ProcessBuilder("python3", "-c", "import pyarrow").start()
    val ok = p.waitFor(30, java.util.concurrent.TimeUnit.SECONDS)
    if (!ok) { p.destroyForcibly(); Some("python3 probe timed out") }
    else if (p.exitValue() != 0) Some("python3 cannot `import pyarrow`")
    else None
  } catch {
    case _: java.io.IOException => Some("no python3 on PATH")
  }

  /** The worker program run as `python3 -c <this>`. User code and the
    * method name travel via environment variables (no quoting hazards).
    * Frames are 4-byte big-endian length-prefixed self-contained Arrow
    * IPC streams in both directions — [[ArrowBridge]]'s protocol.
    */
  private[graft] val WorkerScript: String =
    """import sys, os, struct, io
      |import pyarrow as pa
      |src = sys.stdin.buffer; dst = sys.stdout.buffer
      |ns = {}
      |exec(os.environ["GRAFT_PY_CODE"], ns)
      |fn = ns[os.environ.get("GRAFT_PY_METHOD", "transform")]
      |def rf():
      |    h = src.read(4)
      |    if len(h) < 4: return None
      |    n = struct.unpack(">i", h)[0]
      |    b = bytearray()
      |    while len(b) < n:
      |        c = src.read(n - len(b))
      |        if not c: raise EOFError("truncated input frame")
      |        b.extend(c)
      |    return bytes(b)
      |while True:
      |    buf = rf()
      |    if buf is None: break
      |    tbl = pa.ipc.open_stream(buf).read_all()
      |    out = fn(tbl)
      |    if isinstance(out, pa.RecordBatch):
      |        out = pa.Table.from_batches([out])
      |    elif not isinstance(out, pa.Table):
      |        try:
      |            import pandas as pd
      |            if isinstance(out, pd.DataFrame):
      |                out = pa.Table.from_pandas(out, preserve_index=False)
      |            else:
      |                raise TypeError(type(out).__name__)
      |        except ImportError:
      |            raise TypeError("transform must return a pyarrow Table/RecordBatch")
      |    sink = io.BytesIO()
      |    w = pa.ipc.new_stream(sink, out.schema)
      |    w.write_table(out); w.close()
      |    p = sink.getvalue()
      |    dst.write(struct.pack(">i", len(p))); dst.write(p); dst.flush()
      |""".stripMargin

  override def train(ctx: ScriptContext, df: DataFrame, path: String,
                     params: Map[String, String]): DataFrame = {
    unavailableReason.foreach { reason =>
      throw new UnsupportedOperationException(
        s"PythonTransform needs python3 with pyarrow on every executor host ($reason)")
    }
    val code = params.get("code").orElse(
      Option(path).filter(_.nonEmpty).map(p =>
        df.sparkSession.table(p).select("content").head().getString(0)))
      .getOrElse(throw new IllegalArgumentException(
        "PythonTransform needs code='''...''' (or a script table in the path slot)"))
    val schemaDdl = params.getOrElse("schema", throw new IllegalArgumentException(
      """PythonTransform needs schema="col type, ..." — the analysis-time output contract"""))
    val outSchema = StructType.fromDDL(schemaDdl)
    val method = params.getOrElse("method", "transform")
    val batchSize = params.get("batchSize").map(_.toInt).getOrElse(4096)
    require(batchSize > 0, "batchSize must be positive")
    val python = params.getOrElse("python", "python3")
    // inactivity bound for the worker (seconds): a user transform that
    // blocks forever is killed and reported with its stderr instead of
    // holding the Spark task until an external kill (VERDICT r19 #4)
    val timeoutSec = params.get("timeout").map(_.toInt).getOrElse(600)
    require(timeoutSec > 0, "timeout must be positive seconds")
    org.apache.spark.sql.graftshim.ArrowBridge.pipe(
      df, outSchema, Seq(python, "-c", WorkerScript),
      Map("GRAFT_PY_CODE" -> code, "GRAFT_PY_METHOD" -> method), batchSize,
      timeoutSec)
  }
}
