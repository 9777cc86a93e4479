package graft.ets

import scala.collection.concurrent.TrieMap
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.UserDefinedFunction
import graft.dsl.ScriptContext

/** Estimator/Transformer plugin contract behind `train`/`run`/`predict`/
  * `register` (reference: streamingpro-core/src/main/java/streaming/dsl/
  * mmlib/SQLAlg.scala:28-65 — `train`/`batchPredict`/`load`/`predict`).
  *
  * `train` and `batchPredict` are whole-DataFrame transforms; `load` +
  * `predict` back `register Alg.`path` as fn` prediction UDFs.
  */
trait ET {
  /** Registry name, e.g. "Pivot" (looked up by `train t as Pivot.`...``). */
  def name: String

  /** Whether the statement's `.`path`` part is a filesystem path the
    * runner should re-root under the script's pathPrefix. ETs whose path
    * is a TABLE NAME (e.g. ScriptUDF's code table) override to false.
    */
  def needsPathResolution: Boolean = true

  def train(ctx: ScriptContext, df: DataFrame, path: String,
            params: Map[String, String]): DataFrame

  /** `predict` statement: defaults to the same transform as `train`
    * (reference: TrainAdaptor.scala:92-110 routes run→train,
    * predict→batchPredict).
    */
  def batchPredict(ctx: ScriptContext, df: DataFrame, path: String,
                   params: Map[String, String]): DataFrame =
    train(ctx, df, path, params)

  /** Load a model/artifact for `register`. */
  def load(spark: SparkSession, path: String, params: Map[String, String]): Any =
    throw new UnsupportedOperationException(s"ET '$name' does not support load/register")

  /** Build the prediction UDF for `register Alg.`path` as fn`. */
  def predict(spark: SparkSession, model: Any, udfName: String,
              params: Map[String, String]): UserDefinedFunction =
    throw new UnsupportedOperationException(s"ET '$name' does not support predict UDFs")
}

/** An ET whose `.`path`` operand is a table name, a command argument, or
  * unused — NEVER a filesystem path, so the runner must not re-root it
  * under the script's pathPrefix (reference: SQLAlg.skipPathPrefix).
  */
trait NoPathET extends ET {
  final override def needsPathResolution: Boolean = false
}

/** Name → ET instance registry (reference: TrainAdaptor.scala:124-191
  * `MLMapping` + tech/mlsql/ets/register/ETRegister.scala:24-48).
  */
object ETRegistry {
  private val ets = TrieMap[String, ET]()

  def register(et: ET): Unit = ets.put(et.name.toLowerCase, et)

  /** Exact name first, then the reference's naming conventions
    * (TrainAdaptor.scala:176-178 auto-resolves `SQL<Name>InPlace` /
    * `SQL<Name>Ext`): a script written against the reference may say
    * `ALSInPlace` where this registry says `ALS` (and vice versa), so try
    * the name with the suffix stripped and with each suffix appended.
    */
  def lookup(name: String): ET = {
    val n = name.toLowerCase
    val candidates = n +:
      Seq("inplace", "ext").collect { case s if n.endsWith(s) => n.dropRight(s.length) } ++:
      Seq(n + "inplace", n + "ext")
    candidates.iterator.flatMap(ets.get).nextOption().getOrElse(
      throw new IllegalArgumentException(
        s"unknown ET '$name'; registered: ${ets.keys.toSeq.sorted.mkString(", ")}"))
  }

  def registered: Seq[String] = ets.values.map(_.name).toSeq.sorted

  UtilityETs.all.foreach(register)
  MlETs.all.foreach(register)
  register(ScriptUDFET)
  register(StreamCommandET)
  register(JobCommandET)
  register(IteratorCommandET)
  PipelineETs.all.foreach(register)
  CompatETs.all.foreach(register)
  register(PythonTransformET)
  register(new UnavailableET("KafkaCommand", "the spark-sql-kafka connector jar"))
  register(new UnavailableET("DeltaCommand", "the delta-spark jar"))
  register(new UnavailableET("SendMessage", "an SMTP gateway (network egress)"))
  register(new UnavailableET("EventCallback", "HTTP egress (the reference's !callback " +
    "stream-lifecycle webhooks); the offline equivalent is the lifecycle event log: " +
    "load _mlsql_.`streamEvents`"))
}
