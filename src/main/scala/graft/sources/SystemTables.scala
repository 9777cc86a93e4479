package graft.sources

import org.apache.spark.sql.DataFrame
import graft.dsl.ScriptContext

/** System/introspection tables (reference: MLSQLSystemTables.scala:19-101 —
  * `load _mlsql_.`jobs/...``, plus `modelParams` model introspection via
  * LoadAdaptor.scala:127).
  *
  * Paths: `_mlsql_.`jobs`` (active streaming queries), `_mlsql_.`ets``,
  * `_mlsql_.`datasources``, `_mlsql_.`functions``, `_mlsql_.`version``.
  */
final class SystemTableSource extends GraftSource {
  override def shortName = "_mlsql_"

  override def load(ctx: ScriptContext, path: String, opts: Map[String, String]): DataFrame = {
    val spark = ctx.spark
    import spark.implicits._
    path.split("/")(0) match {
      case "jobs" =>
        // both surfaces: streaming queries AND running batch script runs
        (spark.streams.active.toSeq
          .map(q => (Option(q.name).getOrElse(""), q.id.toString, q.isActive, "stream")) ++
          graft.dsl.JobManager.list
            .map(j => (j.name, j.groupId, true, "batch")))
          .toDF("name", "id", "is_active", "kind")
      case "ets" => graft.ets.ETRegistry.registered.toDF("name")
      case "streamEvents" | "streamevents" =>
        // also installs the listener, so a monitoring script attaching
        // before any stream starts still sees every event
        graft.streaming.StreamEventLog.install(spark)
        graft.streaming.StreamEventLog.toDF(spark)
      case "datasources" => DataSourceRegistry.registeredNames.toDF("name")
      case "functions" => spark.sql("show functions")
      case "version" =>
        Seq(("graft", spark.version)).toDF("engine", "spark_version")
      case other => throw new IllegalArgumentException(
        s"unknown system table '_mlsql_.`$other`' " +
          "(jobs|ets|datasources|functions|version|streamEvents)")
    }
  }
}

/** `load modelParams.`/model/path`` — read a saved spark.ml model's
  * metadata as a table (reference: ModelSelfExplain via LoadAdaptor:127).
  */
final class ModelParamsSource extends GraftSource {
  override def shortName = "modelparams"
  override def load(ctx: ScriptContext, path: String, opts: Map[String, String]): DataFrame =
    ctx.spark.read.json(ctx.resolvePath(path) + "/metadata")
}
