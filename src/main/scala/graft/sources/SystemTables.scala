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
        // (batch list is tenant-scoped — see JobManager.list)
        (spark.streams.active.toSeq
          .map(q => (Option(q.name).getOrElse(""), q.id.toString, q.isActive, "stream")) ++
          graft.dsl.JobManager.list(ctx.pathPrefix)
            .map(j => (j.name, j.groupId, true, "batch")))
          .toDF("name", "id", "is_active", "kind")
      case "ets" => graft.ets.ETRegistry.registered.toDF("name")
      case "streamEvents" | "streamevents" =>
        // also installs the listener, so a monitoring script attaching
        // before any stream starts still sees every event
        graft.streaming.StreamEventLog.install(spark)
        graft.streaming.StreamEventLog.toDF(spark)
      case "datasources" => DataSourceRegistry.listing.toDF("name", "kind")
      case "functions" => spark.sql("show functions")
      case "version" =>
        Seq(("graft", spark.version)).toDF("engine", "spark_version")
      case other => throw new IllegalArgumentException(
        s"unknown system table '_mlsql_.`$other`' " +
          "(jobs|ets|datasources|functions|version|streamEvents)")
    }
  }
}

/** THE reader for a saved spark.ml artifact's `metadata/` self-description
  * — shared by every model-introspection surface (model/modelParams
  * sources, `!model`, ModelExplainInPlace) so the metadata layout is
  * interpreted in exactly one place.
  */
object ModelMeta {
  def read(spark: org.apache.spark.sql.SparkSession, modelPath: String): DataFrame =
    spark.read.json(modelPath + "/metadata")
}

/** `load modelParams.`/model/path`` — read a saved spark.ml model's
  * metadata as a table (reference: ModelSelfExplain via LoadAdaptor:127).
  */
final class ModelParamsSource extends GraftSource {
  override def shortName = "modelparams"
  override def load(ctx: ScriptContext, path: String, opts: Map[String, String]): DataFrame =
    ModelMeta.read(ctx.spark, ctx.resolvePath(path))
}

/** `load model.`/model/path`` — reference short name for model
  * introspection (MLSQLModel.scala); same metadata surface as modelParams.
  */
final class ModelSource extends GraftSource {
  override def shortName = "model"
  override def load(ctx: ScriptContext, path: String, opts: Map[String, String]): DataFrame =
    ModelMeta.read(ctx.spark, ctx.resolvePath(path))
}

/** `load mlsqlConf.`[prefix]`` — engine/Spark conf introspection
  * (reference: MLSQLConf source); optional path filters by key prefix.
  */
final class ConfSource extends GraftSource {
  override def shortName = "mlsqlconf"
  override def load(ctx: ScriptContext, path: String, opts: Map[String, String]): DataFrame = {
    val spark = ctx.spark
    import spark.implicits._
    val all = spark.conf.getAll.toSeq.sortBy(_._1)
    val filtered = if (path.isEmpty) all else all.filter(_._1.startsWith(path))
    filtered.toDF("key", "value")
  }
}

/** `load unStructured.`/docs/dir`` — whole-file text ingestion: one row
  * per file with (file, content) (reference: MLSQLUnStructured — the raw
  * corpus on-ramp; re-expressed with Spark's wholetext text reader).
  */
final class UnStructuredSource extends GraftSource {
  override def shortName = "unstructured"
  override def load(ctx: ScriptContext, path: String, opts: Map[String, String]): DataFrame = {
    import org.apache.spark.sql.functions._
    ctx.spark.read.option("wholetext", "true").options(opts)
      .text(ctx.resolvePath(path))
      .select(input_file_name().as("file"), col("value").as("content"))
  }
}
