package graft.ets

import org.apache.spark.sql.DataFrame
import graft.dsl.ScriptContext

/** Stream lifecycle commands (reference: MLSQLStreamManager.scala:68-221 +
  * SQLMLSQLJobExt "Kill"): `!streamJobs` lists active queries,
  * `!killStream name` stops one by queryName.
  */
object StreamCommandET extends NoPathET {
  override def name = "StreamCommand"

  override def train(ctx: ScriptContext, df: DataFrame, path: String,
                     params: Map[String, String]): DataFrame = {
    val spark = ctx.spark
    import spark.implicits._
    path match {
      case "list" =>
        spark.streams.active.toSeq
          .map(q => (Option(q.name).getOrElse(""), q.id.toString, q.isActive,
            Option(q.lastProgress).map(_.batchId).getOrElse(-1L)))
          .toDF("name", "id", "is_active", "last_batch")
      case "kill" =>
        val target = params.getOrElse("parameters", "").trim
        require(target.nonEmpty, "!killStream requires a stream name")
        val killed = spark.streams.active.filter(q => q.name == target).map { q =>
          q.stop(); q.name
        }
        killed.toSeq.toDF("stopped")
      case other => throw new IllegalArgumentException(
        s"StreamCommand supports list|kill, got '$other'")
    }
  }
}

/** Batch-job lifecycle (reference: SQLMLSQLJobExt — `!kill` cancels a
  * script run's Spark job group; JobManager in RestController.scala:119-131
  * is the registry): `!jobs` lists running script runs, `!kill <name|id>`
  * cancels one. Streaming queries have their own `!killStream`.
  */
object JobCommandET extends NoPathET {
  override def name = "JobCommand"

  override def train(ctx: ScriptContext, df: DataFrame, path: String,
                     params: Map[String, String]): DataFrame = {
    val spark = ctx.spark
    import spark.implicits._
    path match {
      case "list" =>
        graft.dsl.JobManager.list(ctx.pathPrefix)
          .map(j => (j.name, j.groupId, new java.sql.Timestamp(j.startMs)))
          .toDF("name", "group_id", "started_at")
      case "kill" =>
        val target = params.getOrElse("parameters", "").trim
        require(target.nonEmpty, "!kill requires a job name or group id")
        graft.dsl.JobManager.kill(spark, target, ctx.pathPrefix)
          .toDF("cancelled_group")
      case other => throw new IllegalArgumentException(
        s"JobCommand supports list|kill, got '$other'")
    }
  }
}
