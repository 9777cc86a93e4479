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
