package graft.ets

import org.apache.spark.sql.DataFrame
import graft.dsl.{ScriptContext, ScriptRunner, Template}

/** `run t as IteratorCommand.`` where sql='''...${col}...'''` — execute a
  * templated statement once per row of the input table, substituting the
  * row's columns into `${...}` holes
  * (reference: tech/mlsql/ets/IteratorCommand.scala).
  *
  * The input table is collected to the driver (the reference does the
  * same) — this is a CONTROL-FLOW operator for small driver-side loops
  * (e.g. a table of paths to ingest), never a data-plane operator; rows
  * are capped to keep a mistake from flooding the driver.
  */
object IteratorCommandET extends NoPathET {
  override def name = "IteratorCommand"

  private val MaxRows = 10000

  override def train(ctx: ScriptContext, df: DataFrame, path: String,
                     params: Map[String, String]): DataFrame = {
    val template = params.getOrElse("sql",
      throw new IllegalArgumentException("IteratorCommand requires sql='''...'''"))
    val rows = df.limit(MaxRows + 1).collect()
    require(rows.length <= MaxRows,
      s"IteratorCommand input exceeds $MaxRows rows — this is a driver-side loop, not a data operator")
    val cols = df.columns
    rows.foreach { row =>
      val env = cols.zipWithIndex.map { case (c, i) =>
        c -> Option(row.get(i)).map(_.toString).getOrElse("")
      }.toMap
      ScriptRunner.run(Template.merge(template, env), ctx.spark, ctx.pathPrefix)
    }
    UtilityETs.oneRowTable(ctx.spark, "iterations" -> rows.length.toString)
  }
}

/** Commands whose backing system is not available offline — registered so
  * scripts parse and the error says exactly what is missing
  * (reference analogs: KafkaCommand.scala, DeltaCommandWrapper.scala,
  * SQLSendMessage.scala).
  */
final class UnavailableET(override val name: String, what: String) extends ET {
  override def train(ctx: ScriptContext, df: DataFrame, path: String,
                     params: Map[String, String]): DataFrame =
    throw new UnsupportedOperationException(
      s"ET '$name' requires $what, which is not available in this offline build")
}
