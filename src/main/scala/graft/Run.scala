package graft

/** Thin CLI for executing a Graft script file (SURVEY §7: "a thin
  * CLI/main for driving"): `sbt "runMain graft.Run /path/script.mlsql"`.
  * Prints the final table (20 rows) like the reference's console output.
  */
object Run {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: graft.Run <script-file> [pathPrefix]")
    val script = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(args(0))), "UTF-8")
    val spark = GraftSession.getOrCreate()
    val ctx = graft.dsl.ScriptRunner.run(script, spark,
      if (args.length > 1) args(1) else "")
    // streaming last-tables cannot be show()n — their sink is the query
    ctx.lastDataFrame.filterNot(_.isStreaming).foreach(_.show(20, truncate = false))
    // streaming scripts: wait for the named queries to finish
    ctx.streams.values.foreach(_.awaitTermination())
    spark.stop()
  }
}
