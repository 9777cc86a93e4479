package graft

/** Measurement tool (optimization rounds): write `.explain("formatted")`
  * for the named SparkEntry queries to files, so plan shapes (Exchange
  * count, join strategy, PushedFilters/ReadSchema, codegen spans) can be
  * diffed before/after an optimization and committed as evidence.
  *
  * Usage: runMain graft.PlanDump <outDir> <suffix> <query>...
  *   writes <outDir>/<query>_<suffix>.txt per query.
  * Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).
  *
  * Note: this prints the STATIC plan (AdaptiveSparkPlan isFinalPlan=false
  * where AQE applies); loop operators build iteration plans at run time,
  * so for those the dump shows the returned frame's plan — the loop-round
  * plan shape is documented in OPTIMIZATION notes instead.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <outDir> <suffix> <query>...")
    val outDir = java.nio.file.Paths.get(args(0))
    val suffix = args(1)
    val names = args.drop(2).toSeq
    val unknown = names.filterNot(SparkEntry.queries.keySet)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    java.nio.file.Files.createDirectories(outDir)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- names) {
      val plan = try {
        SparkEntry.queries(n)(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
      } catch { case e: Throwable => s"PLAN FAILED: ${e}" }
      java.nio.file.Files.write(outDir.resolve(s"${n}_$suffix.txt"),
        plan.getBytes("UTF-8"))
      println(s"[plandump] wrote ${n}_$suffix.txt (${plan.length} chars)")
    }
    spark.stop()
  }
}
