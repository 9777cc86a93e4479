package graft
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.getOrCreate()
    val names = args.toSeq
    val unknown = names.filterNot(SparkEntry.queries.keySet)
    require(unknown.isEmpty,
      s"unknown queries: ${unknown.mkString(", ")} — known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}")
    // warmup
    SparkEntry.queries("q1_agg")(spark, sfDir).write.format("noop").mode("overwrite").save()
    for (rep <- 1 to 2; n <- names) {
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"[prof] rep$rep $n ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
