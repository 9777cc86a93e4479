package graft

/** Focused micro-bench: run the named SparkEntry queries N times each
  * (default 2) against SPARK_GRAFT_SF_DIR, printing every timing — the tool
  * for separating a query's steady-state cost from one-time JIT/codegen/IO
  * warmup that the full `Bench` sweep can blur together.
  *
  * Usage: runMain graft.BenchOne q1_agg f1_string [reps]
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val (names, reps) = args.lastOption.flatMap(a => scala.util.Try(a.toInt).toOption) match {
      case Some(n) => (args.dropRight(1).toSeq, n)
      case None => (args.toSeq, 2)
    }
    require(names.nonEmpty, "usage: BenchOne <query>... [reps]")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.getOrCreate()
    // SPARK_GRAFT_BENCHONE_CLEAR=1 replicates the full sweep's per-run
    // spark.catalog.clearCache() so harness-state interactions (the p46
    // class of in-sweep inflation) are reproducible in isolation
    val clear = sys.env.get("SPARK_GRAFT_BENCHONE_CLEAR").contains("1")
    for (name <- names; i <- 1 to reps) {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      // ROOT locale: Bench's isolated-rerun parser regexes this line, and
      // the f"" interpolator would print a comma decimal in e.g. de_DE
      println(String.format(java.util.Locale.ROOT, "[benchone] %s #%d: %.3f s",
        name, Int.box(i), Double.box((System.nanoTime() - t0) / 1e9)))
      if (clear) spark.catalog.clearCache()
    }
    spark.stop()
  }
}
