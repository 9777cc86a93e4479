package graft

/** Benchmark main: runs every SparkEntry query against
  * `SPARK_GRAFT_SF_DIR`, timing a full materialization through the `noop`
  * sink (NOT `count()` — Catalyst elides sorts and prunes projections under
  * a count, which under-measures the real work). Failures are surfaced in
  * the JSON (`failed` list + negative time) instead of being swallowed.
  * One warmup query amortizes JVM/codegen startup out of the first timing.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.getOrCreate()

    def runOnce(name: String): Either[String, Double] = {
      val t0 = System.nanoTime()
      try {
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        Right((System.nanoTime() - t0) / 1e9)
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          Left(e.getClass.getSimpleName)
      }
    }

    // warmup: one cheap query end-to-end (JIT, codegen, parquet footer cache)
    runOnce("q1_agg")

    // Each query runs twice; the SECOND run is reported. The first run of a
    // query shape pays one-time JVM costs (Janino compilation of its codegen
    // classes, JIT of the expression paths) that are not plan costs and do
    // not recur in a long-lived session — measured skew was >20x on
    // light string queries (0.45 s steady vs 11.5 s cold-swept). The cold
    // pass is kept in the JSON under "cold" for transparency.
    val names = SparkEntry.queries.keys.toSeq.sorted
    val cold = names.map(n => n -> runOnce(n))
    val results = names.map(n => n -> runOnce(n))
    val failed = results.collect { case (n, Left(_)) => n }
    val qs = results.map {
      case (k, Right(v)) => s""""$k":$v"""
      case (k, Left(_))  => s""""$k":-1"""
    }.mkString("{", ",", "}")
    val coldJson = cold.map {
      case (k, Right(v)) => s""""$k":$v"""
      case (k, Left(_))  => s""""$k":-1"""
    }.mkString("{", ",", "}")
    val total = results.collect { case (_, Right(v)) => v }.sum
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"cold":$coldJson,"failed":$failedJson,"sf":"$sfDir"}"""
    println(json)
    // also persist to a file: stdout capture has truncated the tail of this
    // (single, long) line before — the file is the lossless copy
    java.nio.file.Files.write(java.nio.file.Paths.get("/tmp/graft_bench.json"),
      json.getBytes("UTF-8"))
    spark.stop()
  }
}
