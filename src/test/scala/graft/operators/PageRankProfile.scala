package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Throwaway profiling harness (ignored in the suite; flip to `test`
  * for ad-hoc timing of the real p66 entry at sf0.1).
  */
class PageRankProfile extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  ignore("profile p66 entry at sf0.1") {
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label%-20s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    for (round <- 1 to 3) {
      t(s"p66.round$round") {
        graft.SparkEntry.queries("p66_pagerank")(spark, "/root/testdata/sf0.1")
          .write.format("noop").mode("overwrite").save()
      }
      spark.catalog.clearCache() // bench parity: each run starts uncached
    }
  }
}
