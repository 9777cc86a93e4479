package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Throwaway timing for p70 (ignored in the suite). */
class ProfileProfile extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  ignore("profile p70 at sf0.1") {
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label%-16s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    for (round <- 1 to 2) {
      t(s"p70.round$round") {
        graft.SparkEntry.queries("p70_profile")(spark, "/root/testdata/sf0.1")
          .write.format("noop").mode("overwrite").save()
      }
      spark.catalog.clearCache()
    }
    graft.SparkEntry.queries("p70_profile")(spark, "/root/testdata/sf0.1")
      .explain("formatted")
  }
}
