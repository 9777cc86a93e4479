package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for every suite (suites run in one forked JVM). */
object TestSpark {
  lazy val spark: SparkSession = GraftSession.getOrCreate("4")
}
