package graft.functions

import org.apache.spark.sql.SparkSession

/** Built-in UDF pack, registered once per session by [[graft.GraftSession]].
  * Populated by the function families in this package (vector algebra,
  * array helpers, time, misc). Placeholder list grows with each family.
  */
object UDFPack {
  def register(spark: SparkSession): Unit = {
    // families register themselves; filled in by graft.functions.*
  }
}
