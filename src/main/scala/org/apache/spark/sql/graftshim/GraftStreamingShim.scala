package org.apache.spark.sql.graftshim

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType

/** The one `private[sql]` door a V1 streaming `Source` cannot avoid:
  * `getBatch` must return a DataFrame whose plan is flagged
  * `isStreaming = true` (MicroBatchExecution asserts it), and the only
  * constructor for that is `SQLContext.internalCreateDataFrame`. This
  * object lives under `org.apache.spark.sql` purely to satisfy that
  * access qualifier — the standard connector-shim pattern (every external
  * V1 source, including spark-kafka's tests, does the same). Nothing else
  * belongs in this package.
  */
object GraftStreamingShim {

  /** Wrap an InternalRow RDD as a STREAMING DataFrame of `schema`. */
  def streamingDataFrame(sqlContext: SQLContext, rdd: RDD[InternalRow],
                         schema: StructType): DataFrame =
    sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext]
      .internalCreateDataFrame(rdd, schema, isStreaming = true)
}
