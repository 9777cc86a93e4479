package org.apache.spark.sql.graftshim

import org.apache.spark.sql.expressions.{SparkUserDefinedFunction, UserDefinedFunction}
import org.apache.spark.sql.types.DataType

/** `private[sql]` door for building an UNTYPED scalar UDF (a FunctionN
  * over external values with an explicit return DataType and no input
  * encoders). The public `functions.udf(AnyRef, DataType)` is gated
  * behind `spark.sql.legacy.allowUntypedScalaUDF`; flipping that conf
  * session-wide would weaken type checking for every registered UDF, so
  * the python script-UDF path (whose input types are genuinely unknown
  * until the call site) constructs the function directly instead.
  */
object UdfShim {
  def untyped(f: AnyRef, dataType: DataType, name: String): UserDefinedFunction =
    SparkUserDefinedFunction(f, dataType, inputEncoders = Nil).withName(name)
}
