package org.apache.spark.sql.graftshim

import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.execution.datasources.jdbc.JDBCRelation

/** The one `private[sql]` door the JDBC subtree pushdown needs:
  * recognizing a V1 JDBC scan inside a logical plan means matching
  * [[JDBCRelation]], which is `private[sql]`. This object lives under
  * `org.apache.spark.sql` purely to satisfy that access qualifier (same
  * pattern as [[GraftStreamingShim]]); the rule itself stays in
  * `graft.plans`.
  */
object JdbcShim {

  /** `(output, jdbc options as a plain map)` when `plan` is exactly a
    * non-streaming V1 JDBC scan. The options map keeps the writer's
    * original (case-insensitive) keys: url, dbtable/query, credentials,
    * fetchsize, ...
    */
  def jdbcScan(plan: LogicalPlan): Option[(Seq[Attribute], Map[String, String])] =
    plan match {
      case l: LogicalRelation if !l.isStreaming => l.relation match {
        case j: JDBCRelation => Some((l.output, j.jdbcOptions.parameters.toMap))
        case _ => None
      }
      case _ => None
    }
}
