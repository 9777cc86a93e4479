package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.{VParquet, VParquetFileIndex}

/** Metadata-only aggregation over vparquet snapshots: a whole-table
  * `COUNT(*)` / `COUNT(col)` / `MIN(col)` / `MAX(col)` is answered from
  * the manifest's per-file stats — ZERO files opened, zero tasks. On a
  * 100 TB table that turns a full scan into a driver-side fold over
  * already-parsed JSON (the same capability Delta exposes for stats-backed
  * aggregates). Injected as an optimizer rule via SparkSessionExtensions.
  *
  * Safety: the rewrite fires only when EVERY aggregate in the list is
  * provably answerable from stats —
  *  - every manifest file carries stats (tables with pre-stats commits
  *    keep scanning);
  *  - `COUNT(col)` needs a recorded null count in every file;
  *  - `MIN/MAX(col)` need a recorded range in every file that has any
  *    non-null value of `col` (all-null files contribute nothing), and the
  *    stored stat is EXACT for the types harvested (footer stats are the
  *    true extrema; ASCII-string gating in the harvest means a present
  *    string stat is the byte-order extremum, which is exactly Spark's
  *    UTF8String ordering);
  *  - no grouping, no DISTINCT, no FILTER clause, no other functions, no
  *    Filter below (filtered scans go through normal file pruning).
  * Anything else leaves the plan untouched.
  */
object MetadataOnlyAgg extends Rule[LogicalPlan] {

  def inject(ext: SparkSessionExtensions): Unit =
    ext.injectOptimizerRule(_ => MetadataOnlyAgg)

  /** The bare stats-bearing scan: a vparquet LogicalRelation, optionally
    * under attribute-only Projects (column pruning leaves these).
    */
  private object StatScan {
    def unapply(plan: LogicalPlan): Option[Seq[VParquet.FileEntry]] = plan match {
      case l: LogicalRelation if !l.isStreaming => l.relation match {
        case h: HadoopFsRelation => h.location match {
          case idx: VParquetFileIndex => Some(idx.manifestEntries)
          case _ => None
        }
        case _ => None
      }
      case Project(projs, child) if projs.forall(_.isInstanceOf[AttributeReference]) =>
        unapply(child)
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case agg @ Aggregate(Nil, aggExprs, StatScan(entries), _)
        if aggExprs.nonEmpty && entries.nonEmpty &&
           entries.forall(_.stats.isDefined) =>
      val stats = entries.map(_.stats.get)
      val values = aggExprs.map(answer(_, stats))
      if (values.exists(_.isEmpty)) agg
      else LocalRelation(agg.output, Seq(InternalRow.fromSeq(values.map(_.get))))
  }

  /** Some(internal value) iff this aggregate is answerable from stats.
    * The inner Option is the VALUE (null for min/max of an all-null
    * column) — hence the nested shape.
    */
  private def answer(e: NamedExpression,
                     stats: Seq[graft.sources.DataSkipping.FileStats]): Option[Any] = e match {
    case Alias(AggregateExpression(fn, Complete, false, None, _), _) => fn match {
      case Count(Seq(Literal(v, _))) if v != null => // count(*); count(NULL) is 0, not rows
        Some(stats.map(_.numRecords).sum)
      case Count(Seq(a: AttributeReference)) =>
        // non-null count: every file must have recorded the null count
        if (stats.forall(_.nullCounts.contains(a.name)))
          Some(stats.map(s => s.numRecords - s.nullCounts(a.name)).sum)
        else None
      case Min(a: AttributeReference) => extremum(a, stats, isMin = true)
      case Max(a: AttributeReference) => extremum(a, stats, isMin = false)
      case _ => None
    }
    case _ => None
  }

  private def extremum(a: AttributeReference,
                       stats: Seq[graft.sources.DataSkipping.FileStats],
                       isMin: Boolean): Option[Any] = {
    val side = if (isMin) (s: graft.sources.DataSkipping.FileStats) => s.minValues
               else (s: graft.sources.DataSkipping.FileStats) => s.maxValues
    // a file may lack the stat ONLY if it provably has no non-null value
    // of the column; otherwise the answer is unknowable from metadata
    val perFile: Seq[Option[String]] = stats.map { s =>
      side(s).get(a.name) match {
        case some @ Some(_) => some
        case None =>
          val allNull = s.numRecords == 0 ||
            s.nullCounts.get(a.name).contains(s.numRecords)
          if (allNull) None else return None
      }
    }
    val present = perFile.flatten
    if (present.isEmpty) return Some(null) // MIN/MAX of all-null is NULL
    val best = a.dataType match {
      case _: StringType => if (isMin) present.min else present.max
      case _ =>
        val ord = Ordering.by((s: String) => BigDecimal(s))
        if (isMin) present.min(ord) else present.max(ord)
    }
    toInternal(a.dataType, best)
  }

  /** Stored stat string → Catalyst internal value; None for types the
    * harvest never records (the match is belt-and-braces — such columns
    * have no stats and bail earlier).
    */
  private def toInternal(dt: DataType, s: String): Option[Any] = try dt match {
    case ByteType => Some(s.toLong.toByte)
    case ShortType => Some(s.toLong.toShort)
    case IntegerType | DateType => Some(s.toLong.toInt)
    case LongType | TimestampType | TimestampNTZType => Some(s.toLong)
    case FloatType => Some(BigDecimal(s).toFloat)
    case DoubleType => Some(BigDecimal(s).toDouble)
    case StringType => Some(UTF8String.fromString(s))
    case _ => None
  } catch { case _: NumberFormatException => None }
}
