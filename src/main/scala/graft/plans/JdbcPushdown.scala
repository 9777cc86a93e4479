package graft.plans

import scala.util.Try

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.graftshim.JdbcShim
import org.apache.spark.sql.jdbc.{JdbcDialect, JdbcDialects}
import org.apache.spark.sql.types._

/** JDBC subtree pushdown: a join / aggregate / top-k subtree whose leaves
  * are all V1 JDBC scans of the SAME connection is compiled to one
  * external-dialect SQL query and replaced by a single `query=` JDBC scan —
  * the database computes the join/aggregate and ships the (small) result
  * instead of shipping every base row for Spark to recombine. This is the
  * profiler-grade pushdown the reference exposes as a plugin
  * (reference: external/mlsql-sql-profiler/.../JDBCSubtreePushdown, conceptually;
  * `directQuery` is the manual form — see `sources/DataSources.scala`), here
  * re-expressed as a Catalyst optimizer rule so it applies to any plan shape
  * automatically.
  *
  * Safety model: STRICT WHITELIST. Every node and expression in the subtree
  * must compile, or the plan is left untouched — there is no partial or
  * best-effort rewrite. The whitelist is chosen so Spark and ANSI engines
  * agree on semantics:
  *  - nodes: Project / Filter / inner+left+right Join with compilable
  *    condition / Aggregate with attribute grouping keys / Union (ALL) /
  *    GlobalLimit (optionally over Sort for top-k);
  *  - expressions: attributes, finite literals of atomic types,
  *    comparisons, AND/OR/NOT, IS [NOT] NULL, IN over literals, LIKE
  *    without escapes, plus/minus/times on int/long/float/double (no decimal — result
  *    precision rules differ per engine), widening numeric casts;
  *  - aggregates: COUNT(*) / COUNT(x) / COUNT(DISTINCT x), SUM and AVG
  *    forced to BIGINT/DOUBLE inside the pushed SQL (engines disagree on
  *    SUM/AVG result types for integer inputs — Derby returns INT for
  *    AVG(INT), Spark returns DOUBLE), MIN/MAX on atomic non-binary types;
  *  - sort keys (top-k only): non-nullable numeric/date/timestamp columns —
  *    NULL ordering and string collation are where engines legitimately
  *    disagree, so neither is ever pushed.
  * Residual type drift (e.g. DECIMAL(31) coming back for a BIGINT sum) is
  * absorbed by a positional Cast back to the Catalyst type.
  *
  * Known semantic caveat (documented, same contract as `directQuery`):
  * string equality/grouping/LIKE follow the DATABASE's collation once
  * pushed. On a case-insensitive-collation MySQL, `GROUP BY s` may merge
  * groups Spark would keep apart. Engines with binary-ish defaults (Derby,
  * Postgres) match Spark. Disable with
  * `set spark.graft.jdbc.pushdown.enabled=false` for collation-sensitive
  * workloads.
  *
  * Scale note: pushing an aggregate trades Spark-side partitioned-read
  * parallelism for moving the computation to the data — for JDBC sources
  * the transfer is the bottleneck (single-digit MB/s per connection), so
  * shipping grouped results instead of base rows wins by orders of
  * magnitude; the partitionColumn options are dropped from the rewritten
  * scan because the reduced result no longer needs parallel extraction.
  */
object JdbcPushdown extends Rule[LogicalPlan] {

  def inject(ext: SparkSessionExtensions): Unit =
    ext.injectOptimizerRule(_ => JdbcPushdown)

  val FLAG = "spark.graft.jdbc.pushdown.enabled"

  /** Per-scan keys that are NOT part of the connection identity and must
    * not ride into the rewritten single-query scan.
    */
  private val scanOnlyKeys = Set("dbtable", "query", "partitioncolumn",
    "lowerbound", "upperbound", "numpartitions", "customschema", "preparequery")

  private def connSignature(params: Map[String, String]): Map[String, String] =
    params.filterNot { case (k, _) => scanOnlyKeys(k.toLowerCase) }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(FLAG, "true").toBoolean) return plan
    plan.transformDown {
      case p @ (_: Aggregate | _: Join | _: GlobalLimit) =>
        rewrite(p).getOrElse(p)
    }
  }

  // ---------------------------------------------------------------- rewrite

  private def rewrite(p: LogicalPlan): Option[LogicalPlan] = {
    // every leaf a jdbc scan of one connection, else leave untouched
    val leaves = p.collectLeaves().map(JdbcShim.jdbcScan)
    if (leaves.isEmpty || leaves.exists(_.isEmpty)) return None
    val sigs = leaves.flatten.map(l => connSignature(l._2))
    if (sigs.distinct.size != 1) return None
    val url = sigs.head.find(_._1.equalsIgnoreCase("url")).map(_._2)
      .getOrElse(return None)
    val dialect = JdbcDialects.get(url)
    nullsOrderingOk.set(supportsNullsOrdering(url))
    val gen = new AliasGen
    for {
      q <- compile(p, dialect, gen)
      replaced <- substitute(p, q.sql, sigs.head)
    } yield replaced
  }

  /** Engines that accept an explicit `NULLS FIRST`/`NULLS LAST` in ORDER BY
    * (needed because Spark and e.g. Derby DISAGREE on default null order:
    * Spark puts nulls first ASC, Derby sorts them high). On anything else a
    * nullable sort key is never pushed. Thread-local because the Rule
    * object is shared across sessions.
    */
  private def supportsNullsOrdering(url: String): Boolean =
    Seq("jdbc:derby:", "jdbc:postgresql:", "jdbc:oracle:", "jdbc:db2:",
      "jdbc:h2:").exists(url.startsWith)
  private val nullsOrderingOk = new ThreadLocal[Boolean] {
    override def initialValue(): Boolean = false
  }

  /** Build the replacement scan and the positional re-aliasing Project.
    * Runs one schema round trip against the database; any failure (or a
    * result shape we can't cast back) abandons the rewrite.
    */
  private def substitute(p: LogicalPlan, sql: String,
                         conn: Map[String, String]): Option[LogicalPlan] =
    Try {
      val spark = SparkSession.active
      val newDf = spark.read.format("jdbc")
        .options(conn + ("query" -> sql)).load()
      val rel = newDf.queryExecution.analyzed
      require(rel.output.size == p.output.size,
        s"pushdown arity ${rel.output.size} != ${p.output.size}")
      val projs = p.output.zip(rel.output).map { case (orig, n) =>
        val e: Expression =
          if (n.dataType == orig.dataType) n
          else {
            require(Cast.canCast(n.dataType, orig.dataType),
              s"pushdown cannot cast ${n.dataType} back to ${orig.dataType}")
            Cast(n, orig.dataType, Option(conf.sessionLocalTimeZone))
          }
        Alias(e, orig.name)(exprId = orig.exprId, qualifier = orig.qualifier)
      }
      logInfo(s"jdbc pushdown: ${p.nodeName} subtree -> $sql")
      Project(projs, rel)
    }.toOption

  // ---------------------------------------------------------------- compile

  private class AliasGen {
    private var n = -1
    def next(): String = { n += 1; s"gpd_t$n" }
  }

  /** A compiled subtree: `sql` is either a bare table identifier
    * (`table=true`) or a full SELECT; `cols` maps each output attribute,
    * in order, to its (dialect-quoted) column name inside this fragment.
    */
  private case class Q(sql: String, table: Boolean, cols: Seq[(ExprId, String)])

  private def from(q: Q, alias: String): String =
    if (q.table) s"${q.sql} $alias" else s"(${q.sql}) $alias"

  /** Promote a fragment to a full SELECT (UNION ALL branches can't be bare
    * table names because their column order must be pinned explicitly).
    */
  private def toSelect(q: Q, d: JdbcDialect, gen: AliasGen): Q =
    if (!q.table) q
    else {
      val alias = gen.next()
      val e = env(q, alias)
      val (sel, cols) = items(d, q.cols.map { case (id, _) => id -> e(id) })
      Q(s"SELECT $sel FROM ${from(q, alias)}", table = false, cols)
    }

  private def env(q: Q, alias: String): Map[ExprId, String] =
    q.cols.map { case (id, c) => id -> s"$alias.$c" }.toMap

  /** Positional select items `expr AS "c0", ...` plus the resulting col map. */
  private def items(d: JdbcDialect,
                    compiled: Seq[(ExprId, String)]): (String, Seq[(ExprId, String)]) = {
    val cols = compiled.zipWithIndex.map { case ((id, _), i) =>
      id -> d.quoteIdentifier(s"c$i")
    }
    val sel = compiled.zip(cols).map { case ((_, e), (_, c)) => s"$e AS $c" }
    (sel.mkString(", "), cols)
  }

  private def compile(p: LogicalPlan, d: JdbcDialect, gen: AliasGen): Option[Q] =
    p match {
      case scan if JdbcShim.jdbcScan(scan).isDefined =>
        val (out, params) = JdbcShim.jdbcScan(scan).get
        val dbtable = params.find(_._1.equalsIgnoreCase("dbtable")).map(_._2)
        val query = params.find(_._1.equalsIgnoreCase("query")).map(_._2)
        val cols = out.map(a => a.exprId -> d.quoteIdentifier(a.name))
        (dbtable, query) match {
          // "(select ...) alias" legacy dbtable form would double-alias
          case (Some(t), _) if !t.trim.startsWith("(") => Some(Q(t, table = true, cols))
          case (None, Some(sq)) => Some(Q(sq, table = false, cols))
          case _ => None
        }

      case Project(list, child) =>
        for {
          q <- compile(child, d, gen)
          alias = gen.next()
          e = env(q, alias)
          compiled <- traverse(list)(ne => compileNamed(ne, e, d))
        } yield {
          val (sel, cols) = items(d, compiled)
          Q(s"SELECT $sel FROM ${from(q, alias)}", table = false, cols)
        }

      case Filter(cond, child) =>
        for {
          q <- compile(child, d, gen)
          alias = gen.next()
          e = env(q, alias)
          w <- compileExpr(cond, e, d)
        } yield {
          val passthrough = q.cols.map { case (id, _) => id -> e(id) }
          val (sel, cols) = items(d, passthrough)
          Q(s"SELECT $sel FROM ${from(q, alias)} WHERE $w", table = false, cols)
        }

      case j @ Join(left, right, jt, Some(cond), _) =>
        val kw = jt match {
          case Inner => "JOIN"
          case LeftOuter => "LEFT JOIN"
          case RightOuter => "RIGHT JOIN"
          case _ => return None // FULL OUTER: absent in Derby/MySQL; semi/anti: later
        }
        for {
          ql <- compile(left, d, gen)
          qr <- compile(right, d, gen)
          aL = gen.next(); aR = gen.next()
          e = env(ql, aL) ++ env(qr, aR)
          on <- compileExpr(cond, e, d)
          compiled <- traverse(j.output)(a => e.get(a.exprId).map(a.exprId -> _))
        } yield {
          val (sel, cols) = items(d, compiled)
          Q(s"SELECT $sel FROM ${from(ql, aL)} $kw ${from(qr, aR)} ON $on",
            table = false, cols)
        }

      case Aggregate(groupingExprs, aggExprs, child, _) =>
        // grouping keys restricted to bare attributes so every non-aggregate
        // select item provably appears in GROUP BY (strict engines reject
        // anything the parser can't match structurally)
        val groupAttrs = groupingExprs.map {
          case a: AttributeReference => a
          case _ => return None
        }
        for {
          q <- compile(child, d, gen)
          alias = gen.next()
          e = env(q, alias)
          groups <- traverse(groupAttrs)(a => e.get(a.exprId))
          compiled <- traverse(aggExprs) {
            case a: AttributeReference if groupAttrs.exists(_.exprId == a.exprId) =>
              e.get(a.exprId).map(a.exprId -> _)
            case al @ Alias(a: AttributeReference, _)
                if groupAttrs.exists(_.exprId == a.exprId) =>
              e.get(a.exprId).map(al.exprId -> _)
            case al @ Alias(ae: AggregateExpression, _) =>
              compileAgg(ae, e, d).map(al.exprId -> _)
            case _ => None
          }
        } yield {
          val (sel, cols) = items(d, compiled)
          val groupBy = if (groups.isEmpty) "" else s" GROUP BY ${groups.mkString(", ")}"
          Q(s"SELECT $sel FROM ${from(q, alias)}$groupBy", table = false, cols)
        }

      // UNION ALL (Spark's Union node is bag semantics; DISTINCT unions
      // appear as Aggregate-over-Union and compile through that path).
      // Children line up positionally — each compiled child emits its
      // columns in its own output order, which Union already aligned.
      case u: Union if u.children.size >= 2 =>
        traverse(u.children)(c => compile(c, d, gen).map(toSelect(_, d, gen)))
          .map { parts =>
            val cols = u.output.zip(parts.head.cols).map { case (a, (_, c)) =>
              a.exprId -> c
            }
            Q(parts.map(_.sql).mkString(" UNION ALL "), table = false, cols)
          }

      case GlobalLimit(IntegerLiteral(n), LocalLimit(IntegerLiteral(m), child))
          if n == m =>
        val (inner, order) = child match {
          case Sort(sortOrder, true, grandchild, _) => (grandchild, sortOrder)
          case c => (c, Seq.empty[SortOrder])
        }
        for {
          q <- compile(inner, d, gen)
          alias = gen.next()
          e = env(q, alias)
          orderSql <- traverse(order)(compileSortKey(_, e))
        } yield {
          val passthrough = q.cols.map { case (id, _) => id -> e(id) }
          val (sel, cols) = items(d, passthrough)
          val ob = if (orderSql.isEmpty) "" else s" ORDER BY ${orderSql.mkString(", ")}"
          // ANSI FETCH FIRST fallback for dialects with no LIMIT clause (Derby)
          val lim = Option(d.getLimitClause(n)).filter(_.nonEmpty)
            .getOrElse(s"FETCH FIRST $n ROWS ONLY")
          Q(s"SELECT $sel FROM ${from(q, alias)}$ob $lim", table = false, cols)
        }

      case _ => None
    }

  /** Sort keys: non-string only (collation is where engines legitimately
    * diverge). Null placement is pinned with an explicit NULLS FIRST/LAST
    * matching Spark's SortOrder — engines disagree on the default — so a
    * nullable key is only pushed on dialects known to accept that clause.
    */
  private def compileSortKey(so: SortOrder,
                             e: Map[ExprId, String]): Option[String] = so.child match {
    case a: AttributeReference if (a.dataType match {
      case _: NumericType | DateType | TimestampType => true
      case _ => false
    }) && (!a.nullable || nullsOrderingOk.get()) =>
      val dir = if (so.direction == Ascending) "ASC" else "DESC"
      val nulls = if (!a.nullable) ""
        else if (so.nullOrdering == NullsFirst) " NULLS FIRST" else " NULLS LAST"
      e.get(a.exprId).map(c => s"$c $dir$nulls")
    case _ => None
  }

  private def compileNamed(ne: NamedExpression, e: Map[ExprId, String],
                           d: JdbcDialect): Option[(ExprId, String)] = ne match {
    case a: AttributeReference => e.get(a.exprId).map(a.exprId -> _)
    case al @ Alias(child, _) => compileExpr(child, e, d).map(al.exprId -> _)
    case _ => None
  }

  // ------------------------------------------------------------ expressions

  private def okLiteralType(dt: DataType): Boolean = dt match {
    case _: NumericType if !dt.isInstanceOf[DecimalType] => true
    case StringType | BooleanType | DateType | TimestampType => true
    case _ => false
  }

  /** Comparison operands: atomic, non-binary (byte-array compare semantics
    * differ), non-decimal literals are fine since column side drives types.
    */
  private def comparable(dt: DataType): Boolean = dt match {
    case _: NumericType => true
    case StringType | BooleanType | DateType | TimestampType => true
    case _ => false
  }

  private def arithType(dt: DataType): Boolean = dt match {
    case IntegerType | LongType | ShortType | ByteType |
         DoubleType | FloatType => true
    case _ => false
  }

  private def wideningNumeric(fromT: DataType, to: DataType): Boolean =
    (fromT, to) match {
      case (ByteType, ShortType | IntegerType | LongType | DoubleType) => true
      case (ShortType, IntegerType | LongType | DoubleType) => true
      case (IntegerType, LongType | DoubleType) => true
      case (LongType, DoubleType) => true // documented lossy-above-2^53, same both sides
      case (FloatType, DoubleType) => true
      case _ => false
    }

  private def sqlTypeName(d: JdbcDialect, dt: DataType): Option[String] =
    d.getJDBCType(dt).map(_.databaseTypeDefinition).orElse(dt match {
      case ByteType => Some("SMALLINT")
      case ShortType => Some("SMALLINT")
      case IntegerType => Some("INTEGER")
      case LongType => Some("BIGINT")
      case FloatType => Some("REAL")
      case DoubleType => Some("DOUBLE PRECISION")
      case _ => None
    })

  private def literalSql(l: Literal, d: JdbcDialect): Option[String] = {
    if (l.value == null) return Some("NULL")
    if (!okLiteralType(l.dataType)) return None
    l.value match {
      case dbl: java.lang.Double if !java.lang.Double.isFinite(dbl) => return None
      case f: java.lang.Float if !java.lang.Float.isFinite(f) => return None
      case _ =>
    }
    val ext = CatalystTypeConverters.convertToScala(l.value, l.dataType)
    Some(String.valueOf(d.compileValue(ext)))
  }

  private def compileExpr(expr: Expression, e: Map[ExprId, String],
                          d: JdbcDialect): Option[String] = {
    def go(x: Expression): Option[String] = compileExpr(x, e, d)
    def bin(l: Expression, op: String, r: Expression): Option[String] =
      for (ls <- go(l); rs <- go(r)) yield s"($ls $op $rs)"
    expr match {
      case a: AttributeReference => e.get(a.exprId)
      case l: Literal => literalSql(l, d)

      case EqualTo(l, r) if comparable(l.dataType) => bin(l, "=", r)
      case LessThan(l, r) if comparable(l.dataType) => bin(l, "<", r)
      case LessThanOrEqual(l, r) if comparable(l.dataType) => bin(l, "<=", r)
      case GreaterThan(l, r) if comparable(l.dataType) => bin(l, ">", r)
      case GreaterThanOrEqual(l, r) if comparable(l.dataType) => bin(l, ">=", r)

      case And(l, r) => bin(l, "AND", r)
      case Or(l, r) => bin(l, "OR", r)
      case Not(c) => go(c).map(s => s"(NOT $s)")
      case IsNull(c) => go(c).map(s => s"($s IS NULL)")
      case IsNotNull(c) => go(c).map(s => s"($s IS NOT NULL)")

      case In(v, list) if comparable(v.dataType) &&
          list.forall(x => x.isInstanceOf[Literal] &&
            x.asInstanceOf[Literal].value != null) =>
        for {
          vs <- go(v)
          elems <- traverse(list)(go)
        } yield s"($vs IN (${elems.mkString(", ")}))"

      // LIKE only with the default escape and an escape-free literal
      // pattern: engines disagree on default escape characters
      case Like(l, Literal(pat, StringType), '\\')
          if pat != null && !pat.toString.contains("\\") =>
        for (ls <- go(l); ps <- literalSql(Literal(pat, StringType), d))
          yield s"($ls LIKE $ps)"

      // starts/ends/contains as LIKE, only when the needle has no LIKE
      // metacharacters (no portable escape syntax exists across engines)
      case StartsWith(l, Literal(v, StringType)) if likeSafe(v) =>
        likeOf(go(l), s"$v%", d)
      case EndsWith(l, Literal(v, StringType)) if likeSafe(v) =>
        likeOf(go(l), s"%$v", d)
      case Contains(l, Literal(v, StringType)) if likeSafe(v) =>
        likeOf(go(l), s"%$v%", d)

      case a @ Add(l, r, _) if arithType(a.dataType) => bin(l, "+", r)
      case a @ Subtract(l, r, _) if arithType(a.dataType) => bin(l, "-", r)
      case a @ Multiply(l, r, _) if arithType(a.dataType) => bin(l, "*", r)

      case Cast(child, dt, _, _) if wideningNumeric(child.dataType, dt) =>
        for {
          cs <- go(child)
          tn <- sqlTypeName(d, dt)
        } yield s"CAST($cs AS $tn)"

      case _ => None
    }
  }

  private def compileAgg(ae: AggregateExpression, e: Map[ExprId, String],
                         d: JdbcDialect): Option[String] = {
    if (ae.filter.isDefined) return None
    def go(x: Expression): Option[String] = compileExpr(x, e, d)
    def cast(x: Expression, dt: DataType): Option[String] =
      for (xs <- go(x); tn <- sqlTypeName(d, dt)) yield s"CAST($xs AS $tn)"
    ae.aggregateFunction match {
      case c: Count => c.children match {
        case Seq(Literal(v, _)) if v != null && !ae.isDistinct => Some("COUNT(*)")
        case Seq(x) =>
          go(x).map(xs => if (ae.isDistinct) s"COUNT(DISTINCT $xs)" else s"COUNT($xs)")
        case _ => None
      }
      case _ if ae.isDistinct => None // SUM/AVG/MIN DISTINCT: not worth the risk
      // force the accumulator type in the database: engines disagree on
      // SUM/AVG result types for integer inputs (Derby AVG(INT) = INT)
      case Sum(x, _) => ae.dataType match {
        case LongType => cast(x, LongType).map(s => s"SUM($s)")
        case DoubleType => cast(x, DoubleType).map(s => s"SUM($s)")
        case _ => None // decimal sums: result precision rules differ
      }
      case Average(x, _) => ae.dataType match {
        case DoubleType => cast(x, DoubleType).map(s => s"AVG($s)")
        case _ => None
      }
      case Min(x) if comparable(x.dataType) => go(x).map(s => s"MIN($s)")
      case Max(x) if comparable(x.dataType) => go(x).map(s => s"MAX($s)")
      case _ => None
    }
  }

  private def likeSafe(v: Any): Boolean =
    v != null && !v.toString.exists(c => c == '%' || c == '_' || c == '\\')

  private def likeOf(lhs: Option[String], pat: String,
                     d: JdbcDialect): Option[String] =
    for (ls <- lhs; ps <- literalSql(Literal(pat), d)) yield s"($ls LIKE $ps)"

  private def traverse[A, B](xs: Seq[A])(f: A => Option[B]): Option[Seq[B]] = {
    val out = Seq.newBuilder[B]
    for (x <- xs) f(x) match {
      case Some(b) => out += b
      case None => return None
    }
    Some(out.result())
  }
}
