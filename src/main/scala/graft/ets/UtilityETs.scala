package graft.ets

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import graft.dsl.ScriptContext

/** Data-manipulation ETs (reference: the utility modules listed in
  * SURVEY.md §2.4 — Pivot, TableRepartition, RateSampler, CacheExt,
  * ShowCommand/SchemaCommand, PrintCommand, HDFSCommand, WaterMarkInPlace,
  * RunScript).
  */
object UtilityETs {
  def all: Seq[ET] = Seq(PivotET, TableRepartitionET, RateSamplerET, CacheExtET,
    ShowCommandET, SchemaCommandET, PrintCommandET, HDFSCommandET,
    WaterMarkInPlaceET, RunScriptET, TableToMapET, MapValuesET,
    DicOrTableToArrayET, SchemaInferCommandET, ExplainCommandET, DataProfileET,
    ScriptFragmentET, TableCompactionET, PlanAuditET)

  private[ets] def oneRowTable(spark: SparkSession, cols: (String, String)*): DataFrame = {
    val schema = StructType(cols.map(c => StructField(c._1, StringType)))
    spark.createDataFrame(java.util.List.of(Row(cols.map(_._2): _*)), schema)
  }
}

/** `run t as Pivot.`` where groupBy="a" and pivot="b" and agg="sum" and
  * aggCol="c" [and values="v1,v2"]` →
  * `df.groupBy(a).pivot(b[, values]).agg(sum(c))`
  * (reference: external/mlsql-ets/.../Pivot.scala:20-35).
  * Passing explicit `values` skips the extra distinct-scan Spark otherwise
  * runs to discover pivot columns — always set it at scale.
  */
object PivotET extends NoPathET {
  override def name = "Pivot"
  override def train(ctx: ScriptContext, df: DataFrame, path: String,
                     params: Map[String, String]): DataFrame = {
    val groupCols = params("groupBy").split(",").map(c => col(c.trim)).toSeq
    val pivotCol = params("pivot")
    val aggFn = params.getOrElse("agg", "sum")
    val aggCol = params("aggCol")
    val grouped = df.groupBy(groupCols: _*)
    val pivoted = params.get("values") match {
      case Some(vs) => grouped.pivot(pivotCol, vs.split(",").map(_.trim).toSeq)
      case None => grouped.pivot(pivotCol)
    }
    pivoted.agg(expr(s"$aggFn(`$aggCol`)"))
  }
}

/** `run t as TableRepartition.`` where partitionNum="32"
  * [and partitionCols="a,b"] [and shuffle="false"]` — `repartition` /
  * `coalesce` (reference: external/mlsql-ets/.../TableRepartition.scala:19-49).
  */
object TableRepartitionET extends NoPathET {
  override def name = "TableRepartition"
  override def train(ctx: ScriptContext, df: DataFrame, path: String,
                     params: Map[String, String]): DataFrame = {
    val num = params.get("partitionNum").map(_.toInt)
    val cols = params.get("partitionCols").toSeq
      .flatMap(_.split(",")).map(c => col(c.trim))
    (num, cols) match {
      case (Some(n), Nil) =>
        if (params.get("shuffle").contains("false")) df.coalesce(n) else df.repartition(n)
      case (Some(n), cs) => df.repartition(n, cs: _*)
      case (None, cs) if cs.nonEmpty => df.repartition(cs: _*)
      case _ => throw new IllegalArgumentException(
        "TableRepartition requires partitionNum and/or partitionCols")
    }
  }
}

/** `run t as RateSampler.`` where labelCol="label" and
  * sampleRate="0.8,0.2" [and seed="42"]` — random split adding a
  * `__split__` column (reference: SQLRateSampler.scala:34-136).
  *
  * Semantics note: the default is per-row Bernoulli assignment
  * (`rand(seed)` bucketed by the cumulative rates), like
  * `randomSplit`/`sampleByKey` — per-label proportions hold IN EXPECTATION
  * only (as in the reference, which samples per label with the same
  * Bernoulli draw), and there is NO shuffle, so label skew is irrelevant
  * at 100 TB. `strategy="exact"` instead fills per-label quotas exactly
  * (row_number over a seeded shuffle within each label): one window
  * shuffle on `labelCol` — use when a rare label must hit its fraction to
  * the row, and salt/split upstream if one label dominates the corpus.
  */
object RateSamplerET extends NoPathET {
  override def name = "RateSampler"
  override def train(ctx: ScriptContext, df: DataFrame, path: String,
                     params: Map[String, String]): DataFrame = {
    val rates = params.getOrElse("sampleRate", "0.9,0.1").split(",").map(_.trim.toDouble)
    require(math.abs(rates.sum - 1.0) < 1e-9, s"sampleRate must sum to 1, got ${rates.mkString(",")}")
    val seed = params.getOrElse("seed", "42").toLong
    val cum = rates.scanLeft(0.0)(_ + _).tail // upper bound per split
    // ONE materialized draw per row, compared against every bound: putting
    // the raw rand()/window expression inside each `when` branch would give
    // every occurrence its own (short-circuit-desynchronized) RNG stream,
    // skewing 3+-way splits (e.g. 0.8/0.1/0.1 silently became 0.8/0.18/...)
    def assign(withDraw: DataFrame): DataFrame = {
      val splitCol = cum.init.zipWithIndex.foldRight(lit(cum.length - 1): org.apache.spark.sql.Column) {
        case ((ub, idx), acc) => when(col("__draw__") < ub, idx).otherwise(acc)
      }
      withDraw.withColumn("__split__", splitCol).drop("__draw__")
    }
    params.getOrElse("strategy", "bernoulli") match {
      case "bernoulli" =>
        assign(df.withColumn("__draw__", rand(seed)))
      case "exact" =>
        val label = col(params.getOrElse("labelCol",
          throw new IllegalArgumentException("strategy=\"exact\" requires labelCol")))
        val w = org.apache.spark.sql.expressions.Window.partitionBy(label)
        val frac = (row_number().over(w.orderBy(rand(seed))) - lit(1)).cast("double") /
          count(lit(1)).over(w)
        assign(df.withColumn("__draw__", frac))
      case other => throw new IllegalArgumentException(
        s"RateSampler strategy must be bernoulli|exact, got '$other'")
    }
  }
}

/** `!cache t` / `run t as CacheExt.`` where execute="cache" and
  * isEager="true"` (reference: SQLCacheExt.scala:38-92).
  *
  * Lifetime matches the reference's scope semantics: by default the
  * persist is SCRIPT-scoped — registered with the run's
  * [[graft.CacheScope]] and unpersisted when the script ends — so
  * repeated runs of a caching script (the bench's cold/warm/retry loop)
  * never accrete pinned copies. `lifetime="session"` opts out: the cache
  * outlives the script and the user releases it with `execute="uncache"`.
  */
object CacheExtET extends NoPathET {
  override def name = "CacheExt"
  override def train(ctx: ScriptContext, df: DataFrame, path: String,
                     params: Map[String, String]): DataFrame = {
    params.getOrElse("execute", "cache") match {
      case "uncache" => df.unpersist()
      case _ =>
        val lifetime = params.getOrElse("lifetime", "script")
        require(lifetime == "script" || lifetime == "session",
          s"CacheExt lifetime must be script|session, got '$lifetime'")
        df.persist()
        if (lifetime == "script") graft.CacheScope.pinIfScoped(df)
        // lifetime="session": user owns the release (execute="uncache")
        if (params.getOrElse("isEager", "false").toBoolean) df.count()
    }
    df
  }
}

/** `!show tables` → catalog introspection tables
  * (reference: tech/mlsql/ets/ShowCommand.scala).
  */
object ShowCommandET extends NoPathET {
  override def name = "ShowCommand"
  override def train(ctx: ScriptContext, df: DataFrame, path: String,
                     params: Map[String, String]): DataFrame = {
    val spark = ctx.spark
    path match {
      case "tables" => spark.sql("show tables")
      case "databases" => spark.sql("show databases")
      case "functions" => spark.sql("show functions")
      case "ets" => {
        import spark.implicits._
        ETRegistry.registered.toDF("name")
      }
      case "version" => UtilityETs.oneRowTable(spark,
        "engine" -> "graft", "spark" -> spark.version)
      // reference: SQLDataSourceExt lists the source formats; one shared
      // listing with the `_mlsql_.datasources` system table
      case "datasources" => {
        import spark.implicits._
        graft.sources.DataSourceRegistry.listing.toDF("name", "kind")
      }
      case other => throw new IllegalArgumentException(
        s"!show supports tables|databases|functions|ets|datasources|version, got '$other'")
    }
  }
}

/** `!desc t` — one row per column of the table's schema
  * (reference: external/mlsql-ets/.../SchemaCommand.scala).
  */
object SchemaCommandET extends NoPathET {
  override def name = "SchemaCommand"
  override def train(ctx: ScriptContext, df: DataFrame, path: String,
                     params: Map[String, String]): DataFrame =
    ctx.spark.sql(s"describe table ${if (path.nonEmpty) path else params("table")}")
}

/** `run t as DataProfile.`` — per-column profile: type, null count,
  * approx distinct, min/max, and (numeric columns) approx quantiles
  * p25/p50/p75/p95 — still ONE pass: every statistic is a sketch-sized
  * aggregate (approx_count_distinct HLL, approx_percentile KLL) in a
  * single `agg`, so the profile costs one scan at any scale. The
  * data-quality first step of every training-data pipeline.
  */
object DataProfileET extends NoPathET {
  override def name = "DataProfile"
  override def train(ctx: ScriptContext, df: DataFrame, path: String,
                     params: Map[String, String]): DataFrame = {
    val spark = ctx.spark
    import spark.implicits._
    import org.apache.spark.sql.types.NumericType
    val total = count(lit(1))
    val numeric = df.schema.fields
      .filter(_.dataType.isInstanceOf[NumericType]).map(_.name).toSet
    val accuracy = params.getOrElse("percentileAccuracy", "10000")
    val aggs = df.schema.fields.flatMap { f =>
      // backtick-quote: a column literally named "user.id" must not be
      // parsed as a nested field reference (the percentile expr below
      // already quotes for the same reason)
      val c = col(s"`${f.name}`")
      val base = Seq(
        sum(when(c.isNull, 1).otherwise(0)).cast("long").as(s"${f.name}__nulls"),
        approx_count_distinct(c).as(s"${f.name}__distinct"),
        min(c).cast("string").as(s"${f.name}__min"),
        max(c).cast("string").as(s"${f.name}__max"))
      if (numeric(f.name))
        base :+ expr(
          s"approx_percentile(`${f.name}`, array(0.25, 0.5, 0.75, 0.95), $accuracy)")
          .cast("array<double>").as(s"${f.name}__pct")
      else base
    }
    val row = df.agg(total.as("__total__"), aggs.toSeq: _*).head()
    val totalRows = row.getLong(0)
    df.schema.fields.map { f =>
      val pct =
        if (numeric(f.name)) Option(row.getAs[scala.collection.Seq[Double]](s"${f.name}__pct"))
        else None
      (f.name, f.dataType.simpleString, totalRows,
        row.getAs[Long](s"${f.name}__nulls"),
        row.getAs[Long](s"${f.name}__distinct"),
        row.getAs[String](s"${f.name}__min"),
        row.getAs[String](s"${f.name}__max"),
        pct.map(_(0)).map(Double.box).orNull,
        pct.map(_(1)).map(Double.box).orNull,
        pct.map(_(2)).map(Double.box).orNull,
        pct.map(_(3)).map(Double.box).orNull)
    }.toSeq.toDF("column", "type", "n_rows", "n_nulls", "approx_distinct",
      "min", "max", "p25", "p50", "p75", "p95")
  }
}

/** `run command as TableCompaction.`/warehouse/t`` — small-file compaction
  * for a parquet/orc/json/csv directory: rewrite to
  * ceil(totalBytes / targetFileSizeMB) files, optionally range-sorted by
  * `sortBy` columns so min/max footer stats prune scans afterwards. The
  * housekeeping operator every long-lived 100 TB table needs (streaming
  * sinks and frequent small batches accrete KB-sized files whose per-file
  * open/seek overhead dominates scans; the reference defers this to Delta's
  * OPTIMIZE, which needs the delta jar). The rewrite goes to a temp dir
  * and is promoted with the same move-aside swap as the CDC sink.
  */
object TableCompactionET extends ET {
  override def name = "TableCompaction"
  override def train(ctx: ScriptContext, df: DataFrame, path: String,
                     params: Map[String, String]): DataFrame = {
    import org.apache.hadoop.fs.Path
    require(path.nonEmpty, "TableCompaction requires a directory path")
    val spark = ctx.spark
    val fmt = params.getOrElse("format", "parquet")
    val targetMB = params.getOrElse("targetFileSizeMB", "128").toLong
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val target = new Path(path)
    // count DATA files only (skip _SUCCESS/.crc markers), recursively
    def dataFiles(p: Path): Long = fs.listStatus(p).map { st =>
      val n = st.getPath.getName
      if (st.isDirectory) dataFiles(st.getPath)
      else if (n.startsWith("_") || n.startsWith(".")) 0L
      else 1L
    }.sum
    val nFiles = dataFiles(target)
    val bytes = fs.getContentSummary(target).getLength
    val nOut = math.max(1L, math.ceil(bytes.toDouble / (targetMB * 1024 * 1024)).toLong).toInt
    val data = spark.read.format(fmt).load(path)
    val sorted = (params.get("zorderBy"), params.get("sortBy")) match {
      case (Some(zc), _) =>
        // multi-dimensional clustering: see graft.operators.scale.ZOrder
        graft.operators.scale.ZOrder.cluster(data,
          zc.split(",").map(_.trim).toSeq, nOut)
      case (None, Some(sc)) =>
        val cols = sc.split(",").map(c => col(c.trim)).toSeq
        data.repartitionByRange(nOut, cols: _*).sortWithinPartitions(cols: _*)
      case _ => data.repartition(nOut)
    }
    val tmp = path.stripSuffix("/") + "__compact_tmp__"
    sorted.write.mode("overwrite").format(fmt).save(tmp)
    val old = new Path(path.stripSuffix("/") + "__compact_old__")
    if (fs.exists(old)) fs.delete(old, true)
    require(fs.rename(target, old), s"compaction: cannot move $path aside")
    require(fs.rename(new Path(tmp), target), s"compaction: cannot promote $tmp")
    fs.delete(old, true)
    UtilityETs.oneRowTable(spark,
      "path" -> path, "files_before" -> nFiles.toString,
      "files_after" -> dataFiles(target).toString,
      "bytes" -> bytes.toString, "target_files" -> nOut.toString)
  }
}

/** `run codeTable as ScriptFragment.`name`` (or `where code='''...'''`) —
  * register a named script fragment for later `include view.`name`` /
  * `include function.`name`` splices ([[graft.dsl.ScriptFragmentStore]]).
  * The code comes from the `code` param or the input table's single-row
  * `content` column (the `load script.`...`` shape).
  */
object ScriptFragmentET extends NoPathET {
  override def name = "ScriptFragment"
  override def train(ctx: ScriptContext, df: DataFrame, path: String,
                     params: Map[String, String]): DataFrame = {
    require(path.nonEmpty, "ScriptFragment requires a fragment name: ScriptFragment.`name`")
    val code = params.getOrElse("code", {
      val colName = params.getOrElse("inputCol", "content")
      df.select(colName).head().getString(0)
    })
    graft.dsl.ScriptFragmentStore.put(ctx.pathPrefix, path, code)
    UtilityETs.oneRowTable(ctx.spark, "fragment" -> path,
      "chars" -> code.length.toString)
  }
}

/** `!explain t` — the table's formatted physical plan as a one-row table
  * (engine-native debugging surface for the plan-audit workflow BenchSpec
  * automates; no direct reference analog — the reference relies on the
  * Spark UI).
  */
object ExplainCommandET extends NoPathET {
  override def name = "ExplainCommand"
  override def train(ctx: ScriptContext, df: DataFrame, path: String,
                     params: Map[String, String]): DataFrame = {
    val target = ctx.spark.table(if (path.nonEmpty) path else params("table"))
    UtilityETs.oneRowTable(ctx.spark,
      "plan" -> target.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
  }
}

/** `!audit t` — the physical-plan facts that matter at 100 TB, as a
  * queryable `(metric, value, detail)` table: shuffle/broadcast exchange
  * counts, single-partition exchanges (the global-window trap),
  * cartesian/broadcast-nested-loop joins, whole-stage-codegen span count,
  * and one row per scan with its pushed filters and read schema. The same
  * audit the BenchSpec plan reviews run from code, exposed to scripts so a
  * pipeline author can assert their own plans before paying for a run (no
  * reference analog — the reference points users at the Spark UI).
  */
object PlanAuditET extends NoPathET {
  override def name = "PlanAudit"
  override def train(ctx: ScriptContext, df: DataFrame, path: String,
                     params: Map[String, String]): DataFrame = {
    import org.apache.spark.sql.execution._
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
    import org.apache.spark.sql.catalyst.plans.physical.SinglePartition
    val target =
      if (path.nonEmpty) ctx.spark.table(path)
      else params.get("table").map(ctx.spark.table).getOrElse(df)
    // audit the CLASSIC physical plan (AQE re-planned off): under AQE the
    // pre-execution tree splits exchange insertion and codegen collapse
    // across stages that don't exist yet, so no single inspectable tree
    // carries both. The classic plan is the as-written cost shape; AQE can
    // only improve on it at runtime (coalesce, skew-split, demote).
    val aqeKey = "spark.sql.adaptive.enabled"
    val prevAqe = ctx.spark.conf.get(aqeKey)
    ctx.spark.conf.set(aqeKey, "false")
    val nodes = try {
      def walk(p: SparkPlan): Seq[SparkPlan] = p match {
        case a: AdaptiveSparkPlanExec => p +: walk(a.initialPlan)
        case _ => p +: p.children.flatMap(walk)
      }
      walk(org.apache.spark.sql.graftshim.PlanShim
        .ofRows(ctx.spark, target.queryExecution.logical)
        .queryExecution.executedPlan)
    } finally ctx.spark.conf.set(aqeKey, prevAqe)
    val shuffles = nodes.collect { case s: ShuffleExchangeExec => s }
    val single = shuffles.filter(_.outputPartitioning == SinglePartition)
    val rows = Seq.newBuilder[(String, String, String)]
    rows += (("shuffle_exchanges", shuffles.size.toString,
      shuffles.map(_.outputPartitioning.toString).mkString("; ")))
    rows += (("single_partition_exchanges", single.size.toString,
      if (single.isEmpty) "" else "WARNING: a single-partition exchange " +
        "serializes the whole input through one task"))
    rows += (("broadcast_exchanges",
      nodes.count(_.isInstanceOf[BroadcastExchangeExec]).toString, ""))
    val bnlj = nodes.filter(n => n.nodeName.contains("BroadcastNestedLoopJoin") ||
      n.nodeName.contains("CartesianProduct"))
    rows += (("nested_loop_or_cartesian_joins", bnlj.size.toString,
      if (bnlj.isEmpty) "" else "WARNING: O(n*m) join — " +
        bnlj.map(_.nodeName).distinct.mkString(", ")))
    rows += (("wholestage_codegen_spans",
      nodes.count(_.isInstanceOf[WholeStageCodegenExec]).toString, ""))
    rows += (("sorts", nodes.count(_.nodeName == "Sort").toString, ""))
    nodes.collect { case s: DataSourceScanExec => s }.foreach { s =>
      // the formatted-explain detail block: Output/Location/ReadSchema/
      // PushedFilters, one line each
      val detail = s.verboseStringWithOperatorId().linesIterator
        .map(_.trim).filter(l => l.startsWith("PushedFilters") ||
          l.startsWith("ReadSchema") || l.startsWith("Location"))
        .map(_.take(200)).mkString("; ")
      rows += (("scan", s.nodeName, detail))
    }
    val spark = ctx.spark
    import spark.implicits._
    rows.result().toDF("metric", "value", "detail")
  }
}

/** `!println '''msg'''` (reference: tech/mlsql/ets/PrintCommand.scala). */
object PrintCommandET extends NoPathET {
  override def name = "PrintCommand"
  override def train(ctx: ScriptContext, df: DataFrame, path: String,
                     params: Map[String, String]): DataFrame = {
    val content = params.getOrElse("content", path)
    // scalastyle:off println
    println(content)
    // scalastyle:on println
    UtilityETs.oneRowTable(ctx.spark, "content" -> content)
  }
}

/** `!fs ls /path` / `!fs rm /path` — Hadoop FileSystem ops returning a
  * table (reference: tech/mlsql/ets/HDFSCommand.scala).
  */
object HDFSCommandET extends ET {
  override def name = "HDFSCommand"
  override def train(ctx: ScriptContext, df: DataFrame, path: String,
                     params: Map[String, String]): DataFrame = {
    import org.apache.hadoop.fs.{FileSystem, Path}
    val spark = ctx.spark
    val args = params.getOrElse("parameters", path).split("\\s+").filter(_.nonEmpty)
    require(args.nonEmpty, "!fs requires a subcommand: ls|rm|mkdir")
    val fs = FileSystem.get(spark.sparkContext.hadoopConfiguration)
    import spark.implicits._
    // every target goes through the tenant re-rooting + containment check —
    // `!fs rm -r <path>` from a prefixed script must not reach another
    // tenant's home (the same rule every path-taking ET follows)
    def resolved(p: String) = ctx.resolvePath(p)
    args(0) match {
      case "ls" =>
        fs.listStatus(new Path(resolved(args(1)))).toSeq
          .map(st => (st.getPath.toString, st.getLen, st.isDirectory))
          .toDF("path", "size", "is_dir")
      case "rm" | "-rmr" =>
        val recursive = args.contains("-r") || args(0) == "-rmr"
        val target = resolved(args.last)
        val ok = fs.delete(new Path(target), recursive)
        Seq((target, ok)).toDF("path", "deleted")
      case "mkdir" =>
        val target = resolved(args.last)
        val ok = fs.mkdirs(new Path(target))
        Seq((target, ok)).toDF("path", "created")
      case other => throw new IllegalArgumentException(s"!fs: unsupported subcommand '$other'")
    }
  }
}

/** `run t as WaterMarkInPlace.`` where eventTimeCol="ts" and
  * delayThreshold="10 seconds"` — re-registers the SAME view with a
  * watermark (reference: SQLWaterMarkInPlace.scala:28-47).
  */
object WaterMarkInPlaceET extends NoPathET {
  override def name = "WaterMarkInPlace"
  override def train(ctx: ScriptContext, df: DataFrame, path: String,
                     params: Map[String, String]): DataFrame =
    df.withWatermark(params("eventTimeCol"), params("delayThreshold"))
}

/** `run t as RunScript.`` where inputCol="content"` — execute Graft script
  * text held in the (single-row) input table
  * (reference: tech/mlsql/ets/RunScript.scala).
  */
object RunScriptET extends NoPathET {
  override def name = "RunScript"
  override def train(ctx: ScriptContext, df: DataFrame, path: String,
                     params: Map[String, String]): DataFrame = {
    val colName = params.getOrElse("inputCol", "content")
    val script = df.select(colName).head().getString(0)
    val sub = graft.dsl.ScriptRunner.run(script, ctx.spark, ctx.pathPrefix)
    sub.lastDataFrame.getOrElse(ctx.spark.emptyDataFrame)
  }
}

/** `run t as MapValues.`` where mapTable="dict" and inputCol="k" — map a
  * column through a (small, broadcast) key→value dictionary table, with an
  * optional `defaultValue` (reference: SQLMapValues.scala:29). The
  * dictionary MUST be dimension-sized; the data table is never shuffled.
  */
object MapValuesET extends NoPathET {
  override def name = "MapValues"
  override def train(ctx: ScriptContext, df: DataFrame, path: String,
                     params: Map[String, String]): DataFrame = {
    val dict = ctx.spark.table(params.getOrElse("mapTable",
      throw new IllegalArgumentException("MapValues requires mapTable")))
    val keyCol = params.getOrElse("keyCol", dict.columns(0))
    val valCol = params.getOrElse("valueCol", dict.columns(1))
    val inputCol = params.getOrElse("inputCol",
      throw new IllegalArgumentException("MapValues requires inputCol"))
    val outputCol = params.getOrElse("outputCol", inputCol + "_mapped")
    val joined = df.join(
      org.apache.spark.sql.functions.broadcast(
        dict.select(col(keyCol).as("__k__"), col(valCol).as("__v__"))),
      df(inputCol) === col("__k__"), "left")
    val withDefault = params.get("defaultValue") match {
      case Some(d) => joined.withColumn(outputCol, coalesce(col("__v__"), lit(d)))
      case None => joined.withColumn(outputCol, col("__v__"))
    }
    withDefault.drop("__k__", "__v__")
  }
}

/** `run dict as DicOrTableToArray.`` where inputCol="w" and udfName="f" —
  * collect one small column to a broadcast array and register a no-arg UDF
  * returning it (reference: SQLDicOrTableToArray.scala:56).
  */
object DicOrTableToArrayET extends NoPathET {
  override def name = "DicOrTableToArray"
  override def train(ctx: ScriptContext, df: DataFrame, path: String,
                     params: Map[String, String]): DataFrame = {
    val inputCol = params.getOrElse("inputCol", df.columns(0))
    val arr = df.select(col(inputCol).cast("string")).collect().map(_.getString(0)).toSeq
    val bc = ctx.spark.sparkContext.broadcast(arr)
    ctx.spark.udf.register(params.getOrElse("udfName", "dic_array"), () => bc.value)
    df
  }
}

/** `!schemaInfer t varName` (or `!schemaInfer t as varName`) — infer a
  * JSON schema from a table's string `value` column (sampled) and stash its
  * DDL in the script env for later `valueSchema="${varName}"` stream loads.
  * Re-creates the reference's `!kafkaTool registerSchema` flow
  * (KafkaCommand.scala:65-115) without requiring a Kafka broker: the
  * sampling source is any table.
  */
object SchemaInferCommandET extends NoPathET {
  override def name = "SchemaInferCommand"
  override def train(ctx: ScriptContext, df: DataFrame, path: String,
                     params: Map[String, String]): DataFrame = {
    val sampleN = params.getOrElse("sampleSize", "100").toInt
    // macro passes the raw arg list; the var name is the LAST token, which
    // also tolerates the `t as varName` form
    val varName = params.get("varName")
      .orElse(params.get("parameters").map(_.trim.split("\\s+").last).filter(_.nonEmpty))
      .getOrElse("inferredSchema")
    val spark = ctx.spark
    import spark.implicits._
    val values = df.select(col("value").cast("string")).limit(sampleN)
      .collect().map(_.getString(0)).toSeq
    val ddl = spark.read.json(spark.createDataset(values)).schema.toDDL
    ctx.env(varName) = ddl
    UtilityETs.oneRowTable(spark, "varName" -> varName, "schema" -> ddl)
  }
}

/** `run t as TableToMap.`` — collect a small 2-column table to a broadcast
  * map and register a lookup UDF named by `udfName`
  * (reference: SQLTableToMap.scala:30). The input MUST be dimension-sized:
  * it is collected to the driver and broadcast.
  */
object TableToMapET extends NoPathET {
  override def name = "TableToMap"
  override def train(ctx: ScriptContext, df: DataFrame, path: String,
                     params: Map[String, String]): DataFrame = {
    val keyCol = params.getOrElse("keyCol", df.columns(0))
    val valCol = params.getOrElse("valueCol", df.columns(1))
    val m = df.select(col(keyCol).cast("string"), col(valCol).cast("string"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val bc = ctx.spark.sparkContext.broadcast(m)
    val udfName = params.getOrElse("udfName", "table_map_lookup")
    ctx.spark.udf.register(udfName, (k: String) => bc.value.get(k))
    df
  }
}
