package graft.dsl

import scala.annotation.tailrec
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import graft.dsl.Parsing._
import graft.ets.ETRegistry
import graft.sources.DataSourceRegistry

/** The Graft script runner: executes the full statement surface of the
  * reference DSL (reference: streaming/dsl/ScriptSQLExec.scala:372-412
  * dispatch + the adaptor classes under tech/mlsql/dsl/adaptor/).
  *
  * Execution model (same as the reference): statements run eagerly in
  * order on the driver; every table-producing statement registers a temp
  * view; Spark's Catalyst does all relational work inside a statement.
  * `${var}` templating is applied per statement just before parsing, so
  * `set` results are visible to every later statement.
  */
object ScriptRunner {

  /** Run a script; returns the final context (lastTable/env/streams). */
  def run(script: String, spark: SparkSession, pathPrefix: String = ""): ScriptContext = {
    val ctx = new ScriptContext(spark, pathPrefix)
    val statements = StatementSplitter.split(expandIncludes(script, ctx))
    // the WHOLE run — including compile-stage `set` SQL, which can launch
    // real Spark jobs — executes inside one job group so `!kill <name>` /
    // JobManager.kill can cancel it from another thread. Registered under a
    // placeholder first, then renamed once `set jobName` (a preprocess-pass
    // statement itself) has run.
    val groupId = JobManager.register(spark,
      "graft-" + java.util.UUID.randomUUID(), pathPrefix)
    // script-lifetime cache scope: every persist pinned by an ET or
    // operator during this run (CacheExt, ShardExport, SequencePack, ...)
    // is unpersisted when the script ends — matching the reference's
    // SQLCacheExt script-scoped persists (SQLCacheExt.scala:38-92). A
    // `lifetime="session"` CacheExt opts out (see CacheExtET).
    try graft.CacheScope.scoped {
      // compile (preprocess) stage: every `set` runs once here — except
      // type="sql" & mode="runtime" (deferred to the physical pass) — so
      // mode="compile" SQL is evaluated before ANY physical statement,
      // exactly like the reference's preProcess listener pass
      // (SetAdaptor.scala:87-104; branch keywords are ignored there too)
      statements.foreach { raw =>
        if (headWord(raw)._1 == "set")
          executeSet(headWord(Template.merge(raw, ctx.env))._2, ctx, preprocess = true)
      }
      ctx.env.get("jobName").foreach(JobManager.rename(groupId, _))
      val branches = new BranchStack
      statements.foreach { raw =>
        val head = headWord(raw)._1
        if (BranchStack.isBranchKeyword(head)) branches.handle(raw, ctx)
        else if (branches.active) execute(raw, ctx)
      }
      branches.requireClosed()
    } finally JobManager.deregister(spark, groupId)
    ctx
  }


  /** Run a script and return its last table (empty DF if none). */
  def runToDF(script: String, spark: SparkSession, pathPrefix: String = ""): DataFrame = {
    val ctx = run(script, spark, pathPrefix)
    ctx.lastDataFrame.getOrElse(spark.emptyDataFrame)
  }

  /** Textual `include` splice, looping to a fixpoint, max 10 passes
    * (reference: ScriptSQLExec.scala:95-109 + IncludeAdaptor.scala:28-83).
    * Sources: `local` (file path; relative resolved against the
    * pathPrefix) and `view`/`function` (named in-session fragments from
    * [[ScriptFragmentStore]] — the offline analog of the reference's
    * analyst-console includes, whose backing store there is an HTTP
    * service). hdfs/http/store remain out of scope offline.
    */
  @tailrec
  private[dsl] def expandIncludes(script: String, ctx: ScriptContext, depth: Int = 0): String = {
    val stmts = StatementSplitter.split(script)
    if (!stmts.exists(s => headWord(s)._1 == "include")) script
    else if (depth >= 10) throw new IllegalStateException("include nesting exceeds 10 levels")
    else {
      val expanded = stmts.map { s =>
        val (head, rest) = headWord(s)
        if (head != "include") s + ";"
        else {
          val ref = parsePathRef(nextToken(rest)._1)
          val content = ref.format match {
            case "local" =>
              new String(java.nio.file.Files.readAllBytes(
                java.nio.file.Paths.get(ctx.resolvePath(ref.path))), "UTF-8")
            case "view" | "function" =>
              ScriptFragmentStore.get(ctx.pathPrefix, ref.path).getOrElse(throw new IllegalArgumentException(
                s"no script fragment named '${ref.path}' — register one with " +
                  "`run <codeTable> as ScriptFragment.`" + ref.path + "``"))
            case other => throw new IllegalArgumentException(
              s"include source '$other' not supported (local|view|function)")
          }
          // terminate the splice: a fragment whose last statement lacks a
          // trailing ';' must not fuse with the parent's next statement
          if (content.trim.endsWith(";")) content else content + "\n;"
        }
      }.mkString("\n")
      expandIncludes(expanded, ctx, depth + 1)
    }
  }

  /** Execute one (already branch-filtered) statement. */
  private[dsl] def execute(raw: String, ctx: ScriptContext): Unit = {
    // select bodies never see un_select-scoped variables (credentials);
    // every other statement templates against the full env
    val envView =
      if (headWord(raw)._1 == "select") ctx.selectEnv else ctx.env
    val stmt = Template.merge(raw, envView)
    val (head, rest) = headWord(stmt)
    head match {
      case "load" => executeLoad(rest, ctx)
      case "select" => executeSelect(stmt, ctx)
      case "save" => executeSave(rest, ctx)
      case "set" => executeSet(rest, ctx)
      case "connect" => executeConnect(rest, ctx)
      case "train" | "run" | "predict" => executeTrain(head, rest, ctx)
      case "register" => executeRegister(rest, ctx)
      case w if w.startsWith("!") => executeMacro(stmt, ctx)
      case "insert" | "create" | "drop" | "refresh" | "alter" | "truncate" | "msck" =>
        // raw passthrough (reference: InsertAdaptor.scala:46-48 etc.)
        ctx.spark.sql(stmt).count()
      case other => throw new IllegalArgumentException(
        s"unknown statement '$other' in: ${stmt.take(80)}")
    }
  }

  /** `load fmt.`path` [where k="v" and ...] as t`
    * (reference: LoadAdaptor.scala:45-206). Streaming formats return a
    * `readStream` DataFrame; `eventTimeCol`+`delayThreshold` attach a
    * watermark (LoadAdaptor.scala:148-157).
    */
  private def executeLoad(rest: String, ctx: ScriptContext): Unit = {
    val (body, table) = stripTrailingAs(rest)
    val tableName = table.getOrElse(throw new IllegalArgumentException("load requires `as <table>`"))
    val (refPart, optsClause) = splitOptionsClause(body)
    val ref = parsePathRef(nextToken(refPart)._1)
    val opts = Template.parseOptions(optsClause, ctx.env)
    val df0 = graft.streaming.StreamSources.loadIfStreaming(ctx, ref.format, ref.path, opts)
      .getOrElse(DataSourceRegistry.load(ctx, ref.format, ref.path, opts))
    val df1 = graft.streaming.StreamSources.decodeValue(df0, opts)
    val df = (opts.get("eventTimeCol"), opts.get("delayThreshold")) match {
      case (Some(c), Some(d)) => df1.withWatermark(c, d)
      case _ => df1
    }
    ctx.setLast(tableName, df)
  }

  /** `select ... as t` — body (sans trailing `as t`) verbatim to Spark SQL
    * (reference: SelectAdaptor.scala:38-76).
    */
  private def executeSelect(stmt: String, ctx: ScriptContext): Unit = {
    val (body, table) = stripTrailingAs(stmt)
    val tableName = table.getOrElse(throw new IllegalArgumentException("select requires `as <table>`"))
    ctx.setLast(tableName, ctx.spark.sql(body))
  }

  /** `save [mode] t as fmt.`path` [where ...] [partitionBy c]`
    * (reference: SaveAdaptor.scala:43-164). Streaming tables start a
    * `StreamingQuery` under the `checkpointLocation`/`duration`/`mode`
    * contract instead (MLSQLBaseStreamSource.scala:43-88).
    */
  private def executeSave(rest: String, ctx: ScriptContext): Unit = {
    val modes = Map("overwrite" -> SaveMode.Overwrite, "append" -> SaveMode.Append,
      "errorifexists" -> SaveMode.ErrorIfExists, "ignore" -> SaveMode.Ignore)
    val (tok1, afterTok1) = nextToken(rest)
    val (mode, tableName, afterTable) = modes.get(tok1.toLowerCase) match {
      case Some(m) =>
        val (t, r) = nextToken(afterTok1)
        (m, t, r)
      case None => (SaveMode.ErrorIfExists, tok1, afterTok1)
    }
    val (asKw, afterAs) = nextToken(afterTable)
    require(asKw.equalsIgnoreCase("as"), s"save: expected `as`, got '$asKw'")
    val (noPartition, partitionCols) = stripPartitionBy(afterAs)
    val (refPart, optsClause) = splitOptionsClause(noPartition)
    val ref = parsePathRef(nextToken(refPart)._1)
    val opts = Template.parseOptions(optsClause, ctx.env)
    val df = ctx.spark.table(tableName)
    if (df.isStreaming)
      graft.streaming.StreamSinks.start(ctx, df, ref.format, ref.path, opts, partitionCols)
    else
      DataSourceRegistry.save(ctx, df, ref.format, mode, ref.path, opts, partitionCols)
    ctx.lastTable = Some(tableName)
  }

  /** `set k = v [where type="..." and mode="..." and scope="..."]`
    * (reference: SetAdaptor.scala:35-199). Types: text (default), sql
    * (evaluate, take row0/col0), conf (`spark.sql("set k=v")`),
    * defaultParam (only set if absent), shell (NOT supported — fails).
    *
    * Staging (SetAdaptor.scala:87-104): `type="sql"` honors
    * `mode="compile"|"runtime"` (default runtime). Compile-mode SQL is
    * evaluated ONCE, in the preprocess pass — before any physical
    * statement runs — and the physical pass must not overwrite the value;
    * runtime-mode SQL is evaluated in statement order in the physical
    * pass. All other types run in both passes (idempotent), matching the
    * reference's two-listener design.
    *
    * Scope (ParameterScope): `scope="un_select"` marks the key as hidden
    * from `select` bodies (credentials in load/connect options).
    */
  private[dsl] def executeSet(rest: String, ctx: ScriptContext,
                              preprocess: Boolean = false): Unit = {
    val eq = maskQuoted(rest).indexOf('=')
    require(eq > 0, s"set: expected `k = v`, got '$rest'")
    val key = rest.substring(0, eq).trim
    val (valuePart, optsClause) = splitOptionsClause(rest.substring(eq + 1).trim)
    val opts = Template.parseOptions(optsClause, ctx.env)
    val rawValue = unquoteValue(valuePart)
    val tpe = opts.getOrElse("type", "text")
    val mode = opts.getOrElse("mode", "runtime")
    if (opts.get("scope").exists(_.split(",").map(_.trim).contains("un_select")))
      ctx.unSelectKeys += key
    val value: Option[String] = tpe match {
      case "text" | "defaultParam" => Some(rawValue)
      case "sql" =>
        (mode, preprocess) match {
          case ("compile", true) | ("runtime", false) =>
            val row = ctx.spark.sql(rawValue).head()
            Some(if (row.isNullAt(0)) "" else row.get(0).toString)
          case ("compile", false) | ("runtime", true) => None // other stage owns it
          case (other, _) => throw new IllegalArgumentException(
            s"set: mode must be compile|runtime, got '$other'")
        }
      case "conf" =>
        ctx.spark.sql(s"set $key = $rawValue")
        Some(rawValue)
      case "shell" => throw new UnsupportedOperationException(
        "set type=\"shell\" is not supported (no shell execution in this engine)")
      case other => throw new IllegalArgumentException(s"set: unknown type '$other'")
    }
    val isCompileSql = tpe == "sql" && mode == "compile"
    // defaultParam never overwrites; the compile-sql statement itself must
    // not clobber its preprocess-computed value when replayed physically
    // (a LATER unrelated `set` of the same key still may — the reference's
    // overwrite flag is per-statement, SetAdaptor.scala:99-104)
    val overwrite = tpe != "defaultParam" && !(isCompileSql && !preprocess)
    value.foreach { v =>
      if (overwrite || !ctx.env.contains(key)) ctx.env(key) = v
    }
  }

  /** Strip one level of quoting from a `set` value: `"..."`, `'...'`, or
    * `'''...'''`; anything else is raw text (the reference allows
    * `set a = b c d;`).
    */
  private[dsl] def unquoteValue(v: String): String = {
    val t = v.trim
    if (t.startsWith("'''") && t.endsWith("'''") && t.length >= 6) t.substring(3, t.length - 3)
    else if (t.length >= 2 && ((t.head == '"' && t.last == '"') || (t.head == '\'' && t.last == '\'')))
      t.substring(1, t.length - 1)
    else t
  }

  /** `connect fmt where opts as alias` (reference: ConnectAdaptor.scala:56-75). */
  private def executeConnect(rest: String, ctx: ScriptContext): Unit = {
    val (body, alias) = stripTrailingAs(rest)
    val aliasName = alias.getOrElse(throw new IllegalArgumentException("connect requires `as <alias>`"))
    val (fmtPart, optsClause) = splitOptionsClause(body)
    val format = nextToken(fmtPart)._1
    ConnectMeta.put(ctx.pathPrefix, format, aliasName, Template.parseOptions(optsClause, ctx.env))
  }

  /** `train|run|predict t as Alg.`path` [where opts] [as out]`
    * (reference: TrainAdaptor.scala:69-122).
    */
  private def executeTrain(verb: String, rest: String, ctx: ScriptContext): Unit = {
    val (inputTable, afterTable) = nextToken(rest)
    val (asKw, afterAs) = nextToken(afterTable)
    require(asKw.equalsIgnoreCase("as"), s"$verb: expected `as`, got '$asKw'")
    // optional trailing output table: `... as out` AFTER the options clause
    val (body, maybeOut) = stripTrailingAs(afterAs)
    val (refPart, optsClause) = splitOptionsClause(body)
    val ref = parsePathRef(nextToken(refPart)._1)
    val params = Template.parseOptions(optsClause, ctx.env)
    val et = ETRegistry.lookup(ref.format)
    val df =
      if (ctx.spark.catalog.tableExists(inputTable)) ctx.spark.table(inputTable)
      else if (inputTable == "command") ctx.spark.emptyDataFrame
      else throw new IllegalArgumentException(s"$verb: unknown table '$inputTable'")
    // only re-root genuine filesystem paths: command/table-name ETs override
    // needsPathResolution=false (mirrors the register path; reference:
    // SQLAlg.skipPathPrefix)
    val path = if (ref.path.isEmpty || !et.needsPathResolution) ref.path
      else ctx.resolvePath(ref.path)
    val out = verb match {
      case "predict" => et.batchPredict(ctx, df, path, params)
      case _ => et.train(ctx, df, path, params)
    }
    val outName = maybeOut.getOrElse(s"__${ref.format.toLowerCase}_out__")
    ctx.setLast(outName, out)
  }

  /** `register Alg.`path` as fname [where opts]`
    * (reference: RegisterAdaptor.scala:61-79): `alg.load` then
    * `alg.predict` → session UDF.
    */
  private def executeRegister(rest: String, ctx: ScriptContext): Unit = {
    val (body, maybeName) = stripTrailingAs(rest)
    val (refPart, optsClause) = splitOptionsClause(body)
    // `as f` may precede the where clause (reference allows both orders)
    val (refPart2, nameFromRef) = stripTrailingAs(refPart)
    val fname = maybeName.orElse(nameFromRef).getOrElse(
      throw new IllegalArgumentException("register requires `as <functionName>`"))
    val ref = parsePathRef(nextToken(refPart2)._1)
    val params = Template.parseOptions(optsClause, ctx.env)
    val et = ETRegistry.lookup(ref.format)
    val path = if (ref.path.isEmpty || !et.needsPathResolution) ref.path
      else ctx.resolvePath(ref.path)
    // re-running a script re-registers its UDFs; for PATH-LESS functions
    // (ScriptUDF — the definition is entirely in the statement) an
    // identical definition is a guaranteed no-op, so skip it instead of
    // tripping Spark's "replaced a previously registered function" WARN
    // on every run. Path-backed registers always refresh: the model file
    // may have been retrained between registers.
    val fpKey = s"graft.register.fp.$fname"
    val fp = s"${ref.format}|${params.toSeq.sortBy(_._1).mkString("&")}"
    val unchanged = path.isEmpty && ctx.spark.conf.getOption(fpKey).contains(fp)
    if (!unchanged) {
      val model = et.load(ctx.spark, path, params)
      val fn = et.predict(ctx.spark, model, fname, params)
      ctx.spark.udf.register(fname, fn)
      if (path.isEmpty) ctx.spark.conf.set(fpKey, fp)
    }
  }

  /** `!cmd a b c` macro expansion (reference: CommandAdaptor.scala:21-69 +
    * the macro table in CommandCollection.scala:25-91): the template's
    * `{}`/`{0}`/`{:all}` holes are filled from the whitespace-tokenized
    * args, then the expanded text is executed as normal statements.
    */
  private def executeMacro(stmt: String, ctx: ScriptContext): Unit = {
    val (bang, rest) = headWord(stmt)
    val cmd = bang.substring(1).toLowerCase
    val template = CommandMacros.byLowerName.getOrElse(cmd,
      throw new IllegalArgumentException(
        s"unknown command !$cmd; known: ${CommandMacros.table.keys.toSeq.sorted.mkString(", ")}"))
    val args = tokenizeArgs(rest)
    val expanded = CommandMacros.fill(template, args)
    StatementSplitter.split(expanded).foreach(execute(_, ctx))
  }

  /** Whitespace-tokenize command args, honoring quotes; surrounding quotes
    * are stripped from each arg.
    */
  private[dsl] def tokenizeArgs(s: String): Seq[String] = {
    @tailrec
    def loop(rest: String, acc: Vector[String]): Vector[String] = {
      val (tok, more) = nextToken(rest)
      if (tok.isEmpty) acc else loop(more, acc :+ unquoteValue(tok))
    }
    loop(s, Vector())
  }
}

/** `!if`/`!elif`/`!else`/`!fi` branch evaluation (reference:
  * ScriptSQLExec.scala:163-174,326-370 + tech/mlsql/ets/ifstmt/
  * IfCommand.scala:17-57). Conditions are SQL expressions evaluated as
  * `spark.sql(...)` row0/col0 booleans.
  */
private[dsl] class BranchStack {
  private case class Frame(parentActive: Boolean, var taken: Boolean, var current: Boolean)
  private val stack = scala.collection.mutable.Stack[Frame]()

  def active: Boolean = stack.forall(f => f.parentActive && f.current)

  def handle(raw: String, ctx: ScriptContext): Unit = {
    val (head, rest) = Parsing.headWord(raw)
    head match {
      case "!if" =>
        val parentOk = active
        val cond = parentOk && evalCond(rest, ctx)
        stack.push(Frame(parentOk, taken = cond, current = cond))
      case "!elif" =>
        val f = top("!elif")
        f.current = f.parentActive && !f.taken && evalCond(rest, ctx)
        if (f.current) f.taken = true
      case "!else" =>
        val f = top("!else")
        f.current = f.parentActive && !f.taken
        if (f.current) f.taken = true
      case "!fi" =>
        top("!fi"); stack.pop()
      case other => throw new IllegalStateException(s"not a branch keyword: $other")
    }
  }

  private def top(kw: String): Frame =
    if (stack.isEmpty) throw new IllegalStateException(s"$kw without matching !if") else stack.top

  def requireClosed(): Unit =
    if (stack.nonEmpty) throw new IllegalStateException("unclosed !if block (missing !fi)")

  private def evalCond(rest: String, ctx: ScriptContext): Boolean = {
    val text = ScriptRunner.unquoteValue(Template.merge(rest.trim, ctx.env)).trim
    val sql = if (text.toLowerCase.startsWith("select")) text else s"select ($text) as __cond__"
    val row = ctx.spark.sql(sql).head()
    !row.isNullAt(0) && (row.get(0) match {
      case b: Boolean => b
      case other => other.toString.equalsIgnoreCase("true")
    })
  }
}

object BranchStack {
  def isBranchKeyword(head: String): Boolean =
    Set("!if", "!elif", "!else", "!fi").contains(head)
}

/** The `!command` macro table (reference: CommandCollection.scala:25-91).
  * Holes: `{}` = next positional arg, `{N}` = arg N, `{:all}` = all args
  * joined by a space.
  */
object CommandMacros {
  val table: Map[String, String] = Map(
    "show" -> "run command as ShowCommand.`{}`",
    "desc" -> "run command as SchemaCommand.`{}`",
    "println" -> "run command as PrintCommand.`` where content='''{:all}'''",
    "cache" -> "run {} as CacheExt.`` where execute=\"cache\" and isEager=\"true\"",
    "uncache" -> "run {} as CacheExt.`` where execute=\"uncache\"",
    "fs" -> "run command as HDFSCommand.`` where parameters='''{:all}'''",
    "hdfs" -> "run command as HDFSCommand.`` where parameters='''{:all}'''",
    "split" -> ("run {} as RateSampler.`` where labelCol=\"{}\" " +
      "and sampleRate=\"{}\" as {}"),
    "repartition" -> "run {1} as TableRepartition.`` where partitionNum=\"{0}\" as {1}",
    "streamJobs" -> "run command as StreamCommand.`list`",
    "schemaInfer" -> "run {0} as SchemaInferCommand.`` where parameters='''{:all}'''",
    "explain" -> "run command as ExplainCommand.`{}`",
    "profile" -> "run {0} as DataProfile.`` as {0}_profile",
    "audit" -> "run {0} as PlanAudit.`` as {0}_audit",
    "killStream" -> "run command as StreamCommand.`kill` where parameters='''{:all}'''",
    "jobs" -> "run command as JobCommand.`list`",
    // reference LastCommand: `!last named t` re-exposes the previous result
    "last" -> "run command as LastCommand.`` where parameters='''{:all}'''",
    "kill" -> "run command as JobCommand.`kill` where parameters='''{:all}'''",
    "resource" -> "run command as EngineResource.``",
    "jdbc" -> "run command as JDBC.`{}`",
    "compact" -> "run command as TableCompaction.`{1}` where targetFileSizeMB=\"{0}\"",
    // reference CommandCollection.scala:48 — `!model history /path`
    "model" -> "run command as ModelCommand.`{1}` where action=\"{0}\"",
    // reference :58 (register form); here run + re-register in place
    "withWartermark" -> ("run {0} as WaterMarkInPlace.`` where " +
      "eventTimeCol=\"{1}\" and delayThreshold=\"{2}\" as {0}"),
    // reference :67 — our RunScript ET reads the script from a table
    "runScript" -> "run {0} as RunScript.``",
    // `!iterator t '''sql'''` (quote-aware arg tokenization)
    "iterator" -> "run {0} as IteratorCommand.`` where sql='''{1}'''",
    // versioned-parquet table management (offline analog of `!delta`)
    "vtable" -> "run command as VParquetCommand.`` where parameters='''{:all}'''",
    // jar/egress-gated: route to the registry slots' actionable errors
    "delta" -> "run command as DeltaCommand.`` where parameters='''{:all}'''",
    "kafkaTool" -> "run command as KafkaCommand.`` where parameters='''{:all}'''",
    "callback" -> "run command as EventCallback.`` where parameters='''{:all}'''"
  )

  /** Case-insensitive view (statement head words are lowercased). */
  val byLowerName: Map[String, String] = table.map { case (k, v) => k.toLowerCase -> v }

  def fill(template: String, args: Seq[String]): String = {
    var next = 0
    val re = """\{(\d*|:all)\}""".r
    re.replaceAllIn(template, m => {
      val hole = m.group(1)
      val v = hole match {
        case ":all" => args.mkString(" ")
        case "" => val v = args.lift(next).getOrElse(""); next += 1; v
        case n => args.lift(n.toInt).getOrElse("")
      }
      scala.util.matching.Regex.quoteReplacement(v)
    })
  }
}
