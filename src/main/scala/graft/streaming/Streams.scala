package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.dsl.ScriptContext

/** Streaming sources for `load` (reference: LoadAdaptor.scala:72-78,146 —
  * a stream-source format makes the whole script a streaming job; the
  * script must carry `set streamName="..."`).
  */
object StreamSources {

  /** Streaming formats get a `readStream` DataFrame; batch formats → None. */
  def loadIfStreaming(ctx: ScriptContext, format: String, path: String,
                      opts: Map[String, String]): Option[DataFrame] =
    format.toLowerCase match {
      case "mockstream" => Some(mockStream(ctx, path, opts))
      case "rate" =>
        Some(ctx.spark.readStream.format("rate").options(opts).load())
      case "streamparquet" | "streamcsv" | "streamjson" | "streamtext" =>
        val fmt = format.toLowerCase.stripPrefix("stream")
        val reader = ctx.spark.readStream.format(fmt).options(opts - "schema")
        val withSchema = opts.get("schema") match {
          case Some(ddl) => reader.schema(ddl)
          case None => reader
        }
        Some(withSchema.load(ctx.resolvePath(path)))
      case "vparquet" if (opts.contains("startingVersion") && !opts.contains("endingVersion")) ||
          opts.get("stream").contains("true") =>
        // startingVersion alone = STREAMING change feed; with endingVersion
        // it's the BATCH changes read handled by the registry source
        // change-feed read of a vparquet table's manifest log (the `load
        // delta.` streaming-read capability): `load vparquet.`t` where
        // startingVersion="0" as feed;` — see
        // [[graft.sources.VParquetChangeSource]] for the offset/emission
        // contract (versions are offsets; merges re-deliver their touched
        // buckets, Delta ignoreChanges semantics)
        val reader = ctx.spark.readStream
          .format(classOf[graft.sources.VParquetStreamProvider].getName)
          .options(opts - "schema")
        val withSchema = opts.get("schema") match {
          case Some(ddl) => reader.schema(ddl)
          case None => reader
        }
        Some(withSchema.load(ctx.resolvePath(path)))
      case "kafka" if !kafkaOnClasspath(ctx) =>
        throw new IllegalStateException(
          "kafka source requires spark-sql-kafka on the classpath (not bundled offline)")
      case "kafka" =>
        Some(ctx.spark.readStream.format("kafka").options(opts).load())
      case _ => None
    }

  /** Kafka-style value decoding (reference: LoadAdaptor.scala:167-199 +
    * WowJsonToStructs/WowCsvToStructs — re-expressed with the public
    * `from_json`/`from_csv`, per SURVEY §2.7): with
    * `valueSchema="a int, b string"` and `valueFormat="json"|"csv"`, the
    * binary/string `value` column is parsed against the DDL schema and
    * flattened to top-level columns; the raw fields are kept in a
    * `kafkaValue` struct.
    */
  def decodeValue(df: org.apache.spark.sql.DataFrame, opts: Map[String, String]): org.apache.spark.sql.DataFrame =
    (opts.get("valueSchema"), opts.get("valueFormat")) match {
      case (Some(ddl), Some(format)) =>
        import org.apache.spark.sql.functions._
        require(df.columns.contains("value"), "valueSchema requires a `value` column")
        val raw = col("value").cast("string")
        val parsed = format match {
          case "json" => from_json(raw, ddl, Map.empty[String, String])
          case "csv" => from_csv(raw, org.apache.spark.sql.types.StructType.fromDDL(ddl),
            Map.empty[String, String])
          case other => throw new IllegalArgumentException(
            s"valueFormat must be json|csv, got '$other'")
        }
        val meta = df.columns.filter(_ != "value").map(col)
        df.withColumn("__parsed__", parsed)
          .withColumn("kafkaValue", struct(meta.toSeq: _*))
          .selectExpr("__parsed__.*", "kafkaValue")
      case _ => df
    }

  private def kafkaOnClasspath(ctx: ScriptContext): Boolean =
    try { Class.forName("org.apache.spark.sql.kafka010.KafkaSourceProvider"); true }
    catch { case _: ClassNotFoundException => false }

  /** `load mockStream.`batchTable` as s` — replay an existing batch temp
    * view as a stream via MemoryStream (reference: MLSQLMockStream.scala,
    * re-designed on the built-in MemoryStream per SURVEY §2.2). Rows are
    * collected to the driver — TEST fixture scale only, exactly like the
    * reference's mock source.
    */
  private def mockStream(ctx: ScriptContext, table: String,
                         opts: Map[String, String]): DataFrame = {
    val spark = ctx.spark
    val batch = spark.table(table)
    implicit val enc = Encoders.row(batch.schema)
    implicit val sql = spark.sqlContext
    val ms = MemoryStream[Row]
    val rows = batch.collect().toSeq
    val stepSize = opts.get("stepSize").map(_.toInt).getOrElse(rows.size.max(1))
    rows.grouped(stepSize).foreach(chunk => ms.addData(chunk))
    ms.toDF()
  }
}

/** Streaming sink contract for `save` on a streaming table (reference:
  * MLSQLBaseStreamSource.scala:43-88): requires `mode` (append/complete/
  * update) and `checkpointLocation`; `duration` (seconds) sets a
  * ProcessingTime trigger (-1 = continuous availability default);
  * the query is named by `set streamName="..."`.
  */
object StreamSinks {

  def start(ctx: ScriptContext, df: DataFrame, format: String, path: String,
            opts: Map[String, String], partitionBy: Seq[String]): StreamingQuery = {
    val outputMode = opts.getOrElse("mode",
      throw new IllegalArgumentException(
        "streaming save requires mode=\"append|complete|update\""))
    val checkpoint = opts.getOrElse("checkpointLocation",
      throw new IllegalArgumentException("streaming save requires checkpointLocation"))
    val name = ctx.streamName.getOrElse(
      throw new IllegalArgumentException(
        "streaming scripts require `set streamName=\"...\"` before save"))
    // lifecycle events (started/progress/terminated) recorded to the
    // _mlsql_.streamEvents system table; attach BEFORE the query starts
    StreamEventLog.install(ctx.spark)
    val fmt = format.toLowerCase match {
      case "streamparquet" => "parquet"
      case "streamcsv" => "csv"
      case "streamjson" => "json"
      case other => other
    }
    val w0 = df.writeStream
      .format(fmt)
      .outputMode(outputMode)
      .queryName(name)
      .options(opts - "mode" - "duration" - "checkpointLocation")
      .option("checkpointLocation", ctx.resolvePath(checkpoint))
    val w1 = if (partitionBy.nonEmpty) w0.partitionBy(partitionBy: _*) else w0
    val w2 = opts.get("duration") match {
      case Some(d) if d.toLong >= 0 => w1.trigger(Trigger.ProcessingTime(d.toLong * 1000))
      case _ => w1
    }
    val query = fmt match {
      case "streamjdbc" =>
        // streaming JDBC sink (reference: MLSQLStreamJDBC.scala +
        // spark-3.0.0-adaptor/.../streaming/jdbc.scala): each micro-batch
        // is written through the batch JDBC path — plain append, or a
        // keyed upsert when `idCol` is set (graft.sources.JdbcUpsert).
        // Requires a JDBC driver jar at runtime; option plumbing is the
        // same as the batch jdbc sink.
        val jdbcOpts = new graft.sources.JdbcSource()
          .resolveOptions(path, opts - "mode" - "duration" - "checkpointLocation", ctx.pathPrefix)
        w2.foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          if (jdbcOpts.contains("idCol")) graft.sources.JdbcUpsert.upsert(batch.toDF(), jdbcOpts)
          else batch.write.format("jdbc").mode("append").options(jdbcOpts).save()
        }.start()
      case "upsertparquet" =>
        // CDC-style keyed upsert (reference: MLSQLMultiDelta.scala:33-120 —
        // foreachBatch routing rows into a Delta MERGE by idCols). Two
        // merge layouts:
        //  - default: delegate to the transactional vparquet MERGE
        //    (manifest-committed snapshots, exactly-once via the batchId
        //    txn marker, time travel). numBuckets defaults to 64 so each
        //    micro-batch rewrites only the hash buckets its keys touch —
        //    O(|batch| × table/N) per batch, never O(table). Read the
        //    target back with `load vparquet.`path`` (same relationship the
        //    reference has between its CDC sink and `load delta.`).
        //  - layout="plain": bucket-partitioned bare-parquet directory
        //    (readable by any plain `spark.read.parquet`); requires
        //    numBuckets because the unbucketed variant of this layout was
        //    an O(table)-per-batch read-modify-swap — a scale-killer with
        //    a non-atomic commit, deliberately not offered.
        val idCols = opts.getOrElse("idCols",
          throw new IllegalArgumentException("upsertParquet requires idCols=\"k1[,k2]\""))
          .split(",").map(_.trim).toSeq
        val target = ctx.resolvePath(path)
        val orderCol = opts.get("orderCol")
        val numBuckets = opts.get("numBuckets").map(_.toInt)
        opts.getOrElse("layout", "vparquet").toLowerCase match {
          case "plain" =>
            val n = numBuckets.getOrElse(throw new IllegalArgumentException(
              "upsertParquet layout=\"plain\" requires numBuckets=\"N\" — the " +
                "unbucketed plain layout rewrites the whole table per batch; " +
                "omit layout to get the transactional vparquet merge instead"))
            w2.foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
              UpsertParquet.mergeBucketed(batch, target, idCols, n, orderCol)
            }.start()
          case "vparquet" =>
            // txn is scoped by the checkpoint location: batch ids restart
            // at 0 per query, so the writer identity must be part of the
            // idempotence key (Delta's txnAppId/txnVersion contract)
            val appId = ctx.resolvePath(checkpoint)
            opts.get("tableCol") match {
              case Some(tc) =>
                // multi-table routing: `path` is a base directory and each
                // row's tableCol value picks the vparquet table under it
                w2.foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
                  UpsertParquet.routeMerge(batch.toDF(), target, tc, idCols,
                    numBuckets, orderCol, batchId, appId)
                }.start()
              case None =>
                w2.foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
                  // bucket-count default, resolved per batch: an explicit
                  // numBuckets wins (a mismatch with the table's recorded
                  // layout is a loud error in the merge); otherwise adopt the
                  // existing table's bucket count, or 64 on a fresh table
                  val spark = batch.sparkSession
                  val n = UpsertParquet.resolveBuckets(spark, target, numBuckets)
                  graft.sources.VParquet.merge(batch.toDF(), target, idCols, Some(n),
                    orderCol, txn = Some(batchId), txnAppId = Some(appId))
                  ()
                }.start()
            }
          case other => throw new IllegalArgumentException(
            s"upsertParquet layout must be vparquet|plain, got '$other'")
        }
      case "vparquet" =>
        // transactional analog of the upsertParquet sink: each micro-batch
        // is one atomic manifest commit (merge when idCols given, append
        // otherwise), so a batch reader mid-stream always sees a complete
        // snapshot — the stream→table→batch bridge the reference runs
        // through Delta (StreamSubBatchQuerySuite.scala:30-45)
        val target = ctx.resolvePath(path)
        val mergeKeys = opts.get("idCols").map(_.split(",").map(_.trim).toSeq)
        val orderC = opts.get("orderCol")
        val nBuckets = opts.get("numBuckets").map(_.toInt)
        // (checkpoint, batchId) is recorded in each committed manifest so
        // an at-least-once re-delivery (crash between manifest commit and
        // checkpoint offset commit) is recognized and skipped — the sink
        // is exactly-once end to end. The checkpoint scopes the marker:
        // batch ids restart at 0 for every new query.
        val appId = Some(ctx.resolvePath(checkpoint))
        // autoCompactEvery="N": every N committed versions, fold the
        // accumulated per-batch files back down (merges add files to their
        // touched buckets forever otherwise — the operational small-file
        // decay of every CDC sink). Runs inline in foreachBatch, so it
        // shares the stream's exactly-once commit path; a compact commit
        // is itself one atomic version.
        val compactEvery = opts.get("autoCompactEvery").map(_.toLong)
        require(compactEvery.forall(_ >= 1), "autoCompactEvery must be >= 1")
        w2.foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
          mergeKeys match {
            case Some(ks) =>
              graft.sources.VParquet.merge(batch.toDF(), target, ks, nBuckets,
                orderC, txn = Some(batchId), txnAppId = appId)
            case None =>
              graft.sources.VParquet.write(batch.toDF(), target,
                overwrite = false, txn = Some(batchId), txnAppId = appId)
          }
          val spark = batch.sparkSession
          compactEvery.foreach { n =>
            graft.sources.VParquet.latestVersion(spark, target).foreach { v =>
              if (v > 0 && (v + 1) % n == 0 &&
                  graft.sources.VParquet.readManifest(spark, target, v).op != "compact")
                graft.sources.VParquet.compact(spark, target, targetFileSizeMB = 128)
            }
          }
          ()
        }.start()
      case f if Set("parquet", "csv", "json", "text", "orc").contains(f) =>
        w2.start(ctx.resolvePath(path))
      case _ => w2.start()
    }
    ctx.streams(name) = query
    query
  }
}

/** Keyed parquet upsert used by the `upsertParquet` streaming sink. */
object UpsertParquet {

  /** Explicit numBuckets wins; otherwise adopt the target table's
    * recorded bucket count, or 64 on a fresh table.
    */
  private[streaming] def resolveBuckets(spark: org.apache.spark.sql.SparkSession,
                                        target: String,
                                        numBuckets: Option[Int]): Int =
    numBuckets.orElse(
      graft.sources.VParquet.latestVersion(spark, target)
        .map(v => graft.sources.VParquet.readManifest(spark, target, v).numBuckets)
        .filter(_ > 0)).getOrElse(64)

  /** Multi-table CDC routing (reference: MLSQLMultiDelta.scala:56-120 —
    * one stream's rows fan out into several Delta tables by their
    * db/table columns inside a single foreachBatch). Here each row's
    * `tableCol` value picks a vparquet table under `base`; every routed
    * target gets ONE transactional merge per micro-batch, idempotent per
    * (target, txnAppId, batchId). A crash between two targets' commits
    * re-delivers the whole batch: the already-committed target sees its
    * txn marker and no-ops while the lagging one catches up — so the
    * sink stays exactly-once PER TABLE even though targets commit
    * sequentially. Route values become directory names and are
    * validated against a conservative charset (no separators, no `..`).
    */
  def routeMerge(batch: org.apache.spark.sql.DataFrame, base: String,
                 tableCol: String, idCols: Seq[String],
                 numBuckets: Option[Int], orderCol: Option[String],
                 batchId: Long, appId: String): Unit = {
    import org.apache.spark.sql.functions._
    val spark = batch.sparkSession
    require(batch.columns.contains(tableCol),
      s"tableCol '$tableCol' not in stream schema ${batch.columns.mkString(",")}")
    // reused once per routed target — cache the micro-batch, not the source
    val cached = batch.persist()
    try {
      val names = cached.select(col(tableCol).cast("string")).distinct()
        .collect().map(_.getString(0)).sorted
      names.foreach { n =>
        require(n != null, s"tableCol '$tableCol' holds a null route value")
        require(n.matches("[A-Za-z0-9_][A-Za-z0-9_.-]*"),
          s"tableCol value '$n' is not a safe table name")
      }
      names.foreach { name =>
        val sub = cached.filter(col(tableCol).cast("string") === name).drop(tableCol)
        val tgt = base.stripSuffix("/") + "/" + name
        graft.sources.VParquet.merge(sub, tgt, idCols,
          Some(resolveBuckets(spark, tgt, numBuckets)), orderCol,
          txn = Some(batchId), txnAppId = Some(appId))
      }
    } finally cached.unpersist(false)
    ()
  }

  /** Bucket-partitioned merge: the target lives as
    * `target/__bucket__=k/` (k = pmod(xxhash64(keys), n)), and a batch
    * touches only the partitions its keys hash into — read those with
    * partition pruning, anti-join + union, overwrite JUST those partitions
    * via dynamic partition overwrite. Per-batch cost is proportional to
    * |touched buckets| × bucket size, not table size. Readers see an extra
    * `__bucket__` column (drop it, or treat it as the physical layout it
    * is). Not transactional — a crash mid-commit can leave a partition
    * replaced and another not; Delta MERGE is the transactional upgrade.
    */
  def mergeBucketed(batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                    target: String, idCols: Seq[String], numBuckets: Int,
                    orderCol: Option[String] = None): Unit = {
    import org.apache.spark.sql.functions._
    val spark = batch.sparkSession
    val fs = new org.apache.hadoop.fs.Path(target)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // the bucket count is part of the PHYSICAL layout: rows are located by
    // pmod(hash, n), so merging with a different n would silently duplicate
    // keys (old row never read). A marker file pins it; mismatch is a hard
    // error telling the user to compact/rewrite.
    val marker = new org.apache.hadoop.fs.Path(target + "/_graft_buckets")
    if (fs.exists(marker)) {
      val in = fs.open(marker)
      val stored = try scala.io.Source.fromInputStream(in).mkString.trim finally in.close()
      require(stored == numBuckets.toString,
        s"upsertParquet target $target was written with numBuckets=$stored; " +
          s"cannot merge with numBuckets=$numBuckets — rewrite the target first")
    }
    val bucket = pmod(xxhash64(idCols.map(col): _*), lit(numBuckets)).cast("int")
    val deduped = newestPerKey(batch.toDF(), idCols, orderCol)
      .withColumn("__bucket__", bucket)
      // reused three times per batch (touched-bucket collect, anti-join
      // probe, union/write) — one computation, not three
      .persist()
    try {
      // fs-based existence probe: a transient READ failure must propagate,
      // not be mistaken for "table absent" (which would replace every
      // touched bucket with batch-only rows); an empty/_SUCCESS-only dir
      // still counts as absent. Also rejects a non-bucketed layout loudly.
      val current0 =
        if (hasParquetData(fs, target)) Some(spark.read.parquet(target)) else None
      current0.foreach(c => require(c.columns.contains("__bucket__"),
        s"upsertParquet target $target holds a non-bucketed layout; " +
          "remove numBuckets or rewrite the target"))
      val merged = current0 match {
        case None => deduped
        case Some(current) =>
          val touched = deduped.select("__bucket__").distinct()
            .collect().map(_.getInt(0))
          current.filter(col("__bucket__").isin(touched.map(Integer.valueOf).toSeq: _*))
            .join(deduped.select(idCols.map(col): _*), idCols, "left_anti")
            .unionByName(deduped)
      }
      // per-writer option (NOT the session conf, which would race with
      // concurrent foreachBatch sinks on the same session): only the
      // touched partitions are replaced
      merged.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("__bucket__").parquet(target)
      if (!fs.exists(marker)) {
        val out = fs.create(marker, true)
        try out.write(numBuckets.toString.getBytes("UTF-8")) finally out.close()
      }
    } finally deduped.unpersist(false)
  }

  /** Within-batch winner per key: by `orderCol` descending when given
    * (e.g. a binlog offset / event timestamp — the reliable CDC ordering);
    * without it, falls back to monotonically_increasing_id, which orders
    * by Spark partition index — fine for single-partition test batches,
    * NOT a cross-partition arrival order. Always set orderCol in real CDC.
    */
  private[graft] def newestPerKey(batch: org.apache.spark.sql.DataFrame,
                                  idCols: Seq[String],
                                  orderCol: Option[String]): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val ord = orderCol.map(col).getOrElse(monotonically_increasing_id())
    batch
      .withColumn("__ord__", ord)
      .withColumn("__max__", max(col("__ord__")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(idCols.map(col): _*)))
      .filter(col("__ord__") === col("__max__")).drop("__ord__", "__max__")
      .dropDuplicates(idCols)
  }

  /** True iff the dir exists and holds at least one parquet data file —
    * an fs-level probe, so a transient read error propagates instead of
    * being mistaken for "table absent" (which would silently truncate the
    * accumulated upsert target to the current batch).
    */
  private def hasParquetData(fs: org.apache.hadoop.fs.FileSystem,
                             target: String): Boolean = {
    val tp = new org.apache.hadoop.fs.Path(target)
    if (!fs.exists(tp)) return false
    val it = fs.listFiles(tp, /*recursive=*/ true)
    while (it.hasNext) {
      if (it.next().getPath.getName.endsWith(".parquet")) return true
    }
    false
  }

}
