package graft.sources

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Manifest-level file skipping: stats harvested at commit, files pruned
  * from the query's data filters before task planning.
  */
class DataSkippingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/t"

  private def scanOf(df: org.apache.spark.sql.DataFrame): FileSourceScanExec = {
    def find(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => find(a.executedPlan)
      case f: FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(find)
    }
    find(df.queryExecution.executedPlan).head
  }

  private def numFilesScanned(df: org.apache.spark.sql.DataFrame): Long = {
    df.collect() // execute so metrics are populated
    scanOf(df).metrics("numFiles").value
  }

  // ---- unit-level: mayContain on hand-built stats ----

  private val stats = DataSkipping.FileStats(
    numRecords = 100L,
    minValues = Map("k" -> "10", "s" -> "delta"),
    maxValues = Map("k" -> "20", "s" -> "kafka"),
    nullCounts = Map("k" -> 0L, "s" -> 5L))
  private val k = AttributeReference("k", LongType)()
  private val s = AttributeReference("s", StringType)()

  test("mayContain: numeric range proofs prune, unknowns keep") {
    assert(!DataSkipping.mayContain(stats, EqualTo(k, Literal(9L))))
    assert(DataSkipping.mayContain(stats, EqualTo(k, Literal(10L))))
    assert(DataSkipping.mayContain(stats, EqualTo(k, Literal(15L))))
    assert(!DataSkipping.mayContain(stats, EqualTo(k, Literal(21L))))
    assert(!DataSkipping.mayContain(stats, GreaterThan(k, Literal(20L))))
    assert(DataSkipping.mayContain(stats, GreaterThanOrEqual(k, Literal(20L))))
    assert(!DataSkipping.mayContain(stats, LessThan(k, Literal(10L))))
    // reversed operand order: 15 < k means k > 15 → satisfiable
    assert(DataSkipping.mayContain(stats, LessThan(Literal(15L), k)))
    assert(!DataSkipping.mayContain(stats, LessThan(Literal(20L), k)))
    // a column with no recorded stats never proves anything
    val z = AttributeReference("z", LongType)()
    assert(DataSkipping.mayContain(stats, EqualTo(z, Literal(123L))))
  }

  test("mayContain: And/Or/In/IsNull compose; strings compare lexically") {
    assert(!DataSkipping.mayContain(stats,
      And(EqualTo(k, Literal(15L)), EqualTo(k, Literal(25L)))))
    assert(DataSkipping.mayContain(stats,
      Or(EqualTo(k, Literal(25L)), EqualTo(k, Literal(15L)))))
    assert(!DataSkipping.mayContain(stats,
      In(k, Seq(Literal(1L), Literal(2L)))))
    assert(DataSkipping.mayContain(stats,
      In(k, Seq(Literal(1L), Literal(12L)))))
    assert(DataSkipping.mayContain(stats, IsNull(s)))
    assert(!DataSkipping.mayContain(stats, IsNull(k)))
    assert(DataSkipping.mayContain(stats, IsNotNull(k)))
    // != prunes only constant files
    assert(DataSkipping.mayContain(stats, Not(EqualTo(k, Literal(15L)))))
    val const = DataSkipping.FileStats(10L,
      Map("k" -> "7"), Map("k" -> "7"), Map("k" -> 3L))
    assert(!DataSkipping.mayContain(const, Not(EqualTo(k, Literal(7L)))))
    assert(DataSkipping.mayContain(const, Not(EqualTo(k, Literal(8L)))))
    import org.apache.spark.unsafe.types.UTF8String
    assert(!DataSkipping.mayContain(stats,
      EqualTo(s, Literal(UTF8String.fromString("zzz"), StringType))))
    assert(DataSkipping.mayContain(stats,
      EqualTo(s, Literal(UTF8String.fromString("hive"), StringType))))
    assert(!DataSkipping.mayContain(stats,
      StartsWith(s, Literal(UTF8String.fromString("zz"), StringType))))
    assert(DataSkipping.mayContain(stats,
      StartsWith(s, Literal(UTF8String.fromString("ka"), StringType))))
    // prefix shorter than min but covering the range
    assert(DataSkipping.mayContain(stats,
      StartsWith(s, Literal(UTF8String.fromString("d"), StringType))))
  }

  // ---- end-to-end through commit + read ----

  test("selective filter scans only matching files; results unchanged") {
    val t = tmp("vp_skip")
    import spark.implicits._
    // 4 files with disjoint k ranges (range partitioning sorts per file)
    val df = (0L until 400L).map(i => (i, s"name$i")).toDF("k", "v")
      .repartitionByRange(4, $"k")
    VParquet.write(df, t, overwrite = true)
    val m = VParquet.readManifest(spark, t, 0)
    assert(m.files.size == 4)
    assert(m.files.forall(_.size > 0))
    assert(m.files.forall(_.stats.exists(st =>
      st.minValues.contains("k") && st.maxValues.contains("k"))))
    assert(m.schemaJson.isDefined)

    val point = VParquet.loadVersion(spark, t, None, None).filter($"k" === 250L)
    assert(numFilesScanned(point) == 1L, "point lookup must scan one file")
    assert(point.select("v").head().getString(0) == "name250")

    // expected file count from the recorded ranges themselves: range
    // partitioning samples boundaries, so [150, 350) may straddle 2 or 3
    // of the 4 files — what matters is scan == overlap, not a guess
    val overlapping = m.files.count(_.stats.exists(st =>
      st.minValues("k").toLong < 350L && st.maxValues("k").toLong >= 150L))
    assert(overlapping < 4, "fixture: the range must not cover every file")
    val range = VParquet.loadVersion(spark, t, None, None)
      .filter($"k" >= 150L && $"k" < 350L)
    assert(numFilesScanned(range) == overlapping.toLong,
      s"range filter must scan exactly the $overlapping overlapping files")
    assert(range.count() == 200L)

    // no filter → all files, all rows
    val full = VParquet.loadVersion(spark, t, None, None)
    assert(numFilesScanned(full) == 4L)
    assert(full.count() == 400L)

    // string stats prune too
    val sPoint = VParquet.loadVersion(spark, t, None, None)
      .filter($"v" === "name250")
    assert(numFilesScanned(sPoint) <= 4L) // names aren't range-clustered
    assert(sPoint.count() == 1L)
  }

  test("non-ASCII string stats are dropped, file is kept (no wrong prune)") {
    val t = tmp("vp_skip_utf")
    import spark.implicits._
    val df = Seq((1L, "café"), (2L, "zzü")).toDF("k", "v").coalesce(1)
    VParquet.write(df, t, overwrite = true)
    val m = VParquet.readManifest(spark, t, 0)
    assert(m.files.head.stats.exists(st => !st.minValues.contains("v")),
      "non-ASCII min/max must not be recorded")
    // the filter still works (file read, filter applied by Catalyst)
    val out = VParquet.loadVersion(spark, t, None, None).filter($"v" === "café")
    assert(out.count() == 1L)
  }

  test("null-count stats prove IS NULL empty; nulls survive reads") {
    val t = tmp("vp_skip_null")
    import spark.implicits._
    val noNulls = (0 until 10).map(i => (i.toLong, Some(s"v$i"))).toDF("k", "v")
      .coalesce(1)
    VParquet.write(noNulls, t, overwrite = true)
    val q = VParquet.loadVersion(spark, t, None, None).filter($"v".isNull)
    assert(numFilesScanned(q) == 0L, "a file with zero nulls cannot satisfy IS NULL")
    assert(q.count() == 0L)
  }

  test("legacy manifests without size/stats still read (fallback path)") {
    val t = tmp("vp_skip_legacy")
    import spark.implicits._
    VParquet.write((0 until 20).map(i => (i.toLong, s"v$i")).toDF("k", "v"), t,
      overwrite = true)
    val m = VParquet.readManifest(spark, t, 0)
    // strip the new fields, as a pre-skipping writer would have produced
    val stripped = m.copy(version = 1, files = m.files.map(_.copy(size = 0L, stats = None)),
      schemaJson = None)
    VParquet.writeManifest(spark, t, stripped)
    val df = VParquet.loadVersion(spark, t, Some(1L), None)
    assert(df.count() == 20L)
    assert(df.filter($"k" === 3L).count() == 1L)
  }

  test("clusterBy write makes point filters single-file through the DSL") {
    val t = tmp("vp_cluster")
    import spark.implicits._
    (0L until 400L).map(i => (i, s"v$i")).toDF("k", "v")
      .createOrReplaceTempView("cl_in")
    graft.dsl.ScriptRunner.runToDF(
      s"""select * from cl_in as cl_src;
         |save overwrite cl_src as vparquet.`$t` where clusterBy="k" and fileNum="4";
         |""".stripMargin, spark)
    val m = VParquet.readManifest(spark, t, 0)
    assert(m.files.size == 4)
    // clustered ranges are DISJOINT → any point filter hits exactly 1 file
    val q = VParquet.loadVersion(spark, t, None, None).filter($"k" === 321L)
    assert(numFilesScanned(q) == 1L)
    assert(q.head().getString(1) == "v321")
  }

  test("zorder compact: filters on EITHER column skip files") {
    val t = tmp("vp_zorder")
    import spark.implicits._
    // 256x256 grid with a high-entropy payload (so the table exceeds one
    // 1MB target file), written in a skip-hostile layout: shuffled, every
    // file spans the full domain of both columns
    val grid = spark.range(256L * 256L).select(
      (col("id") / 256L).cast("long").as("x"),
      pmod(col("id"), lit(256L)).as("y"),
      sha2(col("id").cast("string"), 256).as("payload"))
    VParquet.write(grid.orderBy(rand(42)).repartition(8), t, overwrite = true)
    val before = VParquet.loadVersion(spark, t, None, None).filter($"x" === 7L)
    assert(numFilesScanned(before) == 8L, "shuffled layout must not prune")

    // OPTIMIZE ZORDER BY (x, y) via the DSL command
    val res = graft.dsl.ScriptRunner.runToDF(
      s"!vtable zorder $t 1 x,y;", spark).collect()
    assert(res.head.getString(0) == "1")
    val m = VParquet.readManifest(spark, t, 1)
    assert(m.op == "compact" && m.files.size > 1)

    def scanned(c: String, v: Long): Long = {
      val q = VParquet.loadVersion(spark, t, None, None).filter(col(c) === v)
      val n = numFilesScanned(q)
      assert(q.count() == 256L, s"$c=$v must still return a full grid line")
      n
    }
    val total = m.files.size.toLong
    assert(scanned("x", 7L) < total, "x filter must skip files after zorder")
    assert(scanned("y", 42L) < total, "y filter must skip files after zorder")
    // and the change feed ignores the rewrite (no data changed)
    assert(VParquet.loadChanges(spark, t, 0, 1)
      .select("_commit_version").distinct().collect().map(_.getLong(0)).toSeq == Seq(0L))
  }

  test("metadata-only COUNT/MIN/MAX: answered from the manifest, no scan") {
    val t = tmp("vp_metaagg")
    import spark.implicits._
    val rows = (0L until 300L).map(i =>
      (i, if (i % 3 == 0) null else f"s$i%03d"))
    VParquet.write(rows.toDF("k", "v").repartition(4), t, overwrite = true)

    val snap = VParquet.loadVersion(spark, t, None, None)
    val agg = snap.agg(
      count(lit(1)).as("n"), count($"v").as("nv"),
      min($"k").as("mnk"), max($"k").as("mxk"),
      min($"v").as("mnv"), max($"v").as("mxv"))
    // the optimized plan must be a bare LocalRelation — no scan at all
    val opt = agg.queryExecution.optimizedPlan.toString
    assert(opt.trim.startsWith("LocalRelation") && !opt.contains("parquet"),
      s"expected metadata-only plan, got:\n$opt")
    val r = agg.head()
    assert(r.getLong(0) == 300L)
    assert(r.getLong(1) == 200L) // every third v is null
    assert(r.getLong(2) == 0L && r.getLong(3) == 299L)
    assert(r.getString(4) == "s001" && r.getString(5) == "s299")

    // df.count() itself takes the metadata path
    assert(snap.count() == 300L)

    // a filter blocks the rewrite: normal (pruned) scan, correct result
    val filtered = snap.filter($"k" >= 100L).agg(count(lit(1)).as("n"))
    assert(filtered.queryExecution.optimizedPlan.toString.contains("parquet"),
      "filtered aggregate must scan")
    assert(filtered.head().getLong(0) == 200L)

    // an unanswerable function blocks the rewrite and stays correct
    val avg = snap.agg(org.apache.spark.sql.functions.avg($"k").as("a"))
    assert(avg.queryExecution.optimizedPlan.toString.contains("parquet"))
    assert(avg.head().getDouble(0) == 149.5)
  }

  test("mergeSchema append evolves the table; old files read as null") {
    val t = tmp("vp_evolve")
    import spark.implicits._
    VParquet.write(Seq((1L, "a")).toDF("k", "v"), t, overwrite = true)
    // strict by default: a widened batch is rejected loudly
    val e = intercept[IllegalArgumentException] {
      VParquet.write(Seq((2L, "b", 9L)).toDF("k", "v", "extra"), t, overwrite = false)
    }
    assert(e.getMessage.contains("mergeSchema"))
    // same-name different-type is NEVER mergeable
    val e2 = intercept[IllegalArgumentException] {
      VParquet.write(Seq((3L, 42)).toDF("k", "v"), t, overwrite = false,
        mergeSchema = true)
    }
    assert(e2.getMessage.contains("type") || e2.getMessage.contains("int"))
    // with mergeSchema through the DSL: union schema, old rows null-filled
    Seq((2L, "b", 9L)).toDF("k", "v", "extra").createOrReplaceTempView("ev_in")
    graft.dsl.ScriptRunner.runToDF(
      s"""select * from ev_in as ev_src;
         |save append ev_src as vparquet.`$t` where mergeSchema="true";""".stripMargin,
      spark)
    val out = VParquet.loadVersion(spark, t, None, None).orderBy("k").collect()
    assert(out.map(r => (r.getLong(0), r.getString(1))).toSeq == Seq(1L -> "a", 2L -> "b"))
    assert(out(0).isNullAt(2) && out(1).getLong(2) == 9L)
    // a narrower batch (missing the new column) also needs mergeSchema,
    // then reads back null for it
    VParquet.write(Seq((3L, "c")).toDF("k", "v"), t, overwrite = false,
      mergeSchema = true)
    val out2 = VParquet.loadVersion(spark, t, None, None).orderBy("k").collect()
    assert(out2.length == 3 && out2(2).isNullAt(2))
  }

  test("action=detail exposes per-file stats through the DSL") {
    val t = tmp("vp_detail")
    import spark.implicits._
    VParquet.write((0L until 100L).map(i => (i, s"v$i")).toDF("k", "v")
      .repartitionByRange(2, $"k"), t, overwrite = true)
    val d = graft.dsl.ScriptRunner.runToDF(
      s"""load vparquet.`$t` where action="detail" as dt;
         |select * from dt as out;""".stripMargin, spark)
    val rows = d.collect()
    assert(rows.length == 2)
    assert(rows.forall(_.getAs[Long]("num_rows") == 50L))
    assert(rows.forall(r => r.getAs[String]("min_values").contains("\"k\"")))
  }

  test("selective compaction: right-sized files carry forward by reference") {
    val t = tmp("vp_selcompact")
    import spark.implicits._
    // one ~1.3MB file (above half the 1MB target → kept) + 3 tiny appends
    val big = spark.range(20000).select($"id".as("k"),
      sha2($"id".cast("string"), 256).as("v")).coalesce(1)
    VParquet.write(big, t, overwrite = true)
    val bigPath = VParquet.readManifest(spark, t, 0).files.head.path
    (0 until 3).foreach { i =>
      VParquet.write(Seq((100000L + i, s"t$i")).toDF("k", "v"), t, overwrite = false)
    }
    val v = VParquet.compact(spark, t, targetFileSizeMB = 1)
    val after = VParquet.readManifest(spark, t, v)
    assert(after.files.map(_.path).contains(bigPath),
      "the right-sized file must be carried by reference, not rewritten")
    assert(after.files.size == 2, s"3 tiny files fold into 1: ${after.files.size}")
    assert(VParquet.loadVersion(spark, t, None, None).count() == 20003L)
    // compacting again: nothing under half-target left → no empty commit
    assert(VParquet.compact(spark, t, targetFileSizeMB = 1) == v)
  }

  test("compact survives a concurrent append (rebase); no data lost") {
    val t = tmp("vp_compact_race")
    import spark.implicits._
    (0 until 4).foreach { i =>
      VParquet.write(Seq((i.toLong, s"r$i")).toDF("k", "v"), t, overwrite = false)
    }
    import scala.concurrent.{Await, Future, blocking}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration._
    val fc = Future(blocking(VParquet.compact(spark, t, targetFileSizeMB = 128)))
    // the appender retries on a lost claim (the documented contract for
    // non-merge writers); the compactor must REBASE around it
    def appendWithRetry(tries: Int = 20): Long =
      try VParquet.write(Seq((99L, "late")).toDF("k", "v"), t, overwrite = false)
      catch {
        case _: VParquet.ConcurrentWriteException if tries > 0 =>
          Thread.sleep(50); appendWithRetry(tries - 1)
      }
    val va = appendWithRetry()
    val vc = Await.result(fc, 180.seconds)
    assert(va != vc, "append and compact must land as distinct versions")
    // invariant under ANY interleaving: nothing lost, both commits present
    val cur = VParquet.loadVersion(spark, t, None, None)
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(cur == Map(0L -> "r0", 1L -> "r1", 2L -> "r2", 3L -> "r3", 99L -> "late"))
    val ops = VParquet.history(spark, t).collect().map(_.getString(1)).toSeq
    assert(ops.count(_ == "compact") == 1 && ops.count(_ == "append") == 5)
  }

  test("filtered change-feed read prunes per version") {
    val t = tmp("vp_skip_cdc")
    import spark.implicits._
    VParquet.write((0L until 100L).map(i => (i, "a")).toDF("k", "v")
      .repartitionByRange(2, $"k"), t, overwrite = true)
    VParquet.write((100L until 200L).map(i => (i, "b")).toDF("k", "v")
      .repartitionByRange(2, $"k"), t, overwrite = false)
    val changes = VParquet.loadChanges(spark, t, 0, 1).filter($"k" === 150L)
    assert(changes.select("_commit_version").head().getLong(0) == 1L)
    // 4 files total across versions; the filter reaches both unioned scans
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case f: FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(scans)
    }
    changes.collect()
    val scanned = scans(changes.queryExecution.executedPlan)
      .map(_.metrics("numFiles").value).sum
    assert(scanned == 1L, s"expected 1 file scanned across versions, got $scanned")
  }
}
