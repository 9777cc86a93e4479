package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.dsl.ScriptRunner
import graft.operators.scale.Skew

/** Scale-machinery audits: salting correctness + bucketed co-located joins
  * (the 100 TB design levers the builder prompt names explicitly).
  */
class ScaleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("saltedJoin matches the plain join result") {
    import spark.implicits._
    val big = (1 to 1000).map(i => (i % 3, i)).toDF("k", "v") // 3 hot keys
    val small = Seq((0, "a"), (1, "b"), (2, "c")).toDF("k", "name")
    val plain = big.join(small, Seq("k")).select("k", "v", "name")
      .collect().map(_.toString).sorted.toSeq
    val salted = Skew.saltedJoin(big, small, Seq("k"), saltFactor = 8)
      .select("k", "v", "name").collect().map(_.toString).sorted.toSeq
    assert(salted == plain)
  }

  test("saltedSum matches the plain aggregation") {
    import spark.implicits._
    val df = (1 to 1000).map(i => (i % 2, i.toDouble)).toDF("k", "x")
    val plain = df.groupBy("k").sum("x").collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val salted = Skew.saltedSum(df, Seq("k"), "x", saltFactor = 8).collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(salted == plain)
  }

  test("bloomFilteredJoin matches the plain join result (long and string keys)") {
    import spark.implicits._
    val big = (1 to 5000).map(i => (i.toLong % 500, s"k${i % 500}", i)).toDF("id", "sid", "v")
    val small = Seq((3L, "k3", "x"), (7L, "k7", "y"), (999L, "k999", "z"))
      .toDF("id", "sid", "name")
    val plain = big.join(small.select("id", "name"), Seq("id"))
      .collect().map(_.toString).sorted.toSeq
    val bloomed = Skew.bloomFilteredJoin(big, small.select("id", "name"), "id")
      .collect().map(_.toString).sorted.toSeq
    assert(bloomed == plain && bloomed.nonEmpty)
    val plainS = big.join(small.select("sid", "name"), Seq("sid"))
      .collect().map(_.toString).sorted.toSeq
    val bloomedS = Skew.bloomFilteredJoin(big, small.select("sid", "name"), "sid")
      .collect().map(_.toString).sorted.toSeq
    assert(bloomedS == plainS && bloomedS.nonEmpty)
    // left_semi keeps probe rows once
    val semi = Skew.bloomFilteredJoin(big, small.select("id", "name"), "id", "left_semi")
    assert(semi.columns.toSeq == Seq("id", "sid", "v"))
    assert(semi.count() == big.filter($"id".isin(3L, 7L)).count())
    intercept[IllegalArgumentException] {
      Skew.bloomFilteredJoin(big, small, "id", "full_outer")
    }
  }

  test("TableCompaction rewrites many small files into the target count") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_compact").toString + "/t"
    (1 to 2000).map(i => (i, s"row$i")).toDF("id", "s")
      .repartition(64).write.parquet(dir)
    val filesBefore = new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet"))
    assert(filesBefore == 64)
    val report = ScriptRunner.runToDF(
      s"""run command as TableCompaction.`$dir` where targetFileSizeMB="128" and sortBy="id";""",
      spark).head()
    assert(report.getString(1).toLong == 64) // files_before
    val filesAfter = new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet"))
    assert(filesAfter == 1, s"expected 1 compacted file, got $filesAfter")
    val back = spark.read.parquet(dir)
    assert(back.count() == 2000)
    assert(back.agg(org.apache.spark.sql.functions.sum("id")).head().getLong(0) == 2000L * 2001 / 2)
  }

  test("RateSampler strategy=exact fills per-label quotas to the row") {
    import spark.implicits._
    ((1 to 800).map(i => (i, "common")) ++ (1 to 40).map(i => (i + 1000, "rare")))
      .toDF("id", "lbl").createOrReplaceTempView("rs_exact_in")
    val out = ScriptRunner.runToDF(
      """run rs_exact_in as RateSampler.`` where strategy="exact" and labelCol="lbl"
        |  and sampleRate="0.8,0.2" and seed="7" as rs_exact;
        |select lbl, __split__, count(*) as n from rs_exact group by lbl, __split__ as out;""".stripMargin,
      spark)
    val counts = out.collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(counts(("common", 0)) == 640 && counts(("common", 1)) == 160)
    assert(counts(("rare", 0)) == 32 && counts(("rare", 1)) == 8)
  }

  test("Z-order clustering confines a box query to few files; rows preserved") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val data = (1 to 16384).map(_ => (rnd.nextInt(64), rnd.nextInt(64), rnd.nextLong()))
      .toDF("a", "b", "payload")
    val base = java.nio.file.Files.createTempDirectory("graft_z").toString
    // baseline layout: 16 arbitrary (round-robin) files
    data.repartition(16).write.parquet(s"$base/plain")
    graft.operators.scale.ZOrder.cluster(data, Seq("a", "b"), nOut = 16)
      .write.parquet(s"$base/zorder")
    def filesHit(dir: String): Long = spark.read.parquet(dir)
      .filter($"a" < 8 && $"b" < 8)
      .select(org.apache.spark.sql.functions.input_file_name()).distinct().count()
    val plainHit = filesHit(s"$base/plain")
    val zHit = filesHit(s"$base/zorder")
    // the corner box spreads over every round-robin file but clusters on
    // the z-curve; at 64x64 with 8-bit buckets the 8x8 corner is one
    // curve-contiguous region spanning at most a couple of range files
    assert(plainHit == 16, s"baseline expected to spread, hit $plainHit")
    assert(zHit <= 3, s"z-order expected <=3 files for the corner box, hit $zHit")
    val z = spark.read.parquet(s"$base/zorder")
    assert(z.count() == 16384)
    assert(z.agg(org.apache.spark.sql.functions.sum($"a".cast("long"))).head().getLong(0) ==
      data.agg(org.apache.spark.sql.functions.sum($"a".cast("long"))).head().getLong(0))
    // TableCompaction routes zorderBy through the same path
    val rep = ScriptRunner.runToDF(
      s"""run command as TableCompaction.`$base/plain` where targetFileSizeMB="1" and zorderBy="a,b";""",
      spark).head()
    assert(rep.getString(1).toLong == 16)
    assert(spark.read.parquet(s"$base/plain").count() == 16384)
  }

  test("GroupCap.capPerGroup handles 50k distinct groups without blowing up") {
    // per-domain caps mean high group cardinality; the joined-threshold
    // plan must stay O(1) expression depth where a literal when-chain
    // would hit analyzer/codegen limits long before 50k groups
    import org.apache.spark.sql.functions.{col, count, lit, max}
    val df = spark.range(200000).select(
      (col("id") % 50000).cast("string").as("g"), col("id").as("doc_id"))
    val out = graft.operators.sampling.GroupCap
      .capPerGroup(df, "g", cap = 2, idCol = "doc_id")
    // 4 rows per group, cap 2 -> exactly 2 survivors in each of 50k groups
    assert(out.count() == 100000L)
    assert(out.groupBy("g").agg(count(lit(1)).as("n"))
      .agg(max(col("n"))).head().getLong(0) == 2L)
  }

  test("ImportanceSelect scores 100k rows against a 65536-bucket model; " +
       "ClusterSample assigns against 500 centroids — no analyzer/codegen blowup") {
    import org.apache.spark.sql.functions.col
    // model-sized literals must stay single objects: a 64k-double array
    // and a 500×16-double centroid set are the contract's upper range
    val lr = Array.tabulate(65536)(i => (i % 7 - 3) * 0.01)
    val docs = spark.range(100000).select(col("id").as("doc_id"),
      org.apache.spark.sql.functions.concat_ws(" ",
        (col("id") % 997).cast("string"), (col("id") % 89).cast("string"),
        (col("id") % 11).cast("string")).as("text"))
    val scored = graft.operators.sampling.ImportanceSelect
      .score(docs, "doc_id", "text", lr, buckets = 65536)
    assert(scored.count() == 100000L)
    import spark.implicits._
    val vecs = spark.range(20000).map { i =>
      (i, Array.tabulate(16)(d => math.sin(i * 31 + d).toFloat).toSeq)
    }.toDF("vec_id", "embedding")
    val cents = vecs.filter(col("vec_id") % 40 === 0)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
    val assigned = graft.operators.sampling.ClusterSample
      .assign(vecs, "vec_id", "embedding", cents, "cid", "cv")
    assert(assigned.count() == 20000L)
    assert(assigned.select("cluster").distinct().count() > 100L)
  }

  test("ClusterSample assigns against 2048 centroids — still one zero-shuffle map pass") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val vecs = spark.range(20000).map { i =>
      (i, Array.tabulate(8)(d => math.sin(i * 17 + d).toFloat).toSeq)
    }.toDF("vec_id", "embedding")
    val cents = spark.range(2048).map { i =>
      (i, Array.tabulate(8)(d => math.cos(i * 13 + d)).toSeq)
    }.toDF("cid", "cv")
    val assigned = graft.operators.sampling.ClusterSample
      .assign(vecs, "vec_id", "embedding", cents, "cid", "cv")
    // the 2048-centroid set is ONE literal: the assignment plan must stay
    // a map-only pass — no Exchange anywhere under it
    val plan = assigned.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"assign plan shuffles:\n$plan")
    assert(assigned.count() == 20000L)
    assert(assigned.select("cluster").distinct().count() > 500L)
  }

  test("BPE encode cost is independent of merge-table size (32k vs 1k table)") {
    import org.apache.spark.sql.functions._
    import graft.operators.text.{BpeTrain, BpeCodec}
    val docs = spark.range(20000).select(col("id").as("doc_id"),
      concat_ws(" ", (0 until 16).map(j =>
        concat(lit("w"), ((col("id") + j) % 211).cast("string"))): _*).as("text"))
    val learned = BpeTrain.learnMerges(docs.limit(500), "text", 48)
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    assert(learned.size > 16, "need the UDF path (> hofMergeCap)")
    // identical APPLIED merges; tables padded with inert pairs that never
    // occur, so any cost difference is pure table-size overhead
    def padTo(n: Int): Seq[(String, String)] =
      learned ++ (learned.size until n).map(i => (s"\u0001$i", s"\u0002$i"))
    def run(ms: Seq[(String, String)]): (Long, Double) = {
      val t0 = System.nanoTime()
      val total = BpeTrain.withBpeTokenCount(docs, "text", ms)
        .agg(sum(col("n_bpe_tokens"))).head().getLong(0)
      (total, (System.nanoTime() - t0) / 1e9)
    }
    run(padTo(1000)) // warm codegen/JIT out of the comparison
    val (tot1k, s1k) = run(padTo(1000))
    val (tot32k, s32k) = run(padTo(32000))
    assert(tot32k == tot1k, "inert padding must not change the encoding")
    // rank-indexed codec: per-word cost tracks APPLIED merges, not table
    // size — the old sequential scan was ~32x slower here
    assert(s32k <= 4 * s1k + 1.0,
      f"32k-merge encode $s32k%.2fs vs 1k-merge $s1k%.2fs — cost grew with table size")
    // pin the codec's semantics against a literal rank-order sequential scan
    val codec = new BpeCodec(learned)
    def naive(w: String): Seq[String] = {
      var syms: Array[String] = w.split("")
      for ((l, r) <- learned if syms.length > 1) {
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        for (s <- syms) {
          if (out.nonEmpty && out.last == l && s == r) out(out.length - 1) = l + r
          else out += s
        }
        syms = out.toArray
      }
      syms.toSeq
    }
    val words = docs.limit(50).select(explode(split(col("text"), " ")))
      .collect().map(_.getString(0)).filter(_.nonEmpty)
    words.foreach { w =>
      assert(codec.encodeWord(w).toSeq == naive(w), s"codec diverges on '$w'")
    }
  }

  test("Gopher repetition battery cost is near-linear in document length (1000w vs 100w)") {
    import org.apache.spark.sql.functions._
    import graft.operators.text.QualityRules
    // 100-word vs 1000-word docs, same doc count: the native one-hash-pass
    // ngram_top_mass/ngram_dup_mass expressions must scale ~10x, not ~100x
    // (the r10 HOF formulation was O(distinct × n-grams) per row — a
    // 1000-word doc cost ~400x a 50-word one and p52 took 432s at sf0.1)
    // fixtures are CACHED and materialized before timing: the 1000-arg
    // concat_ws codegen compile and doc generation must not sit inside
    // the measured window (flake surface on a loaded machine)
    def mkDocs(nWords: Int) = spark.range(2000).select(col("id").as("doc_id"),
      concat_ws(" ", (0 until nWords).map(j =>
        concat(lit("w"), ((col("id") * 31 + j * 7) % 211).cast("string"))): _*).as("text"))
      .cache()
    val (docs100, docs1000) = (mkDocs(100), mkDocs(1000))
    docs100.count(); docs1000.count()
    def run(docs: org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      QualityRules.repetition(docs, "text").agg(sum(col("rep_pass"))).head()
      (System.nanoTime() - t0) / 1e9
    }
    run(docs100) // warm codegen/JIT out of the comparison
    val t100 = math.min(run(docs100), run(docs100))
    val t1000 = run(docs1000)
    docs100.unpersist(); docs1000.unpersist()
    assert(t1000 <= 30 * t100 + 1.0,
      f"1000-word docs $t1000%.2fs vs 100-word $t100%.2fs — growth is super-linear")
    // and the battery still measures what it claims on a long doc: a
    // maximally repetitive 1000-word doc saturates every fraction
    import spark.implicits._
    val rep = QualityRules.repetition(
      Seq((1L, Array.fill(1000)("spam spam").mkString(" "))).toDF("doc_id", "text"),
      "text").head()
    assert(rep.getAs[Double]("top2_char_frac") > 0.9)
    assert(rep.getAs[Double]("dup5_char_frac") == 1.0)
    assert(rep.getAs[Int]("rep_pass") == 0)
  }

  test("line-battery cost (boilerplate strip + C4) is near-linear in line count") {
    import org.apache.spark.sql.functions._
    // 20-line vs 200-line docs, same doc count: both operators are a
    // single filter pass over the line array (strip probes a bounded
    // boiler set per line; C4 checks per-line word count + regex), so
    // cost must scale ~10x, not ~100x
    // fixtures cached + materialized before timing (see the repetition
    // linearity test above for why)
    def mkDocs(nLines: Int) = spark.range(2000).select(col("id").as("doc_id"),
      concat_ws("\n", (0 until nLines).map(j =>
        concat(lit("line body with several words marker "),
          ((col("id") * 31 + j * 7) % 211).cast("string"), lit("."))): _*).as("text"))
      .cache()
    val (docs20, docs200) = (mkDocs(20), mkDocs(200))
    docs20.count(); docs200.count()
    val boiler = (0 until 200).map(i => s"boiler chrome line number $i")
    def run(docs: org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      graft.operators.text.C4Rules.battery(
          graft.operators.text.BoilerplateLines.strip(docs, "text", boiler),
          "text_clean")
        .agg(sum(col("n_kept")), sum(when(col("c4_pass"), 1))).head()
      (System.nanoTime() - t0) / 1e9
    }
    run(docs20) // warm codegen/JIT out of the comparison
    val t20 = math.min(run(docs20), run(docs20))
    val t200 = run(docs200)
    docs20.unpersist(); docs200.unpersist()
    assert(t200 <= 30 * t20 + 1.0,
      f"200-line docs $t200%.2fs vs 20-line $t20%.2fs — growth is super-linear")
  }

  test("bucketed tables join without a shuffle exchange") {
    Seq("b_orders", "b_customer").foreach { t =>
      spark.sql(s"drop table if exists $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) org.apache.commons.io.FileUtils.deleteDirectory(loc)
    }
    ScriptRunner.run(
      s"""load parquet.`$sf/orders.parquet` as o_src;
         |load parquet.`$sf/customer.parquet` as c_src;
         |drop table if exists b_orders;
         |drop table if exists b_customer;
         |save overwrite o_src as hive.`b_orders` where bucketBy="o_custkey" and numBuckets="4";
         |save overwrite c_src as hive.`b_customer` where bucketBy="c_custkey" and numBuckets="4";""".stripMargin,
      spark)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force a sort-merge join: broadcast would bypass the bucketing
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_orders")
        .join(spark.table("b_customer"),
          spark.table("b_orders")("o_custkey") === spark.table("b_customer")("c_custkey"))
      joined.count() // materialize with AQE final plan
      val plan = joined.queryExecution.executedPlan.toString
      // bucketing co-locates both sides: no shuffle (hash-partitioning) exchange
      assert(!plan.contains("Exchange hashpartitioning"), plan)
      assert(plan.contains("SortMergeJoin"), plan)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      ScriptRunner.run("drop table b_orders; drop table b_customer;", spark)
    }
  }
}
