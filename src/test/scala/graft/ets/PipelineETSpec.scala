package graft.ets

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.dsl.ScriptRunner

class PipelineETSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"
  private def runDF(script: String) = ScriptRunner.runToDF(script, spark)

  test("Dedup exact keeps one doc per identical text") {
    val df = runDF(
      """set dd = '''{"doc_id":1,"text":"same text"}
        |{"doc_id":2,"text":"same text"}
        |{"doc_id":3,"text":"other text"}''';
        |load jsonStr.`dd` as ddt;
        |run ddt as Dedup.`` where method="exact" as dedup1;
        |select doc_id from dedup1 order by doc_id as out;""".stripMargin)
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(1L, 3L))
  }

  test("Dedup fingerprint ignores case and punctuation") {
    val df = runDF(
      """set dd2 = '''{"doc_id":1,"text":"Hello, World!"}
        |{"doc_id":2,"text":"hello world"}
        |{"doc_id":3,"text":"different"}''';
        |load jsonStr.`dd2` as ddt2;
        |run ddt2 as Dedup.`` where method="fingerprint" as dedup2;
        |select doc_id from dedup2 order by doc_id as out;""".stripMargin)
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(1L, 3L))
  }

  test("Dedup containment drops a doc quoted inside a longer one (Jaccard misses it)") {
    val docs =
      """{"doc_id":1,"text":"w1 w2 w3 w4 w5","len":5}
        |{"doc_id":2,"text":"w1 w2 w3 w4 w5 x1 x2 x3 x4 x5 x6 x7","len":12}
        |{"doc_id":3,"text":"totally different content goes right here","len":6}""".stripMargin
    // jaccard(1,2) = 3/10 = 0.3 — the minhash/jaccard path keeps both
    val jac = runDF(
      s"""set cdd = '''$docs''';
         |load jsonStr.`cdd` as cddt;
         |run cddt as Dedup.`` where method="minhash" and threshold="0.9" as cdj;
         |select doc_id from cdj order by doc_id as out;""".stripMargin)
    assert(jac.collect().map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    // containment(1 in 2) = 1.0 >= 0.9: component {1,2}; keep="best" by
    // len elects the SUPERSET document
    val con = runDF(
      s"""run cddt as Dedup.`` where method="containment" and threshold="0.9"
         |  and keep="best" and scoreCol="len" as cdc;
         |select doc_id from cdc order by doc_id as out;""".stripMargin)
    assert(con.collect().map(_.getLong(0)).toSeq == Seq(2L, 3L))
  }

  test("Dedup minhash drops near-duplicate documents") {
    val df = runDF(
      s"""load parquet.`$sf/documents.parquet` as docs_dd;
         |run docs_dd as Dedup.`` where method="minhash" and threshold="0.8" as dedup3;""".stripMargin)
    val before = spark.table("docs_dd").count()
    val after = df.count()
    assert(after > 0 && after < before)
  }

  test("SimilarityJoin exact and lsh agree at threshold 0.45") {
    val exact = runDF(
      s"""load parquet.`$sf/embeddings.parquet` as embs;
         |run embs as SimilarityJoin.`` where method="exact" and threshold="0.45" as pe;
         |select a_id, b_id from pe order by a_id, b_id as out;""".stripMargin).collect().toSeq
    val lsh = runDF(
      s"""run embs as SimilarityJoin.`` where method="lsh" and threshold="0.45"
         |  and rowsPerBand="4" as pl;
         |select a_id, b_id from pl order by a_id, b_id as out;""".stripMargin).collect().toSeq
    assert(exact == lsh)
  }

  test("SimilarityJoin forced banding matches exact output (no fallback)") {
    val exact = runDF(
      s"""load parquet.`$sf/embeddings.parquet` as embs_f;
         |run embs_f as SimilarityJoin.`` where method="exact" and threshold="0.45" as fe;
         |select a_id, b_id, sim from fe order by a_id, b_id as out;""".stripMargin).collect().toSeq
    val banded = runDF(
      s"""run embs_f as SimilarityJoin.`` where method="lsh" and threshold="0.45"
         |  and rowsPerBand="4" and forceBanding="true" as fb;
         |select a_id, b_id, sim from fb order by a_id, b_id as out;""".stripMargin).collect().toSeq
    assert(banded == exact)
  }

  test("SimilarityJoin ivf (radius-bound cell blocking) matches exact output") {
    val exact = runDF(
      s"""load parquet.`$sf/embeddings.parquet` as embs_ivf;
         |run embs_ivf as SimilarityJoin.`` where method="exact" and threshold="0.45" as ie;
         |select a_id, b_id, sim from ie order by a_id, b_id as out;""".stripMargin).collect().toSeq
    val ivf = runDF(
      s"""run embs_ivf as SimilarityJoin.`` where method="ivf" and threshold="0.45"
         |  and nlist="8" as ii;
         |select a_id, b_id, sim from ii order by a_id, b_id as out;""".stripMargin).collect().toSeq
    assert(ivf == exact)
    assert(ivf.nonEmpty)
  }

  test("SimilarityJoin cells (SemDeDup within-cell) is an exact-sim SUBSET; nlist=1 is exact") {
    val exact = runDF(
      s"""load parquet.`$sf/embeddings.parquet` as embs_sc;
         |run embs_sc as SimilarityJoin.`` where method="exact" and threshold="0.45" as sce;
         |select a_id, b_id, sim from sce order by a_id, b_id as out;""".stripMargin).collect().toSeq
    val cells = runDF(
      s"""run embs_sc as SimilarityJoin.`` where method="cells" and threshold="0.45"
         |  and nlist="8" as scc;
         |select a_id, b_id, sim from scc order by a_id, b_id as out;""".stripMargin).collect().toSeq
    // approximate by design: every emitted pair is a true pair with the
    // exact path's sim; only cross-cell pairs may be missing
    assert(cells.nonEmpty && cells.toSet.subsetOf(exact.toSet))
    // one cell == no forfeited pairs: identical to exact
    val one = runDF(
      s"""run embs_sc as SimilarityJoin.`` where method="cells" and threshold="0.45"
         |  and nlist="1" as sc1;
         |select a_id, b_id, sim from sc1 order by a_id, b_id as out;""".stripMargin).collect().toSeq
    assert(one == exact)
  }

  test("ivfSelfJoin on an empty corpus returns an empty typed frame") {
    import graft.operators.similarity.CosineSimilarity
    val empty = spark.emptyDataFrame
      .sparkSession.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](),
        org.apache.spark.sql.types.StructType.fromDDL("vec_id long, embedding array<double>"))
    val out = CosineSimilarity.ivfSelfJoin(empty, "vec_id", "embedding", 0.5)
    assert(out.columns.toSeq == Seq("a_id", "b_id", "sim"))
    assert(out.count() == 0)
    assert(CosineSimilarity.lshSelfJoin(empty, "vec_id", "embedding", 0.8).count() == 0)
  }

  test("ivf centroids persist to centroidsPath and reload identically") {
    import graft.operators.similarity.CosineSimilarity
    val path = Files.createTempDirectory("graft_cent").toString + "/centroids"
    val embs = spark.read.parquet(s"$sf/embeddings.parquet")
    val first = CosineSimilarity.ivfSelfJoin(embs, "vec_id", "embedding", 0.45,
      nlist = 8, centroidsPath = Some(path)).orderBy("a_id", "b_id").collect().toSeq
    assert(Files.exists(Paths.get(path)))
    val second = CosineSimilarity.ivfSelfJoin(embs, "vec_id", "embedding", 0.45,
      nlist = 8, centroidsPath = Some(path)).orderBy("a_id", "b_id").collect().toSeq
    assert(first == second)
    val topk = CosineSimilarity.ivfTopK(embs,
      embs.selectExpr("vec_id as qid", "embedding as qv").filter("qid < 3"),
      "vec_id", "embedding", "qid", "qv", k = 3, nlist = 8, nprobe = 3,
      centroidsPath = Some(path))
    assert(topk.count() == 9)
  }

  test("distributed fit: valid centers; persisted-centers boundary is fit-agnostic") {
    import graft.operators.similarity.CosineSimilarity
    val embs = spark.read.parquet(s"$sf/embeddings.parquet")
    val dim = embs.selectExpr("size(embedding)").head().getInt(0)
    // spark.ml KMeans fit: ≤ k centers, right dimensionality
    val centers = CosineSimilarity.fitDistributed(
      embs.selectExpr("cast(embedding as array<double>) as v"), "v", 8, 42L)
    assert(centers.nonEmpty && centers.length <= 8)
    assert(centers.forall(_.length == dim))
    // the oracle/determinism boundary is the PERSISTED centers: cellSelfJoin
    // fit="distributed" persists them, and a second run reads the parquet —
    // identical output regardless of which fit produced the file (the
    // `fit` arg of the reload run is irrelevant by construction, pinned
    // here with the opposite value)
    val path = Files.createTempDirectory("graft_dcent").toString + "/centroids"
    val first = CosineSimilarity.cellSelfJoin(embs, "vec_id", "embedding", 0.45,
      nlist = 8, centroidsPath = Some(path), fit = "distributed")
      .orderBy("a_id", "b_id").collect().toSeq
    val reload = CosineSimilarity.cellSelfJoin(embs, "vec_id", "embedding", 0.45,
      nlist = 8, centroidsPath = Some(path), fit = "driver")
      .orderBy("a_id", "b_id").collect().toSeq
    assert(first == reload)
    // subset-of-exact still holds under the distributed fit (any centers
    // are semantics-preserving for SemDeDup: only the forfeited cross-cell
    // pair set moves)
    val exact = CosineSimilarity.exactSelfJoin(embs, "vec_id", "embedding", 0.45)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(first.nonEmpty &&
      first.map(r => (r.getLong(0), r.getLong(1))).toSet.subsetOf(exact))
    // auto cutover: >64 cells routes to the distributed fit (k capped at
    // corpus size, so tiny fixtures still fit)
    val auto = CosineSimilarity.cellSelfJoin(embs, "vec_id", "embedding", 0.45,
      nlist = 65, fit = "auto")
    assert(auto.columns.toSeq == Seq("a_id", "b_id", "sim"))
    assert(auto.collect().map(r => (r.getLong(0), r.getLong(1))).toSet.subsetOf(exact))
  }

  test("BpeTrain train -> predict round-trips merges through the model path") {
    val model = Files.createTempDirectory("bpe_model").toString
    val df = runDF(
      s"""set bpedocs = '''{"doc_id":1,"text":"the cat sat on the mat"}
         |{"doc_id":2,"text":"the cats sat on the mats"}
         |{"doc_id":3,"text":"a cat and a rat"}
         |{"doc_id":4,"text":"the rats and the cats"}''';
         |load jsonStr.`bpedocs` as bpe_in;
         |train bpe_in as BpeTrain.`$model` where numMerges="6" as bpe_m;
         |predict bpe_in as BpeTrain.`$model` as bpe_enc;
         |select doc_id, n_bpe_tokens from bpe_enc order by doc_id as out;""".stripMargin)
    assert(df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ==
      Map(1L -> 10L, 2L -> 10L, 3L -> 7L, 4L -> 7L))
    // output="ids": full token-id encoding through the saved vocab; OOV
    // characters (unseen at train time) surface as -1, not silence
    val ids = ScriptRunner.runToDF(
      s"""set bpenew = '''{"doc_id":9,"text":"a cat zap"}''';
         |load jsonStr.`bpenew` as bpe_new;
         |predict bpe_new as BpeTrain.`$model` where output="ids" as bpe_ids_out;
         |select bpe_ids from bpe_ids_out as out;""".stripMargin, spark)
      .head().getSeq[Long](0)
    // a=0, c+at=[1,11]; zap: z is OOV -> [-1, 0, -1]? no: z,a,p chars with
    // no applicable merges -> [-1, 0, -1] (p also unseen)
    assert(ids == Seq(0L, 1L, 11L, -1L, 0L, -1L))
  }

  test("BpeTrain DSL at the documented default numMerges=1000 matches direct encode") {
    // the real-corpus regime: a merge table far past hofMergeCap (16), so
    // the DSL predict exercises the UDF encode switch end to end, pinned
    // against the operator-level path on the same saved merges
    val model = Files.createTempDirectory("bpe_model_1k").toString
    val viaDsl = runDF(
      s"""load parquet.`$sf/documents.parquet` as bpe1k_in;
         |select doc_id, text from bpe1k_in where text is not null as bpe1k_docs;
         |train bpe1k_docs as BpeTrain.`$model` where numMerges="1000" as bpe1k_m;
         |predict bpe1k_docs as BpeTrain.`$model` as bpe1k_enc;
         |select doc_id, n_bpe_tokens from bpe1k_enc order by doc_id as out;""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val merges = spark.read.parquet(model + "/data").orderBy("rank").collect()
      .map(r => (r.getAs[String]("left"), r.getAs[String]("right"))).toSeq
    // the synthetic corpus exhausts its pair space before 1000 (learning
    // stops when no pair repeats) — what matters is the table is far past
    // hofMergeCap=16, so predict runs the UDF encode switch end to end
    assert(merges.size > 16, s"expected the UDF-path regime, got ${merges.size} merges")
    val direct = graft.operators.text.BpeTrain.withBpeTokenCount(
      spark.read.parquet(s"$sf/documents.parquet").filter("text is not null"),
      "text", merges)
      .select("doc_id", "n_bpe_tokens").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaDsl == direct)
    assert(viaDsl.nonEmpty)
  }

  test("Dedup method=embedding keeps one vector per semantic cluster") {
    val df = runDF(
      s"""load parquet.`$sf/embeddings.parquet` as embs_dd;
         |run embs_dd as Dedup.`` where method="embedding" and idCol="vec_id"
         |  and vecCol="embedding" and threshold="0.45" as dedup_e;
         |select vec_id from dedup_e order by vec_id as out;""".stripMargin)
    val before = spark.table("embs_dd").count()
    val after = df.count()
    assert(after > 0 && after < before)
    // survivors are exactly the non-losers of the exact pair graph
    val pairs = graft.operators.similarity.CosineSimilarity.exactSelfJoin(
      spark.table("embs_dd"), "vec_id", "embedding", 0.45)
      .select("a_id", "b_id")
    val expect = DedupET.keepComponentMin(spark.table("embs_dd"), "vec_id", pairs)
      .select("vec_id").orderBy("vec_id").collect().map(_.getLong(0)).toSeq
    assert(df.collect().map(_.getLong(0)).toSeq == expect)
  }

  test("Dedup method=embedding: null-embedding rows survive (no NPE)") {
    import spark.implicits._
    val rows = Seq(
      (1L, Seq(1.0, 0.0, 0.0)),
      (2L, Seq(1.0, 0.0, 0.0)),   // dup of 1
      (3L, null),                  // must pass through, not crash the assign UDF
      (4L, Seq(0.0, 1.0, 0.0))
    ).toDF("vec_id", "embedding")
    rows.createOrReplaceTempView("null_embs")
    val kept = runDF(
      """run null_embs as Dedup.`` where method="embedding" and idCol="vec_id"
        |  and vecCol="embedding" and threshold="0.9" as ne_out;
        |select vec_id from ne_out order by vec_id as out;""".stripMargin)
      .collect().map(_.getLong(0)).toSeq
    assert(kept == Seq(1L, 3L, 4L))
  }

  test("Dedup embedding reuses persisted centroids (build once, query twice)") {
    val path = Files.createTempDirectory("graft_dd_cent").toString + "/centroids"
    def survivors() = runDF(
      s"""load parquet.`$sf/embeddings.parquet` as embs_cc;
         |run embs_cc as Dedup.`` where method="embedding" and idCol="vec_id"
         |  and vecCol="embedding" and threshold="0.45" and centroids="$path" as dd_cc;
         |select vec_id from dd_cc order by vec_id as out;""".stripMargin)
      .collect().map(_.getLong(0)).toSeq
    val first = survivors()
    assert(Files.exists(Paths.get(path)), "centroids were not persisted")
    val mtime = Files.getLastModifiedTime(Paths.get(path))
    val second = survivors()
    assert(first == second)
    // second run LOADED the centroids instead of re-fitting/re-writing
    assert(Files.getLastModifiedTime(Paths.get(path)) == mtime)
  }

  test("lshSelfJoin on a tiny corpus (sample >= corpus) matches exact") {
    import spark.implicits._
    import graft.operators.similarity.CosineSimilarity
    // 10 rows: the 500-row guard sample IS the whole table; the estimate
    // divides by the actual sample size, so the guard must neither divide
    // by zero nor mis-trigger, and output must still equal exact
    val rnd = new scala.util.Random(11)
    val tiny = (1L to 10L).map(i => i -> Seq.fill(8)(rnd.nextGaussian()))
      .toDF("vec_id", "embedding")
    val exact = CosineSimilarity.exactSelfJoin(tiny, "vec_id", "embedding", 0.7)
      .orderBy("a_id", "b_id").collect().toSeq
    val lsh = CosineSimilarity.lshSelfJoin(tiny, "vec_id", "embedding", 0.7)
      .orderBy("a_id", "b_id").collect().toSeq
    assert(lsh == exact)
    // n < 2 edge: guard's s < 2 short-circuit
    val one = Seq(1L -> Seq(1.0, 0.0)).toDF("vec_id", "embedding")
    assert(CosineSimilarity.lshSelfJoin(one, "vec_id", "embedding", 0.7).count() == 0)
  }

  test("IncrementalDedup: rolling batches dedup against the signature store") {
    val store = Files.createTempDirectory("sig_store").toString + "/sigs"
    def run(view: String) = runDF(
      s"""run $view as IncrementalDedup.`$store` where threshold="0.8" as inc_out;
         |select doc_id from inc_out order by doc_id as out;""".stripMargin)
      .collect().map(_.getLong(0)).toSeq
    // batch 1: one within-batch near-dup pair (1 ~ 2), one singleton
    runDF(
      """set b1 = '''{"doc_id":1,"text":"the quick brown fox jumps over the lazy dog and runs far away into the night"}
        |{"doc_id":2,"text":"the quick brown fox jumps over the lazy dog and runs far away into the day"}
        |{"doc_id":3,"text":"completely different content about spark distributed query engines"}''';
        |load jsonStr.`b1` as inc_b1;""".stripMargin)
    assert(run("inc_b1") == Seq(1L, 3L)) // 2 lost within-batch to 1
    // batch 2: 11 near-dups stored doc 1 -> dropped by the STORE comparison;
    // 12 is genuinely new -> survives and joins the store
    runDF(
      """set b2 = '''{"doc_id":11,"text":"the quick brown fox jumps over the lazy dog and runs far away into the night"}
        |{"doc_id":12,"text":"a wholly new document with nothing in common with anything stored before"}''';
        |load jsonStr.`b2` as inc_b2;""".stripMargin)
    assert(run("inc_b2") == Seq(12L))
    // idempotent ingestion: re-submitting batch 2 yields zero survivors
    assert(run("inc_b2").isEmpty)
    // the store is a versioned vparquet table: one commit per updating run
    assert(graft.sources.VParquet.latestVersion(spark, store).contains(2L))
  }

  test("IncrementalDedup store maintenance bounds files and history over 20 batches") {
    // an unmaintained store adds a file tail + one manifest per ingest
    // batch forever; the cadence compaction/vacuum must keep both bounded
    import spark.implicits._
    val store = Files.createTempDirectory("sig_maint").toString + "/sigs"
    (1 to 20).foreach { i =>
      val b = Seq((i.toLong,
        s"unique document number $i about topic$i with deliberately " +
          s"distinct content token$i and payload$i trailing words here"))
        .toDF("doc_id", "text")
      graft.operators.dedup.SignatureStore.dedupAgainst(b, "doc_id", "text",
        store, threshold = 0.8, maintainEvery = 5, retainVersions = 3).count()
    }
    // nothing lost: every unique doc's signature is in the live snapshot
    assert(graft.sources.VParquet.loadVersion(spark, store, None, None)
      .count() == 20)
    def countFiles(f: java.io.File, suffix: String): Int =
      if (f.isDirectory) f.listFiles().map(countFiles(_, suffix)).sum
      else if (f.getName.endsWith(suffix) && !f.getName.startsWith(".")) 1 else 0
    // 20 unmaintained appends would leave >=20 data files and 20 manifests;
    // compact-every-5 + vacuum-to-3 keeps both well under that
    val dataFiles = countFiles(new java.io.File(store), ".parquet")
    assert(dataFiles <= 10, s"store holds $dataFiles data files after 20 batches")
    val manifests = countFiles(new java.io.File(store, "_vlog"), ".json")
    assert(manifests <= 6, s"store holds $manifests manifests after 20 batches")
  }

  test("SubstringDedupInPlace DSL trims corpus-duplicated spans") {
    val df = runDF(
      s"""set ssd = '''{"doc_id":1,"text":"alpha beta gamma delta epsilon"}
         |{"doc_id":2,"text":"zzz alpha beta gamma delta qqq"}''';
         |load jsonStr.`ssd` as ssd_in;
         |run ssd_in as SubstringDedupInPlace.`` where k="3" as ssd_out;
         |select doc_id, text, n_dup_spans from ssd_out order by doc_id as out;""".stripMargin)
    val rows = df.collect().map(r => r.getLong(0) -> (r.getString(1), r.getInt(2))).toMap
    assert(rows(1L) == ("alpha beta gamma delta epsilon", 0))
    assert(rows(2L) == ("zzz qqq", 1))
    // action="spans" surfaces the span table instead
    val spans = runDF(
      s"""run ssd_in as SubstringDedupInPlace.`` where k="3" and action="spans" as ssd_sp;
         |select doc_id, span_start, span_end from ssd_sp as out;""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(spans == Set((2L, 1, 5)))
  }

  test("Dedup survivors are one per connected component (chain case)") {
    import spark.implicits._
    // pairs (1,2) and (2,3) with no (1,3) edge: the group is {1,2,3} -> keep 1;
    // 4 is untouched. Greedy b_id-dropping would also have kept only 1 here,
    // but on chain (2,3) alone after dropping 2 it must NOT drop 3.
    val df = Seq(1L, 2L, 3L, 4L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("a_id", "b_id")
    val kept = DedupET.keepComponentMin(df, "doc_id", pairs)
      .orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    assert(kept == Seq(1L, 4L))
    // two separate components keep their own minima
    val pairs2 = Seq((5L, 6L), (8L, 7L)).toDF("a_id", "b_id")
    val df2 = Seq(5L, 6L, 7L, 8L).toDF("doc_id")
    val kept2 = DedupET.keepComponentMin(df2, "doc_id", pairs2)
      .orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    assert(kept2 == Seq(5L, 7L))
  }

  test("lshParams at threshold 1.0 yields at least one band (exact-dup search)") {
    import graft.operators.similarity.CosineSimilarity
    val (r, bands) = CosineSimilarity.lshParams(1.0, 1e-5, 4)
    assert(bands >= 1)
  }

  test("lsh degeneration guard estimates high candidate fraction on correlated data") {
    import graft.operators.similarity.CosineSimilarity
    val planes = Array.fill(240)(Array.fill(8)(new scala.util.Random(1).nextGaussian()))
    // identical vectors -> every pair collides in every band -> fraction 1
    val sample = Array.fill(50)(Array.fill(8)(0.5))
    val frac = CosineSimilarity.estimateCandidateFraction(sample, planes, 4, 60)
    assert(frac > 0.9)
  }

  test("AnnTopK returns k neighbors per query") {
    val df = runDF(
      s"""load parquet.`$sf/embeddings.parquet` as embs2;
         |select vec_id as qid, embedding as qv from embs2 where vec_id < 3 as qset;
         |run embs2 as AnnTopK.`` where queryTable="qset" and k="4" as ann;
         |select qid, nrank, neighbor from ann order by qid, nrank as out;""".stripMargin)
    val rows = df.collect()
    assert(rows.length == 12) // 3 queries x 4 neighbors
  }

  test("Bm25: DSL top-k retrieval and rrf fusion of two ranked lists") {
    val df = runDF(
      s"""load parquet.`$sf/documents.parquet` as bdocs;
         |select doc_id as qid, text as qtext from bdocs where doc_id < 2 as bq;
         |run bdocs as Bm25.`` where queryTable="bq" and k="5" as lex;
         |select qid, rank, doc_id from lex as lexr;
         |run bdocs as Bm25.`` where mode="rrf" and lists="lexr,lexr" and k="5" as fused;
         |select * from fused as out;""".stripMargin)
    val rows = df.collect()
    assert(rows.length == 10) // 2 queries x 5
    // self-fusion: every doc appears in both (identical) lists
    assert(rows.forall(_.getAs[Int]("n_lists") == 2))
    // querying a doc's own text must place the doc in its own top-5 (not
    // necessarily first: BM25 length normalization can favor a shorter doc
    // that repeats the same high-idf terms — true of this tiny-vocab corpus)
    val lex = spark.table("lexr").collect()
    assert(Seq(0L, 1L).forall(q => lex.exists(r =>
      r.getAs[Long]("qid") == q && r.getAs[Long]("doc_id") == q)))
  }

  test("TextNormalizeInPlace: NFC + whitespace cleanup through the DSL") {
    val df = runDF(
      """set tn = '''{"doc_id":1,"text":" a  b   c "}''';
        |load jsonStr.`tn` as tnt;
        |run tnt as TextNormalizeInPlace.`` as out;""".stripMargin)
    val r = df.collect()(0)
    assert(r.getAs[String]("text") == "a b c")
    assert(r.getAs[Int]("n_chars_raw") == 10)
    assert(r.getAs[Int]("n_chars_norm") == 5)
  }

  test("FuzzyLinkage links typo'd names to the clean registry via the DSL") {
    val df = runDF(
      """set fzc = '''{"id":1,"name":"golden retriever"}
        |{"id":2,"name":"border collie"}''';
        |set fzd = '''{"id":10,"name":"goldn retriever"}
        |{"id":20,"name":"pomeranian"}''';
        |load jsonStr.`fzc` as fz_clean;
        |load jsonStr.`fzd` as fz_dirty;
        |run fz_dirty as FuzzyLinkage.`` where rightTable="fz_clean"
        |  and leftIdCol="id" and leftStrCol="name" and maxDist="2" as fzout;
        |select l_id, r_id, dist from fzout order by l_id as out;""".stripMargin)
    assert(df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq ==
      Seq((10L, 1L, 1)))
  }

  test("KCore peels the tail off a triangle through the DSL") {
    val df = runDF(
      """set kce = '''{"a":1,"b":2}
        |{"a":2,"b":3}
        |{"a":1,"b":3}
        |{"a":3,"b":4}''';
        |load jsonStr.`kce` as kc_edges;
        |run kc_edges as KCore.`` where srcCol="a" and dstCol="b" and k="2" as kcout;
        |select node, deg from kcout order by node as out;""".stripMargin)
    assert(df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 2L), (2L, 2L), (3L, 2L)))
  }

  test("HarmonicCentrality sums integer fixed-point terms through the DSL") {
    val df = runDF(
      """set hce = '''{"a":1,"b":2}
        |{"a":2,"b":3}
        |{"a":3,"b":4}''';
        |set hcs = '''{"node":1}
        |{"node":4}''';
        |load jsonStr.`hce` as hc_edges;
        |load jsonStr.`hcs` as hc_seeds;
        |run hc_edges as HarmonicCentrality.`` where srcCol="a" and dstCol="b"
        |  and seedTable="hc_seeds" and maxHops="5" and undirected="true" as hcout;
        |select node, harmonic_fp from hcout order by node as out;""".stripMargin)
    val h = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // chain 1-2-3-4, seeds {1,4}: node 2 = 1e12/1 + 1e12 div 2
    assert(h(2L) == 1500000000000L && h(3L) == 1500000000000L)
    assert(h(1L) == 333333333333L && h(4L) == 333333333333L)
  }

  test("NeighborhoodFunction: HLL balls -> centralities through the DSL; maxK=0 coreness") {
    val df = runDF(
      """set nfe = '''{"a":1,"b":2}
        |{"a":2,"b":3}
        |{"a":1,"b":3}
        |{"a":3,"b":4}''';
        |load jsonStr.`nfe` as nf_edges;
        |run nf_edges as NeighborhoodFunction.`` where srcCol="a" and dstCol="b"
        |  and maxHops="5" and undirected="true" as nfout;
        |select node, reached, sum_dist, harmonic_fp from nfout order by node as out;""".stripMargin)
    val c = df.collect().map(r =>
      r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(c(3L) == ((3L, 3L, 3000000L))) // coupon-exact on a 4-node graph
    assert(c(4L) == ((3L, 5L, 2000000L)))
    // Coreness maxK="0": run-to-empty true core numbers via the DSL
    val cz = runDF(
      """set cz = '''{"a":1,"b":2}
        |{"a":2,"b":3}
        |{"a":1,"b":3}
        |{"a":3,"b":4}''';
        |load jsonStr.`cz` as cz_edges;
        |run cz_edges as Coreness.`` where srcCol="a" and dstCol="b" and maxK="0" as czout;
        |select node, coreness from czout order by node as out;""".stripMargin)
    assert(cz.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 2L), (2L, 2L), (3L, 2L), (4L, 1L)))
  }

  test("Coreness decomposes a triangle-with-tail through the DSL") {
    val df = runDF(
      """set cre = '''{"a":1,"b":2}
        |{"a":2,"b":3}
        |{"a":1,"b":3}
        |{"a":3,"b":4}''';
        |load jsonStr.`cre` as cr_edges;
        |run cr_edges as Coreness.`` where srcCol="a" and dstCol="b" and maxK="4" as crout;
        |select node, coreness from crout order by node as out;""".stripMargin)
    assert(df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 2L), (2L, 2L), (3L, 2L), (4L, 1L)))
  }

  test("BfsHops reports min hop distances from a seed table via the DSL") {
    val df = runDF(
      """set bfe = '''{"a":1,"b":2}
        |{"a":2,"b":3}
        |{"a":3,"b":4}''';
        |set bfs = '''{"node":1}''';
        |load jsonStr.`bfe` as bf_edges;
        |load jsonStr.`bfs` as bf_seeds;
        |run bf_edges as BfsHops.`` where srcCol="a" and dstCol="b"
        |  and seedTable="bf_seeds" and maxHops="2" as bfout;
        |select node, dist from bfout order by node as out;""".stripMargin)
    assert(df.collect().map(r => (r.getLong(0), r.getInt(1))).toSeq ==
      Seq((1L, 0), (2L, 1), (3L, 2)))
  }

  test("TrustRank ranks from a seed table via the DSL") {
    val df = runDF(
      """set tre = '''{"src":1,"dst":2}
        |{"src":2,"dst":3}''';
        |set trs = '''{"node":1}''';
        |load jsonStr.`tre` as tr_edges;
        |load jsonStr.`trs` as tr_seeds;
        |run tr_edges as TrustRank.`` where seedTable="tr_seeds" and iterations="3" as trout;
        |select node, trust_fp from trout order by node as out;""".stripMargin)
    val t = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(t(1L) > t(2L) && t(2L) > t(3L) && t(3L) > 0L)
  }

  test("CooccurEdges builds capped weighted edges through the DSL") {
    val df = runDF(
      """set cob = '''{"bk":1,"i":10}
        |{"bk":1,"i":20}
        |{"bk":2,"i":10}
        |{"bk":2,"i":20}
        |{"bk":2,"i":30}''';
        |load jsonStr.`cob` as co_items;
        |run co_items as CooccurEdges.`` where basketCol="bk" and itemCol="i"
        |  and minCount="2" as coout;
        |select a, b, weight from coout order by a, b as out;""".stripMargin)
    assert(df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((10L, 20L, 2L), (20L, 10L, 2L)))
    // the cap drops basket 2 down to {10, 20}: same surviving edge set
    val capped = runDF(
      """run co_items as CooccurEdges.`` where basketCol="bk" and itemCol="i"
        |  and maxBasketSize="2" as cocap;
        |select a, b, weight from cocap order by a, b as out;""".stripMargin)
    assert(capped.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((10L, 20L, 2L), (20L, 10L, 2L)))
  }

  test("Sssp reports weighted distances from a seed table via the DSL") {
    val df = runDF(
      """set sse = '''{"a":1,"b":3,"w":10}
        |{"a":1,"b":2,"w":1}
        |{"a":2,"b":3,"w":2}''';
        |set sss = '''{"node":1}''';
        |load jsonStr.`sse` as ss_edges;
        |load jsonStr.`sss` as ss_seeds;
        |run ss_edges as Sssp.`` where srcCol="a" and dstCol="b" and weightCol="w"
        |  and seedTable="ss_seeds" as ssout;
        |select node, dist from ssout order by node as out;""".stripMargin)
    assert(df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 0L), (2L, 1L), (3L, 3L)))
  }

  test("EntityResolve clusters a transitive chain through the DSL") {
    val df = runDF(
      """set erg = '''{"id":1,"name":"golden retriever"}
        |{"id":2,"name":"goldan retriever"}
        |{"id":3,"name":"goldan retriefer"}''';
        |load jsonStr.`erg` as er_reg;
        |run er_reg as EntityResolve.`` where maxDist="1" as erout;
        |select rec_id, entity, canon_str from erout order by rec_id as out;""".stripMargin)
    assert(df.collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq ==
      Seq((1L, 1L, "golden retriever"), (2L, 1L, "golden retriever"),
        (3L, 1L, "golden retriever")))
  }

  test("Blocklist screens docs against a term table via the DSL") {
    val df = runDF(
      """set bld = '''{"doc_id":1,"text":"spark spark spark"}
        |{"doc_id":2,"text":"perfectly clean text"}''';
        |set blt = '''{"term":"spark"}''';
        |load jsonStr.`bld` as bl_docs;
        |load jsonStr.`blt` as bl_terms;
        |run bl_docs as Blocklist.`` where termTable="bl_terms" as blout;
        |select doc_id, n_hits, blocked from blout order by doc_id as out;""".stripMargin)
    assert(df.collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq ==
      Seq((1L, 3L, true), (2L, 0L, false)))
  }

  test("AsOfJoin ET: nearest direction with tolerance through the DSL") {
    val df = runDF(
      """set aol = '''{"id":1,"k":"u","t":13}''';
        |set aor = '''{"k":"u","t":8,"px":1.0}
        |{"k":"u","t":16,"px":2.0}''';
        |load jsonStr.`aol` as ao_left;
        |load jsonStr.`aor` as ao_right;
        |run ao_left as AsOfJoin.`` where rightTable="ao_right" and keyCols="k"
        |  and leftTime="t" and rightTime="t" and payload="px"
        |  and direction="nearest" and tolerance="5" as aoout;
        |select id, asof_px from aoout as out;""".stripMargin)
    assert(df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
      Seq((1L, 2.0))) // gap 5 vs 3: forward wins
  }

  test("RandomProjection reduces fixture embeddings 64->8 via the DSL") {
    val df = runDF(
      s"""load parquet.`$sf/embeddings.parquet` as rp_embs;
         |run rp_embs as RandomProjection.`` where inDim="64" and outDim="8" as rpout;
         |select vec_id, size(proj) as k from rpout order by vec_id limit 3 as out;""".stripMargin)
    assert(df.collect().map(r => r.getInt(1)).forall(_ == 8))
  }

  test("Attribution + Survival: analytics ETs through the DSL") {
    val df = runDF(
      """set at = '''{"user_id":1,"ts":"2026-01-01 00:00:00","event_type":"view","value":0}
        |{"user_id":1,"ts":"2026-01-01 01:00:00","event_type":"purchase","value":10.0}
        |{"user_id":2,"ts":"2026-01-02 00:00:00","event_type":"purchase","value":5.0}''';
        |load jsonStr.`at` as att;
        |select user_id, cast(ts as timestamp) as ts, event_type, value from att as at2;
        |run at2 as Attribution.`` as out;""".stripMargin)
    val rows = df.collect().map(r => (r.getString(0), r.getString(1)) ->
      (r.getDouble(2), r.getDouble(3))).toMap
    // one touched conversion (full credit to view) + one direct
    Seq("linear", "position", "decay").foreach { m =>
      assert(rows((m, "view")) == ((1.0, 10.0)), m)
      assert(rows((m, "direct")) == ((1.0, 5.0)), m)
    }
    val surv = runDF(
      """set sv = '''{"dur":2,"event":1}
        |{"dur":2,"event":1}
        |{"dur":3,"event":0}
        |{"dur":4,"event":1}
        |{"dur":5,"event":0}''';
        |load jsonStr.`sv` as svt;
        |run svt as Survival.`` as out2;""".stripMargin)
    val sm = surv.collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(sm == Map(2L -> 0.6, 4L -> 0.3))
  }

  test("SnippetsInPlace + RetrievalEval through the DSL") {
    val df = runDF(
      s"""load parquet.`$sf/documents.parquet` as sndocs;
         |select doc_id as qid, text as qtext from sndocs where doc_id < 2 as snq;
         |run sndocs as Bm25.`` where queryTable="snq" and k="5" as snlex;
         |select l.qid, l.rank, l.doc_id, d.text,
         |  array_distinct(filter(split(lower(q.qtext), ' '), x -> x != ''))
         |  as qterms
         |from snlex l join sndocs d on d.doc_id = l.doc_id
         |  join snq q on q.qid = l.qid as sncand;
         |run sncand as SnippetsInPlace.`` as snout;
         |select qid, rank, doc_id, snippet, n_hits from snout as out;""".stripMargin)
    val rows = df.collect()
    assert(rows.length == 10)
    assert(rows.forall(_.getAs[Int]("n_hits") > 0))
    // RetrievalEval over the same run: judge each query relevant to itself
    val eval = runDF(
      """select qid, qid as doc_id from snq as snqrels;
        |run snout as RetrievalEval.`` where qrelsTable="snqrels" and k="5" as out3;""".stripMargin)
    val em = eval.collect().map(r => r.getAs[Long]("qid") ->
      r.getAs[Long]("n_hit")).toMap
    assert(em.keySet == Set(0L, 1L))
    assert(em.values.forall(_ == 1L)) // the self doc is in its own top-5
  }

  test("MmrRerank: DSL retrieval stack bm25 -> mmr, ranks 1..k per query") {
    val df = runDF(
      s"""load parquet.`$sf/documents.parquet` as mdocs;
         |load parquet.`$sf/embeddings.parquet` as membs;
         |select doc_id as qid, text as qtext from mdocs where doc_id < 2 as mq;
         |run mdocs as Bm25.`` where queryTable="mq" and k="10" as mlex;
         |select qid, doc_id, score as rel from mlex as mcand;
         |run mcand as MmrRerank.`` where vectorTable="membs" and k="4" as out;""".stripMargin)
    val rows = df.collect()
    assert(rows.length == 8) // 2 queries x 4 picks
    val ranks = rows.groupBy(_.getAs[Long]("qid"))
      .map { case (_, rs) => rs.map(_.getAs[Int]("rank")).sorted.toSeq }
    assert(ranks.forall(_ == Seq(1, 2, 3, 4)))
    // the first pick has an empty selected set: its mmr is exactly λ·rel
    // (later picks can score above λ·rel when every selected sim is negative)
    assert(rows.filter(_.getAs[Int]("rank") == 1).forall(r =>
      r.getAs[Double]("mmr") ==
        math.round(0.7 * r.getAs[Double]("rel") * 1e6) / 1e6))
  }

  test("AnnTopK pq: full re-rank coverage equals exact; codes are m bytes") {
    import graft.operators.similarity.ProductQuantization
    val embs = spark.read.parquet(s"$sf/embeddings.parquet")
    val q = embs.selectExpr("vec_id as qid", "embedding as qv").filter("qid < 5")
    val model = ProductQuantization.fit(embs, "embedding", m = 8)
    // 8 one-byte codes replace the 64-double vector
    val codes = ProductQuantization.encode(embs, "vec_id", "embedding", model)
    assert(codes.selectExpr("length(code) as l").distinct().collect()
      .map(_.getInt(0)).toSeq == Seq(8))
    // invariant: with rerank >= corpus, the exact re-rank sees every row,
    // so PQ output EQUALS the exact baseline regardless of code quality
    val n = embs.count().toInt
    val exact = graft.operators.similarity.CosineSimilarity
      .annTopK(embs, q, "vec_id", "embedding", "qid", "qv", 5)
      .orderBy("qid", "nrank").collect().map(_.toSeq).toSeq
    val pq = ProductQuantization
      .topK(embs, q, "vec_id", "embedding", "qid", "qv", 5, model, rerank = n)
      .orderBy("qid", "nrank").collect().map(_.toSeq).toSeq
    assert(pq == exact)
    // and the honest approximate regime still finds most true neighbors
    val approx = ProductQuantization
      .topK(embs, q, "vec_id", "embedding", "qid", "qv", 5, model, rerank = 20)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val truth = exact.map(r => (r.head.asInstanceOf[Long], r(2).asInstanceOf[Long])).toSet
    val recall = (approx intersect truth).size.toDouble / truth.size
    assert(recall >= 0.6, s"PQ recall $recall too low at rerank=20")
  }

  test("PQ self-search: query side = full corpus, bounded per-batch driver state") {
    // the unbounded-query-side case the driver-built-tables design OOMed
    // on: every corpus row is also a query. queryBatch=64 forces 8
    // hash-bucketed rounds; per-query results are independent, so the
    // batched union must be bit-identical to the one-batch plan
    import graft.operators.similarity.ProductQuantization
    val embs = spark.read.parquet(s"$sf/embeddings.parquet")
    val q = embs.selectExpr("vec_id as qid", "embedding as qv")
    val model = ProductQuantization.fit(embs, "embedding", m = 8)
    val batched = ProductQuantization
      .topK(embs, q, "vec_id", "embedding", "qid", "qv", 3, model,
        rerank = 20, queryBatch = 64)
      .orderBy("qid", "nrank").collect().map(_.toSeq).toSeq
    val oneShot = ProductQuantization
      .topK(embs, q, "vec_id", "embedding", "qid", "qv", 3, model,
        rerank = 20, queryBatch = 1000000)
      .orderBy("qid", "nrank").collect().map(_.toSeq).toSeq
    assert(batched == oneShot)
    assert(batched.length == embs.count() * 3)
  }

  test("PQ model persists to modelPath and reloads identically") {
    import graft.operators.similarity.ProductQuantization
    val path = Files.createTempDirectory("pq_model").toString + "/model"
    val embs = spark.read.parquet(s"$sf/embeddings.parquet")
    val m1 = ProductQuantization.fitOrLoad(embs, "embedding", modelPath = Some(path))
    assert(Files.exists(Paths.get(path)))
    val m2 = ProductQuantization.fitOrLoad(embs, "embedding", modelPath = Some(path))
    assert(m1.m == m2.m && m1.subDim == m2.subDim)
    assert(m1.codebooks.flatten.flatten.toSeq == m2.codebooks.flatten.flatten.toSeq)
    val q = embs.selectExpr("vec_id as qid", "embedding as qv").filter("qid < 3")
    val a = ProductQuantization.topK(embs, q, "vec_id", "embedding", "qid", "qv", 3, m1)
      .orderBy("qid", "nrank").collect().map(_.toSeq).toSeq
    val b = ProductQuantization.topK(embs, q, "vec_id", "embedding", "qid", "qv", 3, m2)
      .orderBy("qid", "nrank").collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("AnnTopK ivf: cell-pruned search reaches high recall vs exact") {
    val exact = runDF(
      s"""load parquet.`$sf/embeddings.parquet` as embs3;
         |select vec_id as qid, embedding as qv from embs3 where vec_id < 20 as qset3;
         |run embs3 as AnnTopK.`` where queryTable="qset3" and k="5" as exact_ann;
         |select qid, neighbor from exact_ann as out;""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = runDF(
      s"""run embs3 as AnnTopK.`` where queryTable="qset3" and k="5" and method="ivf"
         |  and nlist="8" and nprobe="4" as ivf_ann;
         |select qid, neighbor from ivf_ann as out;""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect ivf).size.toDouble / exact.size
    assert(ivf.nonEmpty)
    assert(recall >= 0.5, s"IVF recall $recall too low vs exact")
  }

  test("binaryFile load + BinaryMetaInPlace sniffs magic bytes and decodes real dims") {
    import graft.operators.multimodal.ImageGen
    val dir = Files.createTempDirectory("graft_bin")
    Files.write(dir.resolve("a.png"), ImageGen.png(40, 30, seed = 1))
    Files.write(dir.resolve("b.jpg"), ImageGen.jpeg(64, 48, seed = 2))
    Files.write(dir.resolve("c.wav"),
      "RIFF0000WAVE".getBytes ++ Array.fill[Byte](64)(1))
    val df = runDF(
      s"""load binaryFile.`$dir` as bins;
         |run bins as BinaryMetaInPlace.`` as meta;
         |select path, media_meta.format as fmt, media_meta.width as w,
         |  media_meta.height as ht, media_meta.size_bytes as sz
         |from meta order by path as out;""".stripMargin)
    val rows = df.collect().map(r => r.getString(0).split("/").last ->
      (r.getString(1), if (r.isNullAt(2)) -1 else r.getInt(2),
        if (r.isNullAt(3)) -1 else r.getInt(3))).toMap
    assert(rows("a.png") == (("png", 40, 30))) // REAL header dims
    assert(rows("b.jpg") == (("jpeg", 64, 48)))
    assert(rows("c.wav") == (("wav", -1, -1))) // no JDK codec -> null dims
  }

  test("binary media -> synthetic-fallback embedding -> ANN dedup composes end-to-end") {
    val dir = Files.createTempDirectory("graft_bin_emb")
    val png = Array[Byte](0x89.toByte, 'P', 'N', 'G', 13, 10, 26, 10) ++
      Array.fill[Byte](64)(7)
    Files.write(dir.resolve("orig.png"), png)
    Files.write(dir.resolve("copy.png"), png) // byte-identical duplicate
    Files.write(dir.resolve("other.jpg"),
      Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xe0.toByte) ++
        Array.fill[Byte](64)(9))
    val df = runDF(
      s"""load binaryFile.`$dir` as emb_bins;
         |run emb_bins as BinaryMetaInPlace.`` where embed="32" as emb_meta;
         |select path, media_meta.content_hash as h, embedding from emb_meta as emb_rows;
         |run emb_rows as SimilarityJoin.`` where idCol="path" and vecCol="embedding"
         |  and threshold="0.999" and method="exact" as emb_pairs;""".stripMargin)
    val pairs = df.select("a_id", "b_id").collect()
      .map(r => Set(r.getString(0).split("/").last, r.getString(1).split("/").last))
    assert(pairs.toSeq == Seq(Set("orig.png", "copy.png")),
      "byte-identical media pair found, unrelated media not paired")
  }

  test("mm_resize: real PNG thumbnail, deterministic, null for undecodable bytes") {
    import graft.operators.multimodal.{ImageCodec, ImageGen}
    graft.operators.multimodal.Multimodal.register(spark)
    import spark.implicits._
    val src = ImageGen.png(128, 96, seed = 11)
    val df = Seq((1L, src)).toDF("id", "content").selectExpr(
      "mm_resize(content, 16, 8) as t1",
      "mm_resize(content, 16, 8) as t2",
      "mm_resize(cast('payload-bytes-here' as binary), 16, 8) as bad")
    val r = df.head()
    val (t1, t2) = (r.getAs[Array[Byte]](0), r.getAs[Array[Byte]](1))
    assert(t1.sameElements(t2), "identical input + dims must resize identically")
    // REAL thumbnail: a decodable PNG at exactly the target dims
    val meta = ImageCodec.readMeta(t1)
    assert(meta.contains(("png", 16, 8)))
    assert(t1.length < src.length, "thumbnail volume shrinks to the target dims")
    assert(r.isNullAt(2), "non-image bytes resize to null, not a fake bitmap")
    // different content must thumbnail differently
    val other = ImageCodec.resizePng(ImageGen.png(128, 96, seed = 12), 16, 8).get
    assert(!other.sameElements(t1))
  }

  test("ImageDedup ET: DSL round-trip over real images") {
    import graft.operators.multimodal.ImageGen
    val dir = Files.createTempDirectory("graft_imgdedup")
    val base = ImageGen.pattern(64, 48, seed = 55)
    Files.write(dir.resolve("x1.png"), ImageGen.encode(base, "png"))
    Files.write(dir.resolve("x2.png"),
      ImageGen.encode(ImageGen.perturb(base, 2, seed = 9), "png"))
    Files.write(dir.resolve("y.png"), ImageGen.png(64, 48, seed = 9999))
    val df = runDF(
      s"""load binaryFile.`$dir` as imgs;
         |select element_at(split(path, '/'), -1) as name, content from imgs as named;
         |run named as ImageDedup.`` where idCol="name" and maxHamming="8" as pairs;
         |select a_id, b_id, hamming from pairs order by a_id, b_id as out;""".stripMargin)
    val pairs = df.collect().map(r => (r.getString(0), r.getString(1)))
    assert(pairs.toSeq == Seq(("x1.png", "x2.png")))
    // hashes mode emits the persistable (id, img_hash) oracle stamp
    val hdf = runDF(
      s"""load binaryFile.`$dir` as imgs2;
         |run imgs2 as ImageDedup.`` where mode="hashes" as hs;
         |select count(*) as n from hs as out;""".stripMargin)
    assert(hdf.head().getLong(0) == 3L)
  }

  test("ImageDedup ET screen mode: feed binaries vs a registered catalog stamp") {
    import graft.operators.multimodal.ImageGen
    val dir = Files.createTempDirectory("graft_imgscreen")
    val base = ImageGen.pattern(64, 48, seed = 77)
    Files.write(dir.resolve("f1.png"),
      ImageGen.encode(ImageGen.perturb(base, 2, seed = 3), "png"))
    Files.write(dir.resolve("f2.png"), ImageGen.png(64, 48, seed = 31415))
    import spark.implicits._
    graft.operators.multimodal.ImageDedup.hashes(
        Seq(("c1", ImageGen.encode(base, "png"))).toDF("id", "content"),
        "id", "content")
      .createOrReplaceTempView("img_catalog")
    val df = runDF(
      s"""load binaryFile.`$dir` as feed;
         |select element_at(split(path, '/'), -1) as name, content from feed as named;
         |run named as ImageDedup.`` where mode="screen" and idCol="name"
         |  and catalogTable="img_catalog" and maxHamming="8" as hits;
         |select feed_id, catalog_id from hits order by feed_id as out;""".stripMargin)
    assert(df.collect().map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("f1.png", "c1")))
  }

  test("VideoScenes ET: shot cuts through the DSL") {
    import graft.operators.multimodal.{AviGen, ImageGen}
    val dir = Files.createTempDirectory("graft_vscenes")
    // two static 2-frame segments: one cut at frame 2
    val segs = Seq(5L, 5L, 9999L, 9999L)
    Files.write(dir.resolve("c.avi"), AviGen.aviFromJpegs(
      segs.map(sd => ImageGen.jpeg(48, 36, sd)), 48, 36))
    val df = runDF(
      s"""load binaryFile.`$dir` as clips;
         |select element_at(split(path, '/'), -1) as name, content from clips as named;
         |run named as VideoScenes.`` where idCol="name" and cutThreshold="10" as sc;
         |select frame_idx, scene_id from sc order by frame_idx as out;""".stripMargin)
    assert(df.collect().map(r => (r.getInt(0), r.getLong(1))).toSeq ==
      Seq((0, 0L), (1, 0L), (2, 1L), (3, 1L)))
  }

  test("AudioFeatures ET: real WAV decode through the DSL") {
    import graft.operators.multimodal.WavGen
    val dir = Files.createTempDirectory("graft_audio")
    Files.write(dir.resolve("sq.wav"), WavGen.square(8000, period = 8, amp = 700))
    Files.write(dir.resolve("n.mp3"), "ID3xxxxxxxxxxxxx".getBytes)
    val df = runDF(
      s"""load binaryFile.`$dir` as clips;
         |run clips as AudioFeatures.`` where hash="true" as feats;
         |select element_at(split(path, '/'), -1) as name,
         |  audio_meta._1 as rate, audio_features._2 as rms,
         |  audio_features._4 as zc, audio_hash
         |from feats order by name as out;""".stripMargin)
    val rows = df.collect().map(r => r.getString(0) -> r).toMap
    val sq = rows("sq.wav")
    assert(sq.getInt(1) == 8000 && sq.getLong(2) == 700L && sq.getLong(3) == 1999L)
    assert(sq.getLong(4) == 0L) // flat envelope -> zero fingerprint
    val mp3 = rows("n.mp3")
    assert(mp3.isNullAt(1) && mp3.isNullAt(2) && mp3.isNullAt(4))
  }

  test("mm_frame_sample slices deterministically") {
    val df = spark.sql(
      "select mm_frame_sample(cast('0123456789abcdef' as binary), 4, 4) as frames")
    val frames = df.head().getSeq[Array[Byte]](0)
    assert(frames.length == 4)
    assert(new String(frames.head) == "0123")
  }

  test("system tables: _mlsql_ ets/datasources/jobs") {
    val ets = runDF("load _mlsql_.`ets` as e; select * from e as out;")
    assert(ets.collect().map(_.getString(0)).contains("Dedup"))
    val ds = runDF("load _mlsql_.`datasources` as d; select * from d as out;")
    assert(ds.collect().map(_.getString(0)).contains("jsonstr"))
    val jobs = runDF("load _mlsql_.`jobs` as j; select * from j as out;")
    assert(jobs.columns.toSeq == Seq("name", "id", "is_active", "kind"))
    // the script reading the table is itself a registered batch job
    assert(jobs.collect().exists(_.getString(3) == "batch"))
  }

  test("modelParams reads saved model metadata") {
    val path = Files.createTempDirectory("graft_mp").toString
    runDF(
      s"""set td = '''{"a":1.0,"label":0.0}
         |{"a":2.0,"label":1.0}''';
         |load jsonStr.`td` as tdt;
         |select vec_dense(array(a)) as features, label from tdt as mp_train;
         |train mp_train as LogisticRegressor.`$path` as ts;""".stripMargin)
    val df = runDF(s"load modelParams.`$path` as mp; select class from mp as out;")
    assert(df.head().getString(0).contains("LogisticRegression"))
  }

  test("unavailable connector fails with actionable message") {
    val e = intercept[UnsupportedOperationException] {
      runDF("load delta.`/tmp/x` as d;")
    }
    assert(e.getMessage.contains("connector jar"))
  }

  test("valueSchema/valueFormat decode json value column on a stream") {
    val ctx = ScriptRunner.run(
      s"""set streamName = "vdec";
         |set vdata = '''{"value":"{\\"a\\":1,\\"b\\":\\"x\\"}","offset":1}
         |{"value":"{\\"a\\":2,\\"b\\":\\"y\\"}","offset":2}''';
         |load jsonStr.`vdata` as vbatch;
         |load mockStream.`vbatch` where valueSchema="a int, b string"
         |  and valueFormat="json" as vstream;
         |save append vstream as memory.`` where mode="append"
         |  and checkpointLocation="${Files.createTempDirectory("ck_v")}";""".stripMargin,
      spark)
    val q = ctx.streams("vdec")
    q.processAllAvailable(); q.stop()
    val out = spark.table("vdec")
    assert(out.columns.toSeq == Seq("a", "b", "kafkaValue"))
    assert(out.count() == 2)
    val decoded = out.orderBy("a").collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(decoded == Seq((1, "x"), (2, "y")))
  }

  test("IteratorCommand executes a templated statement per row") {
    runDF(
      s"""set iterdata = '''{"tname":"it_a","v":1}
         |{"tname":"it_b","v":2}''';
         |load jsonStr.`iterdata` as itert;
         |run itert as IteratorCommand.`` where sql='''select $${v} as v as $${tname}''' as itdone;""".stripMargin)
    assert(spark.table("it_a").head().get(0).toString == "1")
    assert(spark.table("it_b").head().get(0).toString == "2")
  }

  test("unavailable ETs fail with what is missing") {
    val e = intercept[UnsupportedOperationException] {
      runDF("run command as KafkaCommand.`` as k;")
    }
    assert(e.getMessage.contains("kafka"))
  }

  test("Decontaminate ET cleans train docs overlapping the eval table") {
    val df = runDF(
      """set trn = '''{"doc_id":1,"text":"alpha beta gamma delta epsilon zeta eta theta"}
        |{"doc_id":2,"text":"one two three four five six seven eight"}''';
        |set ev = '''{"doc_id":10,"text":"xx alpha beta gamma delta epsilon zeta eta theta yy"}''';
        |load jsonStr.`trn` as trn_t;
        |load jsonStr.`ev` as ev_t;
        |run trn_t as Decontaminate.`` where evalTable="ev_t" as cleaned;
        |select doc_id from cleaned as out;""".stripMargin)
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("Decontaminate ET bloom mode flags through the BF prefilter path") {
    val df = runDF(
      """set trnb = '''{"doc_id":1,"text":"alpha beta gamma delta epsilon zeta eta theta"}
        |{"doc_id":2,"text":"one two three four five six seven eight"}''';
        |set evb = '''{"doc_id":10,"text":"xx alpha beta gamma delta epsilon zeta eta theta yy"}''';
        |load jsonStr.`trnb` as trnb_t;
        |load jsonStr.`evb` as evb_t;
        |run trnb_t as Decontaminate.`` where evalTable="evb_t" and mode="bloom"
        |  and fpp="0.05" as flagged_b;
        |select doc_id, n_overlap from flagged_b as out;""".stripMargin)
    assert(df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 1L)))
  }

  test("RepetitionInPlace and PiiScrubInPlace ETs append their columns") {
    val df = runDF(
      """set pp = '''{"doc_id":1,"text":"spam spam spam spam mail me bob@x.org now"}''';
        |load jsonStr.`pp` as pp_t;
        |run pp_t as RepetitionInPlace.`` as rep;
        |run rep as PiiScrubInPlace.`` as scrubbed;
        |select doc_id, dup_ngram_ratio, n_emails, text_scrubbed from scrubbed as out;""".stripMargin)
    val r = df.head()
    assert(r.getAs[Double]("dup_ngram_ratio") > 0.0)
    assert(r.getAs[Long]("n_emails") == 1L)
    assert(r.getAs[String]("text_scrubbed").contains("<EMAIL>"))
    assert(!r.getAs[String]("text_scrubbed").contains("bob@x.org"))
  }

  test("!streamJobs macro lists and !killStream stops a query") {
    val ctx = ScriptRunner.run(
      s"""set streamName = "managed1";
         |load parquet.`$sf/region.parquet` as r_mgr;
         |load mockStream.`r_mgr` as r_ms;
         |save append r_ms as memory.`` where mode="append"
         |  and checkpointLocation="${Files.createTempDirectory("ck_m")}";""".stripMargin,
      spark)
    val jobs = runDF("!streamJobs;")
    assert(jobs.collect().map(_.getString(0)).contains("managed1"))
    runDF("!killStream managed1;")
    assert(!spark.streams.active.exists(_.name == "managed1"))
  }

  test("CorpusMix up-samples with integer copies and is deterministic") {
    val df = runDF(
      s"""load parquet.`$sf/documents.parquet` as cm_docs;
         |run cm_docs as CorpusMix.`` where weights="en:3.0,de:0.0" as cm_out;
         |select lang, count(*) as n, count(distinct doc_id) as nd,
         |  max(copy_idx) as mx from cm_out group by lang order by lang as out;""".stripMargin)
    val byLang = df.collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // w=3.0: every en doc exactly 3 copies; w=0.0: de fully dropped
    assert(!byLang.contains("de"))
    val (enN, enD, enMx) = byLang("en")
    assert(enN == enD * 3 && enMx == 3L)
    // default 1x domains: one copy each
    byLang.filterKeys(k => k != "en").values.foreach { case (n, nd, mx) =>
      assert(n == nd && mx == 1L)
    }
    // determinism: a second run yields the identical multiset of rows
    def rows() = runDF(
      s"""load parquet.`$sf/documents.parquet` as cm_docs2;
         |run cm_docs2 as CorpusMix.`` where weights="en:3.0,de:0.0" as cm2;
         |select doc_id, copy_idx from cm2 order by doc_id, copy_idx as out2;""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows() == rows())
  }

  test("CorpusSplit groups co-assign; partition-layout independent") {
    val df = runDF(
      s"""load parquet.`$sf/documents.parquet` as cs_docs;
         |select *, md5(text) as grp from cs_docs as cs_g;
         |run cs_g as CorpusSplit.`` where splits="train:8,valid:1,test:1"
         |  and groupCol="grp" as cs_out;
         |select grp, count(distinct split) as ns from cs_out group by grp as out;""".stripMargin)
    // leakage safety: every group lives in exactly one split
    assert(df.collect().forall(_.getLong(1) == 1L))
    // weights normalize (8/1/1 = 0.8/0.1/0.1) and roughly hold
    val byName = runDF("select split, count(*) as n from cs_out group by split as o2;")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = byName.values.sum.toDouble
    assert(math.abs(byName("train") / total - 0.8) < 0.06, s"$byName")
    assert(byName.keySet == Set("train", "valid", "test"))
    // determinism is identity-based: a repartitioned input assigns identically
    import org.apache.spark.sql.functions.{col, md5}
    val base = spark.read.parquet(s"$sf/documents.parquet")
      .withColumn("grp", md5(col("text")))
    def assign(d: org.apache.spark.sql.DataFrame) =
      graft.operators.sampling.CorpusSplit.split(d, "doc_id",
          Seq("train" -> 8.0, "valid" -> 1.0, "test" -> 1.0),
          groupCol = Some("grp"))
        .select("doc_id", "split").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(assign(base) == assign(base.repartition(7, col("lang"))))
  }

  test("CorpusSplit neardup: no near-dup pair straddles splits") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"))
    val out = graft.operators.sampling.CorpusSplit.splitByNearDup(
      docs, "doc_id", "text",
      Seq("train" -> 0.9, "test" -> 0.1), threshold = 0.7)
    val splitOf = out.select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(splitOf.size == docs.count(), "split preserves every row once")
    val sh = graft.operators.dedup.TextDedup.shingles(docs, "doc_id", "text", 3)
    val pairs = graft.operators.dedup.TextDedup.minHashSelfJoin(sh, 0.7)
      .select("a_id", "b_id").collect()
    assert(pairs.nonEmpty, "fixture must actually contain near-dup pairs")
    pairs.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      assert(splitOf(a) == splitOf(b), s"pair ($a,$b) straddles splits")
    }
  }

  test("DocChunk chars: stride/overlap invariants, short tail, null/empty dropped") {
    import spark.implicits._
    val docs = Seq(
      (1L, "abcdefghij"),   // len 10: starts 0,3,6,9 at size=4/overlap=1
      (2L, "xy"),           // shorter than size: one whole chunk
      (3L, ""),             // empty: no chunks
      (4L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val out = graft.operators.text.DocChunk
      .chunkByChars(docs, "text", size = 4, overlap = 1)
    assert(!out.columns.contains("text"), "text column must be dropped")
    val rows = out.orderBy("doc_id", "chunk_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    assert(rows.toSeq == Seq(
      (1L, 0, "abcd"), (1L, 1, "defg"), (1L, 2, "ghij"), (1L, 3, "j"),
      (2L, 0, "xy")))
    // consecutive chunks share exactly `overlap` chars; stride slices rebuild the doc
    assert(rows.filter(_._1 == 1L).sliding(2).forall {
      case Array((_, _, a), (_, _, b)) => a.takeRight(1) == b.take(1)
      case _ => true
    })
    assert(rows.filter(_._1 == 1L).map(_._3.take(3)).mkString.take(10) == "abcdefghij")
  }

  test("DocChunk tokens: windows over whitespace-normalized token stream") {
    import spark.implicits._
    val docs = Seq(
      (1L, "  one two\tthree\nfour five  "),
      (2L, "   \t  ") // whitespace-only: no chunks
    ).toDF("doc_id", "text")
    val out = graft.operators.text.DocChunk
      .chunkByTokens(docs, "text", size = 3, overlap = 1)
      .orderBy("doc_id", "chunk_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    assert(out.toSeq == Seq(
      (1L, 0, "one two three"), (1L, 1, "three four five"), (1L, 2, "five")))
  }

  test("DocChunk DSL surface chunks the documents table shuffle-free") {
    val df = runDF(
      s"""load parquet.`$sf/documents.parquet` as dc_docs;
         |run dc_docs as DocChunk.`` where size="128" and overlap="32"
         |  and unit="tokens" as dc_out;""".stripMargin)
    assert(df.count() >= spark.table("dc_docs").count(),
      "every non-empty doc yields at least one chunk")
    // shuffle-free plan: a generate over the scan, no Exchange
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
  }

  test("GroupCap keeps exactly min(cap, n) per group; layout-independent") {
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val before = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(before.values.exists(_ > 7), "fixture needs an over-cap group")
    def run(d: org.apache.spark.sql.DataFrame) =
      graft.operators.sampling.GroupCap.capPerGroup(d, "lang", cap = 7,
        idCol = "doc_id", seed = 3L)
    val out = run(docs)
    val after = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(after == before.map { case (g, n) => g -> math.min(7L, n) })
    // identity-keyed draw: same survivors on any partitioning
    def ids(d: org.apache.spark.sql.DataFrame) =
      d.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids(out) == ids(run(docs.repartition(13, col("source")))))
    assert(out.columns.toSeq == docs.columns.toSeq, "schema passes through")
  }

  test("GroupCap: null group is its own stratum") {
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, "a"), (3L, "a"),
      (4L, null.asInstanceOf[String]), (5L, null.asInstanceOf[String]))
      .toDF("doc_id", "g")
    val out = graft.operators.sampling.GroupCap
      .capPerGroup(df, "g", cap = 2, idCol = "doc_id")
    val byG = out.collect().groupBy(r => Option(r.getString(1)))
      .view.mapValues(_.length).toMap
    assert(byG == Map(Some("a") -> 2, None -> 2))
  }

  test("GroupCap orderCol keeps the best-N per group; equals single-window top-k") {
    import org.apache.spark.sql.functions.{col, row_number}
    import org.apache.spark.sql.expressions.Window
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val out = graft.operators.sampling.GroupCap
      .capPerGroupBy(docs, "lang", cap = 4, orderCol = "n_chars",
        descending = true, idCol = "doc_id")
    val naive = docs.withColumn("__rn__", row_number().over(
        Window.partitionBy("lang")
          .orderBy(col("n_chars").desc_nulls_last, col("doc_id"))))
      .filter(col("__rn__") <= 4).drop("__rn__")
    def key(d: org.apache.spark.sql.DataFrame) =
      d.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(key(out) == key(naive))
    assert(key(out) == key(graft.operators.sampling.GroupCap
      .capPerGroupBy(docs.repartition(9, col("source")), "lang", 4,
        "n_chars", descending = true, idCol = "doc_id")),
      "two-phase selection is partition-layout independent")
  }

  test("GroupCap DSL surface caps per source") {
    val df = runDF(
      s"""load parquet.`$sf/documents.parquet` as gc_docs;
         |run gc_docs as GroupCap.`` where groupCol="source" and cap="5" as gc_out;
         |select source, count(*) as n from gc_out group by source as out;""".stripMargin)
    assert(df.collect().forall(_.getLong(1) <= 5L))
  }

  test("CorpusShuffle: deterministic permutation, layout-independent, top-k plan") {
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    def order(d: org.apache.spark.sql.DataFrame, seed: Long) =
      graft.operators.sampling.CorpusShuffle.shuffle(d, "doc_id", seed)
        .select("doc_id").collect().map(_.getLong(0)).toSeq
    val o1 = order(docs, 9L)
    assert(o1.sorted == docs.select("doc_id").collect().map(_.getLong(0)).toSeq.sorted,
      "shuffle is a permutation — same multiset of rows")
    assert(o1 == order(docs.repartition(11, col("lang")), 9L),
      "identity-keyed order is partition-layout independent")
    assert(o1 != order(docs, 10L), "different seed gives a different epoch order")
    assert(o1 != o1.sorted, "shuffled order is not the ingest order")
    // prefix consumption is a distributed top-k, not a full global sort
    val plan = graft.operators.sampling.CorpusShuffle.shuffle(docs, "doc_id", 9L)
      .limit(25).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"expected top-k plan:\n$plan")
  }

  test("TokenBudget keeps the maximal whole-doc prefix of the shuffle order") {
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    def take(d: org.apache.spark.sql.DataFrame, b: Long) =
      graft.operators.sampling.TokenBudget.take(d, "doc_id", "n_chars", b, seed = 2L)
    val out = take(docs, 5000L)
    val used = out.agg(org.apache.spark.sql.functions.sum("n_chars"))
      .collect().head.getLong(0)
    assert(used <= 5000L, s"budget overshot: $used")
    // maximality: the next doc in shuffle order would overshoot
    val order = graft.operators.sampling.CorpusShuffle
      .shuffle(docs, "doc_id", 2L).select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val kept = out.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(order.map(_._1).takeWhile(kept).toSet == kept,
      "kept docs are a PREFIX of the shuffle order")
    val next = order.drop(kept.size).headOption
    next.foreach { case (_, c) => assert(used + c > 5000L, "prefix is maximal") }
    // layout independence
    assert(take(docs.repartition(17, col("lang")), 5000L)
      .select("doc_id").collect().map(_.getLong(0)).toSet == kept)
    // degenerate budgets
    assert(take(docs, 0L).count() == 0L)
    assert(take(docs, Long.MaxValue / 4).count() == docs.count())
  }

  test("TokenBudget per-group budgets: each component capped, unlisted dropped") {
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    def run(d: org.apache.spark.sql.DataFrame) =
      graft.operators.sampling.TokenBudget.takePerGroup(
        d, "lang", "doc_id", "n_chars",
        budgets = Map("en" -> 6000L, "zh" -> 2000L), seed = 4L)
    val out = run(docs)
    val used = out.groupBy("lang")
      .agg(org.apache.spark.sql.functions.sum("n_chars").as("s"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(used.keySet == Set("en", "zh"), s"unlisted langs dropped: $used")
    assert(used("en") <= 6000L && used("zh") <= 2000L, s"$used")
    assert(used("en") > 0L && used("zh") > 0L)
    // per-group prefix semantics match the global operator run per slice
    val enOnly = graft.operators.sampling.TokenBudget.take(
      docs.filter(col("lang") === "en"), "doc_id", "n_chars", 6000L, seed = 4L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(out.filter(col("lang") === "en").select("doc_id")
      .collect().map(_.getLong(0)).toSet == enOnly)
    // layout independence
    assert(run(docs.repartition(19, col("source"))).select("doc_id")
      .collect().map(_.getLong(0)).toSet ==
      out.select("doc_id").collect().map(_.getLong(0)).toSet)
  }

  test("CorpusShuffle and TokenBudget DSL surfaces compose in one script") {
    val df = runDF(
      s"""load parquet.`$sf/documents.parquet` as tb_docs;
         |run tb_docs as TokenBudget.`` where tokenCol="n_chars"
         |  and budget="8000" and seed="2" as tb_take;
         |run tb_take as CorpusShuffle.`` where seed="2" as tb_shuffled;
         |select doc_id, n_chars from tb_shuffled as out;""".stripMargin)
    val rows = df.collect()
    assert(rows.map(_.getLong(1)).sum <= 8000L, "budget respected through the DSL")
    assert(rows.nonEmpty)
    // the shuffle pass re-orders but never changes membership
    val direct = graft.operators.sampling.TokenBudget.take(
      spark.read.parquet(s"$sf/documents.parquet"), "doc_id", "n_chars",
      8000L, seed = 2L).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(rows.map(_.getLong(0)).toSet == direct)
  }

  test("ImportanceSelect DSL surface matches the direct operator") {
    val df = runDF(
      s"""load parquet.`$sf/documents.parquet` as is_raw;
         |select * from is_raw where lang = "en" as is_target;
         |run is_raw as ImportanceSelect.`` where targetTable="is_target"
         |  and mode="select" and k="10" as is_sel;
         |select doc_id, n_grams, log_w from is_sel as out;""".stripMargin)
    val viaDsl = df.collect().map(_.getLong(0)).toSeq
    val raw = spark.read.parquet(s"$sf/documents.parquet")
    val direct = graft.operators.sampling.ImportanceSelect
      .select(raw, raw.filter(org.apache.spark.sql.functions.col("lang") === "en"),
        "doc_id", "text", k = 10)
      .collect().map(_.getLong(0)).toSeq
    assert(viaDsl == direct)
    assert(viaDsl.length == 10)
  }

  test("ShardExport DSL surface writes one file per shard and returns the manifest") {
    val out = Files.createTempDirectory("graft_et_shards").toString + "/shards"
    val df = runDF(
      s"""load parquet.`$sf/documents.parquet` as se_docs;
         |run se_docs as ShardExport.`$out` where rowsPerShard="100" as se_manifest;
         |select shard, n_rows from se_manifest order by shard as out;""".stripMargin)
    val rows = df.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.nonEmpty && rows.init.forall(_._2 == 100L))
    assert(new java.io.File(s"$out/shard=0").listFiles()
      .count(_.getName.endsWith(".parquet")) == 1)
  }

  test("BoilerplateClean DSL surface strips corpus-frequent lines; mode=frequent lists them") {
    val script =
      """set bp = '''{"doc_id":1,"text":"SHARED HEADER\nbody one"}
        |{"doc_id":2,"text":"SHARED HEADER\nbody two"}
        |{"doc_id":3,"text":"SHARED HEADER\nbody three"}''';
        |load jsonStr.`bp` as bpt;""".stripMargin
    val cleaned = runDF(script +
      """
        |run bpt as BoilerplateClean.`` where minDocs="2" as bp_clean;
        |select doc_id, text_clean, n_lines, n_kept from bp_clean order by doc_id as out;""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(cleaned.toSeq == Seq((1L, "body one", 2L, 1L),
      (2L, "body two", 2L, 1L), (3L, "body three", 2L, 1L)))
    val freq = runDF(script +
      """
        |run bpt as BoilerplateClean.`` where minDocs="2" and mode="frequent" as bp_freq;
        |select line, n_docs from bp_freq as out;""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(freq.toSeq == Seq(("SHARED HEADER", 3L)))
  }

  test("batched featurizer matches the scalar mm_embed path exactly") {
    import spark.implicits._
    import graft.operators.multimodal.Multimodal
    Multimodal.register(spark)
    val df = (1 to 150).map(i => (i.toLong, Array.fill[Byte](32)((i % 11).toByte)))
      .toDF("id", "content")
    def collectEmb(d: org.apache.spark.sql.DataFrame): Map[Long, Seq[Float]] =
      d.select("id", "embedding").collect()
        .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val scalar = collectEmb(Multimodal.withEmbedding(df, "content", 16))
    // batchSize=7 does not divide 150: the tail partial batch is exercised
    val batched = collectEmb(Multimodal.withEmbeddingBatched(df, "content", 16, 7))
    assert(batched == scalar)
    assert(batched.values.forall(_.length == 16))
    // and through the DSL surface
    val viaDsl = runDF(
      """select cast(1 as long) as id, cast('abc' as binary) as content as bmb_in;
        |run bmb_in as BinaryMetaInPlace.`` where embed="8" and embedBatch="4" as bmb_out;
        |select id, embedding from bmb_out as out;""".stripMargin)
    assert(viaDsl.head().getSeq[Float](1).length == 8)
  }

  test("video path composes in SQL: frame sample -> per-frame embed -> mean pool") {
    import graft.operators.multimodal.Multimodal
    Multimodal.register(spark)
    // 4 evenly spaced 16-byte frames from a 128-byte blob, each embedded,
    // mean-pooled to one clip vector — the temporal-pooling shape of a
    // video encoder, entirely as composable SQL over the registered UDFs
    val df = spark.sql(
      """SELECT clip_id, aggregate(frames, array_repeat(0.0F, 8),
        |  (acc, f) -> zip_with(acc, mm_embed(f, 8), (a, b) -> a + b),
        |  acc -> transform(acc, x -> x / size(frames))) AS clip_vec,
        |  size(frames) AS n_frames
        |FROM (SELECT 1L AS clip_id,
        |  mm_frame_sample(CAST(repeat('ab', 64) AS BINARY), 4, 16) AS frames)""".stripMargin)
    val r = df.head()
    assert(r.getInt(2) == 4)
    // division promotes to double: the pooled clip vector is array<double>
    val vec = r.getSeq[Double](1)
    assert(vec.length == 8 && vec.exists(_ != 0.0))
    // deterministic: same clip bytes -> same pooled vector
    assert(df.head().getSeq[Double](1) == vec)
  }

  test("C4Rules DSL surface: padded badPhrases entries are trimmed, empty disables") {
    val base =
      """set c4d = '''{"doc_id":1,"text":"A proper sentence with a brace { inside it."}''';
        |load jsonStr.`c4d` as c4t;""".stripMargin
    def pass(params: String): Boolean = runDF(base +
      s"""
         |run c4t as C4Rules.`` where minSentences="1" $params as c4o;
         |select c4_pass from c4o as out;""".stripMargin).head().getBoolean(0)
    assert(!pass(""))                                    // default blocklist hits '{'
    assert(!pass("""and badPhrases=" lorem ipsum , { """"))  // padded entries trimmed
    assert(pass("""and badPhrases="""""))                // empty string disables cleanly
  }

  test("CorpusMix fractional weight keeps E[copies] near w") {
    import spark.implicits._
    import org.apache.spark.sql.functions.lit
    val docs = spark.range(10000).select($"id".as("doc_id"), lit("en").as("lang"))
    val out = graft.operators.sampling.CorpusMix.mix(
      docs.toDF(), "lang", Map("en" -> 0.5), "doc_id")
    val share = out.count().toDouble / 10000
    assert(math.abs(share - 0.5) < 0.03, s"share $share far from 0.5")
  }

  test("SubseqSearch DSL surface: topk finds the planted ramp; windows emits vectors") {
    val out = graft.dsl.ScriptRunner.runToDF(
      """set ss = '''{"user_id":1,"ts":1,"event_id":1,"value":5.0}
        |{"user_id":1,"ts":2,"event_id":2,"value":1.0}
        |{"user_id":1,"ts":3,"event_id":3,"value":2.0}
        |{"user_id":1,"ts":4,"event_id":4,"value":3.0}
        |{"user_id":1,"ts":5,"event_id":5,"value":4.0}
        |{"user_id":1,"ts":6,"event_id":6,"value":0.0}''';
        |load jsonStr.`ss` as ss_events;
        |run ss_events as SubseqSearch.`` where query="1,2,3,4" and k="2"
        |  and tieCol="event_id" as ss_top;
        |select * from ss_top as out;""".stripMargin, spark)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // the planted exact ramp at start 1 wins with distance 0
    assert(out.head == ((1L, 1L, 0.0)), out.mkString(";"))
    val win = graft.dsl.ScriptRunner.runToDF(
      """set sw = '''{"user_id":1,"ts":1,"event_id":1,"value":1.0}
        |{"user_id":1,"ts":2,"event_id":2,"value":2.0}
        |{"user_id":1,"ts":3,"event_id":3,"value":3.0}''';
        |load jsonStr.`sw` as sw_events;
        |run sw_events as SubseqSearch.`` where mode="windows" and m="2"
        |  and tieCol="event_id" as sw_w;
        |select * from sw_w as out;""".stripMargin, spark)
      .collect()
    assert(win.length == 2 && win.forall(_.getSeq[Double](2).length == 2))
  }

  test("Funnel DSL surface: users and summary modes") {
    val script =
      """set fe = '''{"user_id":1,"ts":"2026-01-01 00:00:01","event_type":"view"}
        |{"user_id":1,"ts":"2026-01-01 00:00:02","event_type":"click"}
        |{"user_id":2,"ts":"2026-01-01 00:00:03","event_type":"view"}''';
        |load jsonStr.`fe` as fe_events;
        |select user_id, cast(ts as timestamp) as ts, event_type
        |  from fe_events as fe2;
        |run fe2 as Funnel.`` where steps="view,click" and mode="%s" as fout;
        |select * from fout as out;""".stripMargin
    val users = graft.dsl.ScriptRunner.runToDF(script.format("users"), spark)
      .collect().map(r => r.getLong(0) -> r.getInt(r.length - 1)).toMap
    assert(users == Map(1L -> 2, 2L -> 1))
    val summ = graft.dsl.ScriptRunner.runToDF(script.format("summary"), spark)
      .collect().map(r => (r.getString(1), r.getLong(2))).toSeq
    assert(summ == Seq(("view", 2L), ("click", 1L)))
  }

  test("SeasonalDecompose DSL surface: resid 0 on an exact trend+pattern series") {
    val rows = (0 until 12).map(t =>
      s"""{"k":"a","t":$t,"v":${10 + t + (if (t % 2 == 0) 3 else -3)}}""")
      .mkString("\n")
    val out = graft.dsl.ScriptRunner.runToDF(
      s"""set sd = '''$rows''';
         |load jsonStr.`sd` as sd_series;
         |run sd_series as SeasonalDecompose.`` where period="2" as sdo;
         |select t, resid from sdo where resid is not null as out;""".stripMargin,
      spark).collect()
    assert(out.nonEmpty && out.forall(_.getDouble(1) == 0.0), out.mkString(";"))
  }

  test("Retention/Transitions/PageRank DSL surfaces dispatch") {
    val ret = graft.dsl.ScriptRunner.runToDF(
      """set re = '''{"user_id":1,"ts":"2026-01-01 00:00:00"}
        |{"user_id":1,"ts":"2026-01-02 00:00:00"}
        |{"user_id":2,"ts":"2026-01-01 12:00:00"}''';
        |load jsonStr.`re` as re_events;
        |select user_id, cast(ts as timestamp) as ts from re_events as re2;
        |run re2 as Retention.`` where periodSec="86400" as ro;
        |select * from ro order by cohort, offset as out;""".stripMargin, spark)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(ret.toSeq == Seq((20454L, 0L, 2L), (20454L, 1L, 1L)), ret.mkString(";"))
    val tr = graft.dsl.ScriptRunner.runToDF(
      """set te = '''{"user_id":1,"ts":1,"event_type":"a"}
        |{"user_id":1,"ts":2,"event_type":"b"}''';
        |load jsonStr.`te` as te_events;
        |run te_events as Transitions.`` as tro;
        |select * from tro as out;""".stripMargin, spark).collect()
    assert(tr.length == 1 && tr.head.getString(0) == "a" && tr.head.getString(1) == "b")
    val pr = graft.dsl.ScriptRunner.runToDF(
      """set pe = '''{"src":"a","dst":"b"}
        |{"src":"b","dst":"a"}''';
        |load jsonStr.`pe` as pe_edges;
        |run pe_edges as PageRankFixed.`` where iterations="2" as pro;
        |select * from pro as out;""".stripMargin, spark)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(pr == Map("a" -> 500000000000L, "b" -> 500000000000L), pr.toString)
  }

  test("WordPiece DSL surface: inline vocab and vocabTable paths agree") {
    val inline = graft.dsl.ScriptRunner.runToDF(
      """set wp = '''{"doc_id":1,"text":"undo xq"}''';
        |load jsonStr.`wp` as wp_docs;
        |run wp_docs as WordPiece.`` where vocab="un,##do,x" as wo;
        |select doc_id, wp_pieces, n_unk from wo as out;""".stripMargin, spark)
      .collect()
    assert(inline.head.getSeq[String](1) == Seq("un", "##do", "[UNK]"))
    assert(inline.head.getLong(2) == 1L)
    val viaTable = graft.dsl.ScriptRunner.runToDF(
      """set vt = '''{"piece":"un"}
        |{"piece":"##do"}
        |{"piece":"x"}''';
        |load jsonStr.`vt` as wp_vocab;
        |set wp2 = '''{"doc_id":1,"text":"undo xq"}''';
        |load jsonStr.`wp2` as wp_docs2;
        |run wp_docs2 as WordPiece.`` where vocabTable="wp_vocab" as wo2;
        |select wp_pieces from wo2 as out;""".stripMargin, spark).collect()
    assert(viaTable.head.getSeq[String](0) == Seq("un", "##do", "[UNK]"))
  }

  test("MarketBasket and Paths DSL surfaces dispatch") {
    val mb = graft.dsl.ScriptRunner.runToDF(
      """set mb = '''{"order_id":1,"item":1}
        |{"order_id":1,"item":2}
        |{"order_id":2,"item":1}
        |{"order_id":2,"item":2}''';
        |load jsonStr.`mb` as mb_rows;
        |run mb_rows as MarketBasket.`` where minSupport="2" as mbo;
        |select * from mbo as out;""".stripMargin, spark).collect()
    assert(mb.length == 1 && mb.head.getLong(2) == 2L)
    val pa = graft.dsl.ScriptRunner.runToDF(
      """set pa = '''{"user_id":1,"ts":1,"event_type":"a"}
        |{"user_id":1,"ts":2,"event_type":"b"}''';
        |load jsonStr.`pa` as pa_rows;
        |run pa_rows as Paths.`` where k="2" and topN="5" as pao;
        |select * from pao as out;""".stripMargin, spark).collect()
    assert(pa.length == 1 && pa.head.getString(0) == "a>b")
  }

  test("Profile DSL surface: all columns by default") {
    val out = graft.dsl.ScriptRunner.runToDF(
      """set pf = '''{"a":1,"b":"x"}
        |{"a":2,"b":"y"}''';
        |load jsonStr.`pf` as pf_rows;
        |run pf_rows as Profile.`` as pfo;
        |select * from pfo order by column as out;""".stripMargin, spark)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(3))).toMap
    assert(out == Map("a" -> ((2L, 2L)), "b" -> ((2L, 2L))))
  }

  test("Ewma DSL surface dispatches the segmented scan") {
    val out = graft.dsl.ScriptRunner.runToDF(
      """set ew = '''{"k":"a","t":0,"v":4.0}
        |{"k":"a","t":1,"v":8.0}''';
        |load jsonStr.`ew` as ew_rows;
        |run ew_rows as Ewma.`` where alpha="0.5" as ewo;
        |select t, s from ewo order by t as out;""".stripMargin, spark)
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    assert(out.toSeq == Seq(0L -> 4.0, 1L -> 6.0))
  }

  test("Triangles DSL surface dispatches the census") {
    val out = graft.dsl.ScriptRunner.runToDF(
      """set tg = '''{"src":1,"dst":2}
        |{"src":2,"dst":3}
        |{"src":1,"dst":3}''';
        |load jsonStr.`tg` as tg_edges;
        |run tg_edges as Triangles.`` as tgo;
        |select node, n_tri from tgo order by node as out;""".stripMargin, spark)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(out.toSeq == Seq(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("LabelPropagation DSL surface dispatches") {
    val out = graft.dsl.ScriptRunner.runToDF(
      """set lp = '''{"src":1,"dst":2}
        |{"src":2,"dst":3}''';
        |load jsonStr.`lp` as lp_edges;
        |run lp_edges as LabelPropagation.`` where iterations="1" as lpo;
        |select node, label from lpo order by node as out;""".stripMargin, spark)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 2L, 2L -> 1L, 3L -> 2L))
  }

  test("Holt DSL surface dispatches the 2x2 segmented scan") {
    val out = graft.dsl.ScriptRunner.runToDF(
      """set ho = '''{"k":"a","t":0,"v":10.0}
        |{"k":"a","t":1,"v":12.0}''';
        |load jsonStr.`ho` as ho_rows;
        |run ho_rows as Holt.`` where alpha="0.5" and beta="0.5" as hoo;
        |select t, l, b from hoo order by t as out;""".stripMargin, spark)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    // l1=10,b1=0; l2=0.5*12+0.5*10=11, b2=0.5*(11-10)+0.5*0=0.5
    assert(out.toSeq == Seq((0L, 10.0, 0.0), (1L, 11.0, 0.5)))
  }

  test("Twap DSL surface dispatches") {
    val out = graft.dsl.ScriptRunner.runToDF(
      """set tw = '''{"k":1,"ts":"2026-01-01 00:00:00","v":4.0}
        |{"k":1,"ts":"2026-01-01 00:00:10","v":8.0}''';
        |load jsonStr.`tw` as tw_rows;
        |select k, cast(ts as timestamp) as ts, v from tw_rows as tw2;
        |run tw2 as Twap.`` as two;
        |select twap from two as out;""".stripMargin, spark).collect()
    assert(out.head.getDouble(0) == 4.0) // v=4 held the whole span
  }

  test("RobustOutliers DSL surface dispatches") {
    val rows = (Seq.fill(8)(10.0) :+ 500.0).zipWithIndex
      .map { case (v, i) => s"""{"k":"a","v":$v,"i":$i}""" }.mkString("\n")
    val out = graft.dsl.ScriptRunner.runToDF(
      s"""set ro = '''$rows''';
         |load jsonStr.`ro` as ro_rows;
         |run ro_rows as RobustOutliers.`` as roo;
         |select n_outliers from roo as out;""".stripMargin, spark).collect()
    // MAD = 0 (8 identical values) -> degenerate, nothing flagged
    assert(out.head.getLong(0) == 0L)
  }

  test("Histogram DSL surface: width and depth modes") {
    val rows = (1 to 8).map(i => s"""{"v":$i.0}""").mkString("\n")
    def run(mode: String) = graft.dsl.ScriptRunner.runToDF(
      s"""set hg = '''$rows''';
         |load jsonStr.`hg` as hg_rows;
         |run hg_rows as Histogram.`` where nBuckets="2" and mode="$mode" as hgo;
         |select bucket, n from hgo order by bucket as out;""".stripMargin, spark)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(run("width") == Map(0 -> 4L, 1 -> 4L))
    assert(run("depth") == Map(0 -> 4L, 1 -> 4L))
  }

  test("Scd2 DSL surface dispatches") {
    val out = graft.dsl.ScriptRunner.runToDF(
      """set sc = '''{"user_id":1,"ts":"2026-01-01 00:00:01","tier":"a"}
        |{"user_id":1,"ts":"2026-01-01 00:00:02","tier":"a"}
        |{"user_id":1,"ts":"2026-01-01 00:00:03","tier":"b"}''';
        |load jsonStr.`sc` as sc_rows;
        |select user_id, cast(ts as timestamp) as ts, tier from sc_rows as sc2;
        |run sc2 as Scd2.`` where attrCols="tier" as sco;
        |select version, tier, is_current from sco order by version as out;""".stripMargin,
      spark).collect().map(r => (r.getInt(0), r.getString(1), r.getBoolean(2)))
    assert(out.toSeq == Seq((1, "a", false), (2, "b", true)))
  }

  test("Acf DSL surface dispatches") {
    val rows = (0 until 12).map(t =>
      s"""{"k":"a","t":$t,"v":${if (t % 2 == 0) 9.0 else 1.0}}""").mkString("\n")
    val out = graft.dsl.ScriptRunner.runToDF(
      s"""set ac = '''$rows''';
         |load jsonStr.`ac` as ac_rows;
         |run ac_rows as Acf.`` where maxLag="2" as aco;
         |select lag, r from aco order by lag as out;""".stripMargin, spark)
      .collect().map(r => r.getInt(0) -> r.getDouble(1))
    assert(out.toSeq == Seq(1 -> -1.0, 2 -> 1.0))
  }

  test("AbTest DSL surface dispatches") {
    val rows = (Seq.fill(3)(("A", true)) ++ Seq.fill(1)(("A", false)) ++
      Seq.fill(1)(("B", true)) ++ Seq.fill(3)(("B", false)))
      .map { case (v, c) => s"""{"variant":"$v","converted":$c}""" }.mkString("\n")
    val out = graft.dsl.ScriptRunner.runToDF(
      s"""set ab = '''$rows''';
         |load jsonStr.`ab` as ab_rows;
         |run ab_rows as AbTest.`` as abo;
         |select n_a, k_a, n_b, k_b from abo as out;""".stripMargin, spark)
      .collect().head
    assert((out.getLong(0), out.getLong(1), out.getLong(2), out.getLong(3)) ==
      ((4L, 3L, 4L, 1L)))
  }
}
