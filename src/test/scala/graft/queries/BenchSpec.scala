package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, TestSpark}

/** Physical-plan audits: assert the plans we designed for are the plans
  * Catalyst actually produces — pushdown reaching the scans, broadcast on
  * constant-size dims, no stray cartesian products, codegen on the hot
  * expressions. These are the 100 TB design invariants; a regression here
  * is a perf bug even while results stay correct.
  */
class BenchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("driver contract: entry() returns rows and every query has an entry") {
    assert(SparkEntry.entry(spark).count() > 0)
    assert(SparkEntry.queries.nonEmpty)
    // every oracle key corresponds to a runnable query
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("q2 filter + projection push into the parquet scan") {
    val p = plan("q2_filter_project")
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("l_shipdate"), p)
    // pruned read schema: no unused wide columns like l_comment
    assert(!p.contains("l_comment"), p)
  }

  test("q30 star join broadcasts the constant-size dims") {
    val p = plan("q30_star_join")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q1 agg keeps partial aggregation (map-side combine)") {
    val p = plan("q1_agg")
    assert(p.contains("HashAggregate"), p)
    assert(p.toLowerCase.contains("partial"), p)
  }

  test("p1 exact dedup is a single hash aggregation, no join") {
    val p = plan("p1_dedup_exact")
    assert(p.contains("HashAggregate"), p)
    assert(!p.contains("Join"), p)
  }

  test("p7 ANN broadcasts the query side, corpus not shuffled") {
    val p = plan("p7_ann_bruteforce")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
  }

  test("p9 jaccard plan has no self-join of the inverted index") {
    val p = plan("p9_ngram_jaccard")
    // posting-list formulation: joins only against the per-doc counts
    assert(p.contains("HashAggregate"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("p8 ivf self-join plans as equi-joins — no BroadcastNestedLoopJoin, no cartesian") {
    val p = plan("p8_neardup_embedding")
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), p)
  }

  test("p85 bloom decontamination: BF prefilter sits on the corpus side BEFORE the confirm join") {
    val p = plan("p85_decontaminate_bloom")
    // the scan-speed prefilter is a plain Filter over the exploded corpus
    // shingles (a UDF over the broadcast BF), then an equi confirm join.
    // At fixture scale AQE broadcasts the tiny eval side — fine; what the
    // mode guarantees is the EQUI join shape (never cartesian), so at
    // real scale the planner is free to shuffle both post-BF slivers
    assert(p.contains("Filter"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), p)
  }

  test("p86 semdedup cells: within-cell pairs plan as ONE equi-join on the cell key") {
    val p = plan("p86_semdedup_cells")
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), p)
  }

  test("p11 minhash banding joins on an equi band key") {
    val p = plan("p11_minhash_lsh")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), p)
  }

  test("p87 bm25: query terms broadcast against the postings — no cartesian") {
    val p = plan("p87_bm25_topk")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastHashJoin"), p) // qt and dfq probe sides
    // the only nested-loop join allowed is the broadcast Cross of the
    // 1-row (n_docs, avgdl) stats aggregate
    assert(p.linesIterator.filter(_.contains("BroadcastNestedLoopJoin"))
      .forall(_.contains("Cross")), p)
  }

  test("p89 mmr: every greedy round joins on the query id — no cartesian") {
    val p = plan("p89_mmr_rerank")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("p105 linkage: inverted-index equi-join on the gram key, no cartesian") {
    val p = plan("p105_fuzzy_linkage")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    // the verify stage runs the THRESHOLD levenshtein (O(d*len), not
    // O(len^2)) — the 3-arg form shows its bound in the plan
    assert(p.contains("levenshtein"), p)
  }

  test("p109 jw best match: same blocking shape, windowed argmax on l_id") {
    val p = plan("p109_jw_best_match")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("jaro_winkler_similarity"), p)
  }

  test("p106 kcore / p107 bfs / p108 trustrank: loop frames are checkpointed scans, equi-joins only") {
    for (name <- Seq("p106_kcore", "p107_bfs_hops", "p108_trustrank")) {
      val p = plan(name)
      assert(!p.contains("CartesianProduct"), s"$name:\n$p")
      // trustrank's dangling-mass 1-row aggregate broadcasts by design —
      // any OTHER nested-loop join is a bug
      val nlj = p.linesIterator.count(_.contains("BroadcastNestedLoopJoin"))
      assert(nlj <= (if (name == "p108_trustrank") 1 else 0), s"$name:\n$p")
    }
  }

  test("p111 blocklist: term side broadcasts; no cartesian") {
    val p = plan("p111_blocklist")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("p113 random projection: per-row codegen'd dots, zero exchange before the explode") {
    val p = plan("p113_random_projection")
    assert(p.contains("arr_dot"), p)
    assert(!p.contains("CartesianProduct"), p)
    // scan -> project(16 dots) -> posexplode: nothing shuffles until the
    // driver-side orderBy the entry adds for the dump
    val beforeSort = p.split("Sort").head
    assert(!beforeSort.contains("Exchange hashpartitioning"), p)
  }

  test("p110 / p114: linkage closure and weighted rank stay equi-join shaped") {
    for (name <- Seq("p110_entity_resolution", "p114_weighted_pagerank")) {
      val p = plan(name)
      assert(!p.contains("CartesianProduct"), s"$name:\n$p")
      // p114's 1-row dangling aggregate broadcasts by design (as p66)
      val nlj = p.linesIterator.count(_.contains("BroadcastNestedLoopJoin"))
      assert(nlj <= (if (name == "p114_weighted_pagerank") 1 else 0),
        s"$name:\n$p")
    }
  }

  test("s45 graph-trust report: three fixpoints join without a cartesian") {
    val p = plan("s45_script_graph_trust")
    assert(!p.contains("CartesianProduct"), p)
    // trustrank's 1-row dangling broadcast is the only nested loop allowed
    assert(p.linesIterator.count(_.contains("BroadcastNestedLoopJoin")) <= 1, p)
  }

  test("p116 co-occurrence: adjacency-array pair explode — no self-join, no window") {
    val p = plan("p116_cooccur_edges")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    // r20 shape: ONE basket-keyed collect_set aggregation, pairs stream
    // out of nested explode generators; the old basket-keyed SELF-JOIN
    // (2 membership shuffles) and the cap's row_number window are gone
    assert(p.contains("collect_set"), p)
    assert(p.linesIterator.count(_.contains("Generate explode")) >= 2, p)
    assert(!p.contains("Window"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(p.contains("HashAggregate"), p)
  }

  test("p117 sssp: returned frame is a bare checkpoint scan; round shape is equi-join + min agg") {
    // the loop returns a checkpointed frame, so the query's own plan must
    // be nothing but the RDD scan + the dump's sort — no recompute tail
    val p = plan("p117_sssp")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("ExistingRDD") || p.contains("Scan ExistingRDD"), p)
    // the per-round relaxation plan (what actually runs maxIter times):
    // equi-join on the frontier key feeding a partial-then-final min agg
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val e = spark.read.parquet(s"$sf/lineitem.parquet")
      .select($"l_partkey".as("u"), ($"l_suppkey" + 10000000L).as("v"),
        (($"l_linenumber" % 5) + 1).cast("long").as("w"))
    val frontier = e.select($"u".as("node")).distinct().withColumn("dist", lit(0L))
    val round = e.join(frontier.select($"node".as("u"), $"dist"), "u")
      .select($"v".as("node"), ($"dist" + $"w").as("nd"))
      .groupBy("node").agg(min($"nd").as("nd"))
    val rp = round.queryExecution.executedPlan.toString
    assert(!rp.contains("CartesianProduct") && !rp.contains("BroadcastNestedLoopJoin"), rp)
    assert(rp.contains("HashAggregate") && rp.toLowerCase.contains("partial"), rp)
  }

  test("p122 containment: posting-list shape — no inverted-index self-join, no cartesian") {
    val p = plan("p122_ngram_containment")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    // pairs generate INSIDE each posting list (explode of in-list pairs),
    // then hash aggregations — same audited shape as p9
    assert(p.contains("HashAggregate"), p)
    assert(p.contains("Generate"), p)
  }

  test("p121 pmi edges: count joins are equi-joins; only the 1-row total broadcasts nested-loop") {
    val p = plan("p121_cooccur_pmi")
    assert(!p.contains("CartesianProduct"), p)
    // the basket-total crossJoin(broadcast(1 row)) is the only nested loop
    assert(p.linesIterator.count(_.contains("BroadcastNestedLoopJoin")) <= 1, p)
    assert(p.contains("HashAggregate"), p)
  }

  test("p118 survivorship: election + merges are entity-keyed windows/aggs, no cartesian") {
    val p = plan("p118_entity_survivorship")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("Window"), p)       // the canon election
    assert(p.contains("HashAggregate"), p) // the merge aggregations
  }

  test("p124/p128 perceptual dedup: banded Hamming equi-join, no cartesian (both modalities)") {
    for (name <- Seq("p124_image_dedup", "p128_audio_dedup")) {
      val p = plan(name)
      assert(!p.contains("CartesianProduct"), s"$name:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$name:\n$p")
      // candidates collide on the (chunk, ckey) equi-key; exact verify is
      // a per-row projection after the join
      assert(p.contains("Generate") || p.contains("explode"), s"$name:\n$p")
    }
  }

  test("p132/p133 video frames: banded Hamming frame join + video-keyed windows, no cartesian") {
    // p132: candidate FRAME pairs collide on the (chunk, ckey) equi-key
    // (the p124 shape with a frame axis); the containment score joins the
    // skinny per-video counts back as equi-joins
    val p132 = plan("p132_video_dedup")
    assert(!p132.contains("CartesianProduct"), p132)
    assert(!p132.contains("BroadcastNestedLoopJoin"), p132)
    assert(p132.contains("Generate") || p132.contains("explode"), p132)
    assert(p132.contains("HashAggregate"), p132)
    // p133: one video-keyed window pass over the stamp — no join at all
    val p133 = plan("p133_video_scenes")
    assert(!p133.contains("CartesianProduct"), p133)
    assert(!p133.contains("BroadcastNestedLoopJoin"), p133)
    assert(!p133.contains("SortMergeJoin"), p133)
    assert(p133.contains("Window"), p133)
  }

  test("p127 neighborhood centrality: stamp scan -> node-keyed window + agg, no recompute tail") {
    val p = plan("p127_neighborhood_function")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    // the compared surface reads the persisted stamp, not the sketch loop
    assert(p.contains("Scan parquet") || p.contains("FileScan"), p)
    assert(p.contains("Window") && p.contains("HashAggregate"), p)
    // and the per-round sketch-union aggregation keeps map-side partials
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val e = spark.read.parquet(s"$sf/lineitem.parquet")
      .select($"l_partkey".as("u"), $"l_suppkey".as("v"))
    val sk = e.select($"u".as("node")).distinct()
      .groupBy($"node").agg(expr("hll_sketch_agg(node, 12)").as("sketch"))
    val round = e.join(sk.select($"node".as("v"), $"sketch"), "v")
      .select($"u".as("node"), $"sketch")
      .unionByName(sk.select($"node", $"sketch"))
      .groupBy($"node").agg(expr("hll_union_agg(sketch, true)").as("sketch"))
    val rp = round.queryExecution.executedPlan.toString
    assert(!rp.contains("CartesianProduct"), rp)
    assert(rp.toLowerCase.contains("partial_hll_union_agg") ||
      rp.toLowerCase.contains("partial"), rp)
  }

  test("p112 nearest as-of: one key exchange + windows, no pair blowup") {
    val p = plan("p112_asof_nearest")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("Window"), p)
    // the two directions must NOT re-shuffle: exactly one exchange
    // hash-partitioned on the join key feeds both window sorts
    val keyExchanges = p.linesIterator
      .count(l => l.contains("Exchange hashpartitioning(user_id"))
    assert(keyExchanges == 1, p)
  }

  test("p98 attribution: conv x touch is a user-keyed join, never cartesian") {
    val p = plan("p98_multi_touch_attribution")
    assert(!p.contains("CartesianProduct"), p)
    // the only nested-loop joins allowed are broadcasts of 1-row/models
    // dims (stats, the 3-row model axis)
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), p)
  }

  test("p102 ks: one value-axis aggregation, no cartesian") {
    val p = plan("p102_ks_drift")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("p99 survival: the cohort reduces on the duration axis before windows") {
    val p = plan("p99_survival_km")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("HashAggregate"), p) // per-duration counts pre-window
  }

  test("arr_cosine participates in whole-stage codegen") {
    val df = spark.range(3).selectExpr(
      "arr_cosine(array(cast(id as double), 2.0d), array(2.0d, 3.0d)) as c")
    val p = df.queryExecution.executedPlan.toString
    // the `*(n)` prefix marks a WholeStageCodegen span containing the Project
    assert("\\*\\(\\d+\\) Project \\[arr_cosine".r.findFirstIn(p).isDefined, p)
    assert(math.abs(df.collect()(1).getDouble(0) - 0.99227) < 1e-4)
  }

  test("the same native expression TWICE in one stage still compiles (fresh locals)") {
    // regression: fixed-name codegen locals (int i, double acc, ...) made a
    // second instance of arr_cosine/arr_dot/arr_norm in the same
    // WholeStageCodegen fail Janino compilation ("Redefinition of local
    // variable") and silently drop the whole stage to interpreted eval
    val df = spark.range(3).selectExpr(
      "arr_cosine(array(cast(id as double), 2.0d), array(2.0d, 3.0d)) as c1",
      "arr_cosine(array(3.0d, cast(id as double)), array(1.0d, 1.0d)) as c2",
      "arr_dot(array(cast(id as double)), array(2.0d)) + arr_dot(array(1.0d), array(4.0d)) as d",
      "arr_norm(array(cast(id as double))) + arr_norm(array(3.0d, 4.0d)) as n")
    val p = df.queryExecution.executedPlan.toString
    assert("\\*\\(\\d+\\) Project \\[arr_cosine".r.findFirstIn(p).isDefined, p)
    // fallback=false turns a silent interpreted downgrade into a hard error
    val prev = spark.conf.get("spark.sql.codegen.fallback", "true")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val r = df.collect()(1)
      assert(math.abs(r.getDouble(0) - 0.99227) < 1e-4)
      assert(math.abs(r.getDouble(2) - (2.0 + 4.0)) < 1e-12)
      assert(math.abs(r.getDouble(3) - (1.0 + 5.0)) < 1e-12)
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
  }

  test("scripted star join produces the same physical shape as the DF version") {
    val p = plan("s2_script_star_join")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("p24 corpus mix is shuffle-free: scan -> project -> generate") {
    // the orderBy in the query spec is presentation; audit the operator
    val df = graft.operators.sampling.CorpusMix.mix(
      spark.read.parquet(s"$sf/documents.parquet"),
      "lang", Map("en" -> 0.5, "zh" -> 2.25), "doc_id")
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p)
    assert(p.contains("Generate"), p)
  }

  test("p25 paragraph dedup keeps partial aggregation on the winner min") {
    val p = plan("p25_paragraph_dedup")
    // first-occurrence selection must be an aggregate (map-side combinable),
    // not a window over the paragraph hash (hot-paragraph skew buffer)
    assert(p.contains("HashAggregate") || p.contains("SortAggregate"), p)
    assert(p.toLowerCase.contains("partial"), p)
    assert(!p.contains("Window"), p)
  }

  test("p26 capped-vocab LM scoring broadcasts the model, no cartesian blowup") {
    // the scale path: top-V model + 1-row totals are broadcast; the only
    // non-broadcast exchange left is the per-doc aggregation
    val df = graft.operators.text.UnigramLm.crossEntropy(
      spark.read.parquet(s"$sf/documents.parquet"), "doc_id", "text", topV = 64)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("HashAggregate"), p)
  }

  test("p30 sequence pack never plans a single-partition global window") {
    // the scale trap this operator exists to avoid: sum() over (order by id)
    // with no partitionBy compiles to Exchange SinglePartition + one sorted
    // partition. The two-phase prefix sum must show a hash exchange on the
    // range-partition id instead.
    val df = graft.operators.text.SequencePack.chunkLayout(
      spark.read.parquet(s"$sf/documents.parquet")
        .withColumn("n_tok", org.apache.spark.sql.functions.size(
          org.apache.spark.sql.functions.split(
            org.apache.spark.sql.functions.col("text"), " "))),
      "doc_id", "n_tok", seqLen = 2048)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("SinglePartition"), p)
    assert(p.contains("hashpartitioning(__pid__"), p)
  }

  test("q38 recursive CTE plans as a bounded loop of equi-joins") {
    val p = plan("q38_recursive_cte")
    assert(p.contains("UnionLoop"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("p33 corpus split and p34 doc chunk are shuffle-free per-row plans") {
    import org.apache.spark.sql.functions.{col, md5}
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val split = graft.operators.sampling.CorpusSplit.split(
      docs.withColumn("grp", md5(col("text"))), "doc_id",
      Seq("train" -> 0.9, "test" -> 0.1), groupCol = Some("grp"))
    val ps = split.queryExecution.executedPlan.toString
    assert(!ps.contains("Exchange"), ps)
    val chunk = graft.operators.text.DocChunk
      .chunkByChars(docs, "text", size = 64, overlap = 16)
    val pc = chunk.queryExecution.executedPlan.toString
    assert(!pc.contains("Exchange"), pc)
    assert(pc.contains("Generate"), pc)
  }

  test("p37 two-phase group top-k and p38 token budget never single-partition") {
    // both exist to dodge the same trap as p30: a window with a global
    // order (or one hot group) collapsing to Exchange SinglePartition
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val topk = graft.operators.sampling.GroupCap.capPerGroupBy(
      docs, "lang", cap = 4, orderCol = "n_chars", idCol = "doc_id")
    val pt = topk.queryExecution.executedPlan.toString
    assert(!pt.contains("SinglePartition"), pt)
    assert(pt.contains("hashpartitioning"), pt)
    val take = graft.operators.sampling.TokenBudget.take(
      docs, "doc_id", "n_chars", budget = 5000L)
    val pb = take.queryExecution.executedPlan.toString
    assert(!pb.contains("SinglePartition"), pb)
    assert(pb.contains("hashpartitioning(__pid__"), pb)
  }

  test("p35 group cap joins per-group thresholds, not a #groups-deep CaseWhen") {
    // the threshold must arrive via a join on the group key (AQE picks
    // broadcast vs shuffle), never as an inlined per-group literal chain —
    // at per-domain cardinality (1e5+ groups) that chain is an
    // analyzer/codegen blowup
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val capped = graft.operators.sampling.GroupCap.capPerGroup(
      docs, "lang", cap = 4, idCol = "doc_id")
    val p = capped.queryExecution.executedPlan.toString
    assert(p.contains("Join"), p)
    assert(!p.contains("CASE WHEN"), p)
  }

  test("p40 substring dedup: combinable canonical pick, no cartesian, no global window") {
    val p = plan("p40_substring_dedup")
    // canonical-occurrence selection must be an aggregate (map-side
    // combinable under hot-window skew), never a window over the key
    assert(p.toLowerCase.contains("partial"), p)
    assert(!p.contains("CartesianProduct"), p)
    // the only window is the per-document islands merge
    assert(!p.contains("SinglePartition"), p)
  }

  test("p44 DSIR scoring and p46 cluster assignment are zero-shuffle map passes") {
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    // score with a prebuilt ratio vector: the corpus pass must not shuffle,
    // and the 8192-entry model must ride in as ONE literal (no CaseWhen /
    // CreateArray blowup — the GroupCap/BPE failure class)
    val lr = new Array[Double](8192)
    val scored = graft.operators.sampling.ImportanceSelect
      .score(docs, "doc_id", "text", lr)
    val psc = scored.queryExecution.executedPlan.toString
    assert(!psc.contains("Exchange"), psc)
    assert(!psc.contains("CaseWhen"), psc)
    val embs = spark.read.parquet(s"$sf/embeddings.parquet")
    val cents = embs.filter(col("vec_id") % 25 === 0)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
    val assigned = graft.operators.sampling.ClusterSample
      .assign(embs, "vec_id", "embedding", cents, "cid", "cv")
    val pa = assigned.queryExecution.executedPlan.toString
    assert(!pa.contains("Exchange"), pa)
    assert(!pa.contains("Join"), pa)
  }

  test("p50/p52 Gopher batteries are zero-shuffle per-row passes; " +
       "the lang→probes map is ONE literal") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "lang", "text")
    val ml = graft.operators.text.QualityRules.gopherByLang(
      docs, "text", "lang",
      probes = Map("fr" -> Seq("merge", "table"), "es" -> Seq("query", "row")))
    val pml = ml.queryExecution.executedPlan.toString
    assert(!pml.contains("Exchange"), pml)
    // per-language routing must be a map-literal lookup, not a probes-deep
    // CaseWhen chain (the GroupCap failure class)
    assert(!pml.contains("CaseWhen"), pml)
    val rep = graft.operators.text.QualityRules.repetition(docs, "text")
    val prp = rep.queryExecution.executedPlan.toString
    assert(!prp.contains("Exchange"), prp)
    assert(!prp.contains("Join"), prp)
  }

  test("minParallelism hatch: no-op when the scan already provides enough " +
       "partitions; round-robins only when underfilled") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val lr = new Array[Double](8192)
    // enough partitions (any scan has >= 1): plan keeps its audited
    // zero-shuffle shape — NO Exchange may appear
    val enough = graft.operators.sampling.ImportanceSelect
      .score(docs, "doc_id", "text", lr, minParallelism = 1)
    val pe = enough.queryExecution.executedPlan.toString
    assert(!pe.contains("Exchange"), pe)
    // underfilled: exactly one round-robin repartition, before the projection
    val want = docs.rdd.getNumPartitions + 8
    val hatch = graft.operators.sampling.ImportanceSelect
      .score(docs, "doc_id", "text", lr, minParallelism = want)
    val ph = hatch.queryExecution.executedPlan.toString
    assert(ph.toLowerCase.contains("roundrobin"), ph)
    assert(hatch.rdd.getNumPartitions == want, ph)
  }

  test("minParallelism hatch guarantees the floor past a shuffle " +
       "(AQE may coalesce a small shuffle to 1 partition)") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    // a tiny groupBy output is exactly the case AQE coalesces hard; a
    // per-row expensive stage downstream must still see >= min partitions
    val agged = docs.groupBy("lang").agg(count(lit(1)).as("n"))
    val out = graft.operators.scale.Parallelism.ensure(agged, 8)
    val p = out.queryExecution.executedPlan.toString
    assert(p.toLowerCase.contains("roundrobin"), p)
    assert(out.rdd.getNumPartitions == 8)
    // and min <= 0 stays a strict no-op (production contract)
    assert(graft.operators.scale.Parallelism.ensure(agged, 0) eq agged)
  }

  test("p49 Gumbel resampling is the p44 zero-shuffle score plus ONE top-k") {
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val sel = graft.operators.sampling.ImportanceSelect.gumbelSelect(
      docs, docs.filter(col("lang") === "en"), "doc_id", "text",
      k = 20, seed = 42L, portable = true)
    val p = sel.queryExecution.executedPlan.toString
    // global top-k = TakeOrderedAndProject (per-partition partial top-k +
    // driver merge of k rows), never a full sort
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("SinglePartition"), p)
  }

  test("p47 shard assignment never plans a single-partition global window") {
    val df = graft.operators.sampling.ShardExport.assignShards(
      spark.read.parquet(s"$sf/documents.parquet"), "doc_id", rowsPerShard = 40)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("SinglePartition"), p)
    assert(p.contains("hashpartitioning(__pid__"), p)
  }

  test("q43 resample gap-fill joins the axis on equi-keys, no nested loops") {
    val p = plan("q43_resample_gapfill")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("HashAggregate"), p)
  }

  test("analytics-layer joins are equi only: no cartesian, no nested-loop") {
    for (q <- Seq("p62_funnel", "p64_retention", "p65_transitions",
        "p68_market_basket", "p72_triangles", "p75_attribution",
        "p77_robust_outliers", "p81_acf", "p82_ccf")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q:\n$p")
      // the ONE legitimate nested-loop shape is the 1-row-aggregate scalar
      // broadcast (crossJoin(broadcast(agg)) — e.g. market basket's N);
      // anything else nested-loop is a blowup bug
      val bnlj = "BroadcastNestedLoopJoin"
      val stray = p.linesIterator.filter(_.contains(bnlj))
        .filterNot(_.contains("BuildRight, Cross"))
      assert(stray.isEmpty, s"$q stray nested-loop:\n$p")
    }
  }

  test("analytics-layer windows are key-partitioned, never global") {
    // seasonal/EWMA/transitions/paths all window per key; a SinglePartition
    // exchange would mean the global-window trap
    for (q <- Seq("p63_seasonal_decompose", "p65_transitions", "p71_ewma",
        "p69_top_paths", "p76_twap", "p80_scd2", "p81_acf")) {
      val p = plan(q)
      assert(!p.contains("SinglePartition"), s"$q:\n$p")
    }
  }

  test("p70 exact profile: the Expand aggregation stays hash-based") {
    // string extrema live in a separate Expand-free SortAggregate pass;
    // the Expand subtree itself must aggregate by hash (a SortAggregate
    // over W+1 input copies was the measured 8s regression shape)
    val p = plan("p70_profile")
    assert(p.contains("Expand"), p)
    // tree prints top-down: any SortAggregate ABOVE the Expand would
    // appear before it
    val upToExpand = p.substring(0, p.indexOf("Expand"))
    assert(!upToExpand.contains("SortAggregate"),
      s"SortAggregate above Expand:\n$p")
  }
}
