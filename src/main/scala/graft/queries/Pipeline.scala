package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Training-data pipeline operators over `documents` / `embeddings`
  * (builder-prompt north star; no direct reference analog — the reference's
  * closest surface is its text ETs, e.g. streamingpro-mlsql/.../algs/
  * SQLTfIdfInPlace.scala and SQLRawSimilarInPlace.scala).
  *
  * Scale notes per operator are inline; the O(n²) brute-force variants are
  * the *correctness baseline* — the LSH/banded variants in
  * [[graft.operators]] are the 100 TB path.
  */
object Pipeline {
  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables.load(s, dir, n)

  val specs: Seq[QuerySpec] = Seq(

    // ---- exact dedup: hash-groupBy on content digest; one shuffle on the
    //      digest, map-side partial agg. Scales linearly. ----
    QuerySpec.sql("p1_dedup_exact", (s, dir) => {
      import s.implicits._
      t(s, dir, "documents")
        .groupBy(md5($"text").as("h"))
        .agg(min($"doc_id").as("doc_id"), count(lit(1)).as("n_copies"))
        .select($"doc_id", $"n_copies")
        .orderBy($"doc_id")
    },
      """SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_copies
        |FROM documents GROUP BY MD5(text) ORDER BY doc_id""".stripMargin),

    // ---- normalized-fingerprint dedup (lowercase, strip non-alnum) ----
    QuerySpec.sql("p2_dedup_fingerprint", (s, dir) => {
      import s.implicits._
      t(s, dir, "documents")
        .groupBy(md5(regexp_replace(lower($"text"), "[^a-z0-9]", "")).as("fingerprint"))
        .agg(min($"doc_id").as("keep_id"), count(lit(1)).as("n_docs"))
        .orderBy($"keep_id")
    },
      """SELECT MD5(REGEXP_REPLACE(LOWER(text), '[^a-z0-9]', '', 'g')) AS fingerprint,
        | MIN(doc_id) AS keep_id, COUNT(*) AS n_docs
        |FROM documents GROUP BY 1 ORDER BY keep_id""".stripMargin),

    // ---- bag-of-words canonical dedup: catches word-shuffled duplicates
    //      (sort the token multiset, hash it). Same single-shuffle shape. ----
    QuerySpec.sql("p3_dedup_shuffled", (s, dir) => {
      import s.implicits._
      t(s, dir, "documents")
        .groupBy(md5(array_join(sort_array(split($"text", " ")), " ")).as("bow_hash"))
        .agg(min($"doc_id").as("keep_id"), count(lit(1)).as("n_docs"))
        .orderBy($"keep_id")
    },
      """SELECT MD5(ARRAY_TO_STRING(LIST_SORT(STRING_SPLIT(text, ' ')), ' ')) AS bow_hash,
        | MIN(doc_id) AS keep_id, COUNT(*) AS n_docs
        |FROM documents GROUP BY 1 ORDER BY keep_id""".stripMargin),

    // ---- whitespace token stats per language ----
    QuerySpec.sql("p4_token_stats", (s, dir) => {
      import s.implicits._
      t(s, dir, "documents")
        .withColumn("n_tokens", size(split($"text", " ")))
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_docs"),
          sum($"n_tokens").as("total_tokens"),
          (sum($"n_tokens") / count(lit(1))).as("avg_tokens"),
          max($"n_chars").as("max_chars"))
        .orderBy($"lang")
    },
      """SELECT lang, COUNT(*) AS n_docs,
        | CAST(SUM(LEN(STRING_SPLIT(text, ' '))) AS BIGINT) AS total_tokens,
        | CAST(SUM(LEN(STRING_SPLIT(text, ' '))) AS BIGINT) / COUNT(*) AS avg_tokens,
        | MAX(n_chars) AS max_chars
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin),

    // ---- per-document quality scoring (length / diversity heuristics) ----
    QuerySpec.sql("p5_quality_score", (s, dir) => {
      import s.implicits._
      val words = split($"text", " ")
      t(s, dir, "documents")
        .withColumn("n_tokens", size(words))
        .withColumn("n_unique", size(array_distinct(words)))
        .select($"doc_id", $"n_tokens", $"n_unique",
          ($"n_unique".cast("double") / $"n_tokens").as("diversity"),
          (length(regexp_replace($"text", " ", "")).cast("double") / $"n_tokens").as("avg_word_len"),
          ($"n_tokens" >= 20 && $"n_tokens" <= 2000 &&
            $"n_unique".cast("double") / $"n_tokens" > 0.3).as("is_quality"))
        .orderBy($"doc_id")
    },
      """SELECT doc_id,
        | CAST(LEN(STRING_SPLIT(text, ' ')) AS INT) AS n_tokens,
        | CAST(LEN(LIST_DISTINCT(STRING_SPLIT(text, ' '))) AS INT) AS n_unique,
        | CAST(LEN(LIST_DISTINCT(STRING_SPLIT(text, ' '))) AS DOUBLE) / LEN(STRING_SPLIT(text, ' ')) AS diversity,
        | CAST(LENGTH(REPLACE(text, ' ', '')) AS DOUBLE) / LEN(STRING_SPLIT(text, ' ')) AS avg_word_len,
        | (LEN(STRING_SPLIT(text, ' ')) BETWEEN 20 AND 2000
        |   AND CAST(LEN(LIST_DISTINCT(STRING_SPLIT(text, ' '))) AS DOUBLE) / LEN(STRING_SPLIT(text, ' ')) > 0.3) AS is_quality
        |FROM documents ORDER BY doc_id""".stripMargin),

    // ---- BPE-ish regex token counting ----
    QuerySpec.sql("p6_bpe_tokens", (s, dir) => {
      import s.implicits._
      val pat = "[a-z]+|[0-9]+|[^a-z0-9\\s]"
      t(s, dir, "documents")
        .select($"doc_id",
          size(regexp_extract_all(lower($"text"), lit(pat), lit(0))).as("n_bpe_tokens"),
          size(split($"text", " ")).as("n_ws_tokens"))
        .orderBy($"doc_id")
    },
      """SELECT doc_id,
        | CAST(LEN(REGEXP_EXTRACT_ALL(LOWER(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS INT) AS n_bpe_tokens,
        | CAST(LEN(STRING_SPLIT(text, ' ')) AS INT) AS n_ws_tokens
        |FROM documents ORDER BY doc_id""".stripMargin),

    // ---- brute-force cosine top-k ANN (correctness baseline).
    //      Queries broadcast, corpus streamed: one pass over the corpus per
    //      batch of queries, no shuffle of the corpus. The 100 TB path is the
    //      LSH-bucketed variant in graft.operators.similarity. ----
    QuerySpec.sql("p7_ann_bruteforce", (s, dir) => {
      import s.implicits._
      val e = t(s, dir, "embeddings")
        .select($"vec_id", expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
      val q = e.filter($"vec_id" < 10).select($"vec_id".as("qid"), $"v".as("qv"))
      val dot = "aggregate(zip_with(qv, v, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (acc, z) -> acc + z)"
      val nq = "sqrt(aggregate(transform(qv, x -> x * x), CAST(0.0 AS DOUBLE), (acc, z) -> acc + z))"
      val nv = "sqrt(aggregate(transform(v, x -> x * x), CAST(0.0 AS DOUBLE), (acc, z) -> acc + z))"
      e.join(broadcast(q), $"vec_id" =!= $"qid")
        .withColumn("sim", round(expr(s"$dot / ($nq * $nv)"), 6))
        .withColumn("nrank", row_number().over(
          Window.partitionBy($"qid").orderBy($"sim".desc, $"vec_id")))
        .filter($"nrank" <= 5)
        .select($"qid", $"nrank", $"vec_id".as("neighbor"), $"sim")
        .orderBy($"qid", $"nrank")
    },
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 10)
        |SELECT qid, nrank, neighbor, sim FROM (
        | SELECT q.qid, e.vec_id AS neighbor,
        |  ROUND(LIST_INNER_PRODUCT(q.qv, e.v) /
        |    (SQRT(LIST_INNER_PRODUCT(q.qv, q.qv)) * SQRT(LIST_INNER_PRODUCT(e.v, e.v))), 6) AS sim,
        |  ROW_NUMBER() OVER (PARTITION BY q.qid
        |    ORDER BY ROUND(LIST_INNER_PRODUCT(q.qv, e.v) /
        |      (SQRT(LIST_INNER_PRODUCT(q.qv, q.qv)) * SQRT(LIST_INNER_PRODUCT(e.v, e.v))), 6) DESC,
        |      e.vec_id) AS nrank
        | FROM q JOIN e ON e.vec_id <> q.qid) t
        |WHERE nrank <= 5 ORDER BY qid, nrank""".stripMargin),

    // ---- embedding near-duplicate pairs above a cosine threshold ----
    QuerySpec.sql("p8_neardup_embedding", (s, dir) => {
      import s.implicits._
      val e = t(s, dir, "embeddings")
        .select($"vec_id", expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
      val a = e.select($"vec_id".as("a_id"), $"v".as("av"))
      val b = e.select($"vec_id".as("b_id"), $"v".as("bv"))
      val dot = "aggregate(zip_with(av, bv, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (acc, z) -> acc + z)"
      val na = "sqrt(aggregate(transform(av, x -> x * x), CAST(0.0 AS DOUBLE), (acc, z) -> acc + z))"
      val nb = "sqrt(aggregate(transform(bv, x -> x * x), CAST(0.0 AS DOUBLE), (acc, z) -> acc + z))"
      a.join(b, $"a_id" < $"b_id")
        .withColumn("sim", round(expr(s"$dot / ($na * $nb)"), 6))
        .filter($"sim" >= 0.45)
        .select($"a_id", $"b_id", $"sim")
        .orderBy($"a_id", $"b_id")
    },
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
        |SELECT a.vec_id AS a_id, b.vec_id AS b_id,
        | ROUND(LIST_INNER_PRODUCT(a.v, b.v) /
        |   (SQRT(LIST_INNER_PRODUCT(a.v, a.v)) * SQRT(LIST_INNER_PRODUCT(b.v, b.v))), 6) AS sim
        |FROM e a JOIN e b ON a.vec_id < b.vec_id
        |WHERE ROUND(LIST_INNER_PRODUCT(a.v, b.v) /
        |   (SQRT(LIST_INNER_PRODUCT(a.v, a.v)) * SQRT(LIST_INNER_PRODUCT(b.v, b.v))), 6) >= 0.45
        |ORDER BY a_id, b_id""".stripMargin),

    // ---- n-gram (word 3-shingle) Jaccard near-dup candidates.
    //      Shuffle shape: explode shingles -> group by shingle (inverted
    //      index) -> pair counts -> Jaccard. Only docs sharing a shingle are
    //      paired, so the n² blowup is bounded by shingle co-occurrence. ----
    QuerySpec.sql("p9_ngram_jaccard", (s, dir) => {
      import s.implicits._
      val sh = t(s, dir, "documents")
        .select($"doc_id", split($"text", " ").as("w"))
        .filter(size($"w") >= 3)
        .select($"doc_id", expr(
          "array_distinct(transform(sequence(0, size(w) - 3), i -> concat_ws(' ', w[i], w[i+1], w[i+2])))").as("shingles"))
      val counts = sh.select($"doc_id", size($"shingles").as("n_sh"))
      val inv = sh.select($"doc_id", explode($"shingles").as("sh"))
      val pairs = inv.as("x").join(inv.as("y"), $"x.sh" === $"y.sh" && $"x.doc_id" < $"y.doc_id")
        .groupBy($"x.doc_id".as("a_id"), $"y.doc_id".as("b_id"))
        .agg(count(lit(1)).as("n_common"))
      pairs
        .join(counts.select($"doc_id".as("a_id"), $"n_sh".as("a_n")), "a_id")
        .join(counts.select($"doc_id".as("b_id"), $"n_sh".as("b_n")), "b_id")
        .withColumn("jaccard", round($"n_common".cast("double") / ($"a_n" + $"b_n" - $"n_common"), 4))
        .filter($"jaccard" >= 0.8)
        .select($"a_id", $"b_id", $"n_common", $"jaccard")
        .orderBy($"a_id", $"b_id")
    },
      """WITH sh AS (
        | SELECT doc_id, LIST_DISTINCT(ngrams) AS shingles FROM (
        |  SELECT doc_id,
        |   [ARRAY_TO_STRING(w[i:i+2], ' ') FOR i IN RANGE(1, LEN(w) - 1)] AS ngrams
        |  FROM (SELECT doc_id, STRING_SPLIT(text, ' ') AS w FROM documents)
        |  WHERE LEN(w) >= 3) t),
        |counts AS (SELECT doc_id, LEN(shingles) AS n_sh FROM sh),
        |inv AS (SELECT doc_id, UNNEST(shingles) AS s FROM sh),
        |pairs AS (
        | SELECT x.doc_id AS a_id, y.doc_id AS b_id, COUNT(*) AS n_common
        | FROM inv x JOIN inv y ON x.s = y.s AND x.doc_id < y.doc_id
        | GROUP BY 1, 2)
        |SELECT a_id, b_id, n_common,
        | ROUND(CAST(n_common AS DOUBLE) / (ca.n_sh + cb.n_sh - n_common), 4) AS jaccard
        |FROM pairs JOIN counts ca ON pairs.a_id = ca.doc_id
        |JOIN counts cb ON pairs.b_id = cb.doc_id
        |WHERE ROUND(CAST(n_common AS DOUBLE) / (ca.n_sh + cb.n_sh - n_common), 4) >= 0.8
        |ORDER BY a_id, b_id""".stripMargin),

    // ---- per-source corpus profile (docs, langs, token volume) ----
    QuerySpec.sql("p10_corpus_profile", (s, dir) => {
      import s.implicits._
      t(s, dir, "documents")
        .groupBy($"source")
        .agg(count(lit(1)).as("n_docs"),
          countDistinct($"lang").as("n_langs"),
          sum($"n_chars").as("total_chars"),
          sum(size(split($"text", " "))).as("total_tokens"))
        .orderBy($"source")
    },
      """SELECT source, COUNT(*) AS n_docs, COUNT(DISTINCT lang) AS n_langs,
        | CAST(SUM(n_chars) AS BIGINT) AS total_chars,
        | CAST(SUM(LEN(STRING_SPLIT(text, ' '))) AS BIGINT) AS total_tokens
        |FROM documents GROUP BY source ORDER BY source""".stripMargin)
  )
}
