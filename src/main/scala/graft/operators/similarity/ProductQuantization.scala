package graft.operators.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Product quantization for embedding search at corpus scales where raw
  * vectors don't fit — the FAISS PQ/ADC design re-expressed as Spark
  * plans. A d-dim float vector becomes `m` one-byte codes (one k=256
  * KMeans codebook per d/m-dim subspace): 64-dim × 8 bytes → 8 bytes per
  * vector, a 64× memory cut, which at 100 TB is the difference between an
  * index that fits in cluster RAM and one that doesn't.
  *
  * Search = ADC (asymmetric distance computation): the query stays
  * unquantized; per query one m×256 inner-product table is precomputed
  * against the codebooks, and each corpus vector's score is m table
  * lookups on its codes — no float vector is ever read at query time.
  * Vectors are L2-NORMALIZED at encode/query time so inner product equals
  * cosine and the ADC score estimates the cosine directly.
  *
  * ADC ranks approximately; [[topK]] therefore over-fetches `rerank`
  * candidates by ADC and re-ranks JUST those with the exact cosine
  * against the raw vectors (the standard PQ + exact-rerank pipeline:
  * O(corpus) byte-lookups + O(rerank) float work per query).
  *
  * No reference counterpart; builder-prompt north-star ("similarity
  * search: ... a scale path") extension alongside the IVF index.
  */
object ProductQuantization {

  /** m codebooks of k centroids each over d/m-dim subvectors. */
  case class PqModel(m: Int, subDim: Int, codebooks: Array[Array[Array[Double]]]) {
    def numCentroids: Int = codebooks(0).length
  }

  private def normalize(v: Array[Double]): Array[Double] = {
    var n = 0.0; var i = 0
    while (i < v.length) { n += v(i) * v(i); i += 1 }
    val inv = if (n == 0) 0.0 else 1.0 / math.sqrt(n)
    v.map(_ * inv)
  }

  /** Fit codebooks on a bounded, seeded corpus sample (codebooks steer
    * RANKING quality only — the exact re-rank keeps final scores honest —
    * so a driver mini-fit is safe, same argument as
    * [[CosineSimilarity.fitOrLoadCentroids]]).
    */
  def fit(df: DataFrame, vecCol: String, m: Int = 8, k: Int = 256,
          sampleN: Int = 4000, seed: Long = 42L): PqModel = {
    val sample = df.filter(col(vecCol).isNotNull)
      .select(col(vecCol).cast("array<double>"))
      .orderBy(rand(seed)).limit(sampleN)
      .collect().map(r => normalize(r.getSeq[Double](0).toArray))
    require(sample.nonEmpty, "PQ fit: empty corpus")
    val d = sample(0).length
    require(d % m == 0, s"PQ: dim $d not divisible by m=$m subspaces")
    val subDim = d / m
    val codebooks = Array.tabulate(m) { s =>
      val sub = sample.map(v => java.util.Arrays.copyOfRange(v, s * subDim, (s + 1) * subDim))
      CosineSimilarity.lloyd(sub, k, seed + s, iters = 8)
    }
    PqModel(m, subDim, codebooks)
  }

  /** Persist codebooks as a parquet table (sub, cell, center) so query
    * batches against a static corpus skip the sample fit — the PQ analog
    * of [[CosineSimilarity.fitOrLoadCentroids]]'s `centroidsPath`.
    */
  def save(spark: org.apache.spark.sql.SparkSession, model: PqModel, path: String): Unit = {
    import spark.implicits._
    model.codebooks.zipWithIndex.flatMap { case (cb, s) =>
      cb.zipWithIndex.map { case (c, cell) => (s, cell, c.toSeq) }
    }.toSeq.toDF("sub", "cell", "center")
      .repartition(1).write.mode("overwrite").parquet(path)
  }

  def load(spark: org.apache.spark.sql.SparkSession, path: String): PqModel = {
    val rows = spark.read.parquet(path)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toArray))
    val m = rows.map(_._1).max + 1
    val codebooks = Array.tabulate(m) { s =>
      rows.filter(_._1 == s).sortBy(_._2).map(_._3)
    }
    PqModel(m, codebooks(0)(0).length, codebooks)
  }

  /** Load from `modelPath` when present, else fit and (when a path is
    * given) save — one clustering scan per corpus, not per query batch.
    */
  def fitOrLoad(df: DataFrame, vecCol: String, m: Int = 8, k: Int = 256,
                sampleN: Int = 4000, seed: Long = 42L,
                modelPath: Option[String] = None): PqModel = {
    val spark = df.sparkSession
    modelPath.filter { p =>
      val path = new org.apache.hadoop.fs.Path(p)
      path.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(path)
    } match {
      case Some(p) => load(spark, p)
      case None =>
        val model = fit(df, vecCol, m, k, sampleN, seed)
        modelPath.foreach(save(spark, model, _))
        model
    }
  }

  /** (id, code byte[m]) per corpus row — the compact index. One scan, no
    * shuffle; nearest-centroid per subspace by L2 on the normalized
    * subvector (the KMeans objective).
    */
  def encode(df: DataFrame, idCol: String, vecCol: String, model: PqModel): DataFrame = {
    val bc = df.sparkSession.sparkContext.broadcast(model)
    val enc = udf { (v: Seq[Double]) =>
      val mm = bc.value
      val x = normalize(v.toArray)
      val code = new Array[Byte](mm.m)
      var s = 0
      while (s < mm.m) {
        val cb = mm.codebooks(s)
        var best = 0; var bestD = Double.MaxValue; var c = 0
        while (c < cb.length) {
          var dist = 0.0; var j = 0
          while (j < mm.subDim) {
            val t = cb(c)(j) - x(s * mm.subDim + j); dist += t * t; j += 1
          }
          if (dist < bestD) { bestD = dist; best = c }
          c += 1
        }
        code(s) = best.toByte
        s += 1
      }
      code
    }
    df.filter(col(vecCol).isNotNull)
      .select(col(idCol).as("id"), enc(col(vecCol).cast("array<double>")).as("code"))
  }

  /** Approximate top-k per query: ADC scoring over the byte codes →
    * `rerank` candidates per query → exact cosine re-rank on the raw
    * vectors of just those candidates.
    *
    * Driver state is BOUNDED by `queryBatch` regardless of query-side
    * size: queries are hash-bucketed into ceil(|queries|/queryBatch)
    * batches and only one batch's ADC tables (queryBatch × m×256
    * doubles) ever lives on the driver at a time. Each query's top-k is
    * independent, so per-batch candidate sets union losslessly and one
    * exact re-rank join at the end scans the raw corpus vectors ONCE,
    * not per batch. A "PQ self-search the corpus" call (query side =
    * corpus) therefore streams through in corpus/queryBatch rounds of
    * bounded work instead of OOMing the driver; the codes frame is
    * persisted across rounds so the corpus is encoded once.
    */
  def topK(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
           qIdCol: String, qVecCol: String, k: Int, model: PqModel,
           rerank: Int = 64, queryBatch: Int = 1024): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(queryBatch > 0, "queryBatch must be positive")
    val spark = corpus.sparkSession
    import spark.implicits._
    val nc = model.numCentroids

    val q = queries.filter(col(qVecCol).isNotNull)
      .select(col(qIdCol).cast("long").as("qid"),
        col(qVecCol).cast("array<double>").as("qv"))
    val nBatches = math.max(1,
      math.ceil(q.count().toDouble / queryBatch).toInt)
    val codes0 = encode(corpus, idCol, vecCol, model)
    val codes = if (nBatches > 1)
      codes0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else codes0

    // ADC candidates for ONE bounded batch of queries: the batch's m×256
    // tables are driver-built (≤ queryBatch of them) and broadcast
    def batchCandidates(qRows: Array[(Long, Array[Double])]): DataFrame = {
      val tables: Map[Long, Array[Double]] = qRows.map { case (qid, qn) =>
        val t = new Array[Double](model.m * nc)
        var s = 0
        while (s < model.m) {
          var c = 0
          while (c < nc) {
            var ip = 0.0; var j = 0
            while (j < model.subDim) {
              ip += qn(s * model.subDim + j) * model.codebooks(s)(c)(j); j += 1
            }
            t(s * nc + c) = ip
            c += 1
          }
          s += 1
        }
        qid -> t
      }.toMap
      val bcTables = spark.sparkContext.broadcast(tables)
      val adc = udf { (qid: Long, code: Array[Byte]) =>
        val t = bcTables.value(qid)
        var score = 0.0; var s = 0
        while (s < code.length) {
          score += t(s * nc + (code(s) & 0xff)); s += 1
        }
        score
      }
      val qIds = qRows.map(_._1).toSeq.toDF("qid")
      codes.join(broadcast(qIds), col("id") =!= col("qid"))
        .withColumn("adc", adc(col("qid"), col("code")))
        .withColumn("crank", row_number().over(
          Window.partitionBy(col("qid")).orderBy(col("adc").desc, col("id"))))
        .filter(col("crank") <= rerank)
        .select(col("qid"), col("id"))
    }

    val candidates = (0 until nBatches).map { b =>
      val qRows = q.filter(pmod(hash(col("qid")), lit(nBatches)) === lit(b))
        .collect()
        .map(r => r.getLong(0) -> normalize(r.getSeq[Double](1).toArray))
      batchCandidates(qRows)
    }.reduce(_.union(_))

    // exact re-rank of the surviving candidates only — one corpus-vector
    // join for ALL batches; AQE broadcasts the small candidate side
    val vecs = corpus.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("v"))
    val qVecs = queries.select(col(qIdCol).cast("long").as("qid"),
      col(qVecCol).cast("array<double>").as("qv"))
    candidates
      .join(vecs, "id")
      .join(qVecs, "qid")
      .withColumn("sim", round(call_function("arr_cosine", col("qv"), col("v")), 6))
      .withColumn("nrank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("id"))))
      .filter(col("nrank") <= k)
      .select(col("qid"), col("nrank"), col("id").as("neighbor"), col("sim"))
  }
}
