package graft.operators.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cosine-similarity operators over an embedding column (`array<float>` or
  * `array<double>`), built on the codegen'd [[graft.functions.ArrCosine]]
  * expression.
  *
  * Scale guidance (100 TB):
  *  - [[annTopK]] broadcasts the (small) query set and streams the corpus
  *    ONCE with no corpus shuffle — linear in corpus size, the right shape
  *    for batch scoring. Per-pair cost is one codegen'd loop.
  *  - [[exactSelfJoin]] is inherently O(n²) pairs — use it only when the
  *    corpus (or a pre-blocked bucket of it) is small. It exists as the
  *    correctness baseline and as the in-bucket verifier for the LSH path.
  *  - [[lshSelfJoin]] is the scale path for high thresholds (≥ ~0.7): only
  *    pairs that collide in some band get the exact cosine, so the quadratic
  *    blowup is confined to LSH buckets. NOTE a fundamental LSH property:
  *    for LOW thresholds (e.g. 0.45, angle ≈ 63°, barely tighter than the
  *    90° of random vectors) no data-independent banding prunes — the
  *    collision probability of a random pair (0.5 per bit) is too close to
  *    that of a threshold pair. Parameters are derived from the threshold
  *    and a target recall; when the math says banding cannot prune we fail
  *    fast rather than silently run a slower-than-exact plan.
  */
object CosineSimilarity {

  private def cosine(a: Column, b: Column): Column =
    call_function("arr_cosine", a, b)

  /** The most recent [[ivfSelfJoin]] assignment cache — kept so each call
    * can release its predecessor's storage instead of accreting cached
    * corpus projections over a long-lived session.
    *
    * Contract: one in-flight ivfSelfJoin CONSUMER per JVM. Concurrent
    * calls stay CORRECT (the returned plan recomputes deterministically if
    * its cached assignment was released by a later call), but the second
    * call silently forfeits the first one's caching benefit — don't rely
    * on the cache across interleaved invocations.
    */
  private val lastAssignmentCache =
    new java.util.concurrent.atomic.AtomicReference[DataFrame](null)

  /** Exact all-pairs self-join above `threshold`. O(n²) candidate pairs —
    * one broadcast of the smaller side, one codegen'd loop per pair,
    * NO per-pair HOF lambdas. `sim` is rounded to 6 decimals for
    * cross-engine determinism.
    */
  def exactSelfJoin(df: DataFrame, idCol: String, vecCol: String,
                    threshold: Double): DataFrame = {
    val a = df.select(col(idCol).as("a_id"), col(vecCol).cast("array<double>").as("av"))
    val b = df.select(col(idCol).as("b_id"), col(vecCol).cast("array<double>").as("bv"))
    a.join(b, col("a_id") < col("b_id"))
      .withColumn("sim", round(cosine(col("av"), col("bv")), 6))
      .filter(col("sim") >= threshold)
      .select(col("a_id"), col("b_id"), col("sim"))
  }

  /** Brute-force top-k neighbors for a (small, broadcast) query set against
    * the corpus. Corpus is scanned once, never shuffled; the only shuffle is
    * the per-query top-k window over candidate rows.
    */
  def annTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, qIdCol: String, qVecCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    corpus.join(broadcast(queries), col(idCol) =!= col(qIdCol))
      .withColumn("sim", round(cosine(col(qVecCol).cast("array<double>"),
        col(vecCol).cast("array<double>")), 6))
      .withColumn("nrank", row_number().over(
        Window.partitionBy(col(qIdCol)).orderBy(col("sim").desc, col(idCol))))
      .filter(col("nrank") <= k)
      .select(col(qIdCol).as("qid"), col("nrank"), col(idCol).as("neighbor"), col("sim"))
  }

  /** Hard-negative mining for contrastive training: per query, the top-k
    * most-similar corpus items that are NOT the query itself and NOT its
    * labeled positives — the neighborhood negatives that actually move a
    * DPR/SimCLR-style loss (random in-batch negatives are mostly easy).
    * Optional `maxSim` additionally drops candidates above a similarity
    * ceiling: the very top of the ranking is where unlabeled TRUE
    * positives hide, and training on them as negatives poisons the model
    * (the classic false-negative trap).
    *
    * Exact by construction: positives and the ceiling are filtered BEFORE
    * the per-query ranking (no overfetch heuristics), on the same
    * candidate set [[annTopK]] builds anyway — corpus scanned once, query
    * and positive sets broadcast, the only shuffle is the per-query top-k
    * window. For corpus-scale query sets, mine in batches (same contract
    * as annTopK).
    */
  def hardNegatives(corpus: DataFrame, queries: DataFrame, positives: DataFrame,
                    idCol: String, vecCol: String, qIdCol: String, qVecCol: String,
                    posCol: String, k: Int,
                    maxSim: Option[Double] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pos = positives.select(col(qIdCol).as("__pqid__"), col(posCol).as("__pid__"))
    val cand = corpus.join(broadcast(queries), col(idCol) =!= col(qIdCol))
      .join(broadcast(pos),
        col(qIdCol) === col("__pqid__") && col(idCol) === col("__pid__"),
        "left_anti")
      .withColumn("sim", round(cosine(col(qVecCol).cast("array<double>"),
        col(vecCol).cast("array<double>")), 6))
    val banded = maxSim.map(m => cand.filter(col("sim") <= m)).getOrElse(cand)
    banded
      .withColumn("nrank", row_number().over(
        Window.partitionBy(col(qIdCol)).orderBy(col("sim").desc, col(idCol))))
      .filter(col("nrank") <= k)
      .select(col(qIdCol).as("qid"), col("nrank"), col(idCol).as("neg_id"), col("sim"))
  }

  /** IVF (inverted-file) approximate top-k: KMeans-partition the corpus
    * into `nlist` cells once, then each query probes only its `nprobe`
    * nearest cells — the classic FAISS-style index re-expressed as Spark
    * joins. At 100 TB the corpus is scanned ONCE to build assignments
    * (reusable across query batches), and each query batch touches
    * ~nprobe/nlist of the corpus via an EQUI-join on the cell id (hash
    * shuffle, AQE-skew-safe) instead of a full scan per batch.
    * Approximate: recall depends on nprobe/nlist (test-pinned on the
    * fixtures); [[annTopK]] is the exact baseline.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
              qIdCol: String, qVecCol: String, k: Int,
              nlist: Int = 64, nprobe: Int = 8, seed: Long = 42L,
              centroidsPath: Option[String] = None,
              fit: String = "auto"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // centroidsPath amortizes the clustering scan across query batches:
    // build once, save; later calls load nlist rows instead of re-fitting
    val centers = fitOrLoadCentroids(corpus, vecCol, nlist, seed, centroidsPath, fit)
    val bcCenters = corpus.sparkSession.sparkContext.broadcast(centers)
    // nearest-center (Euclidean, matching the KMeans objective) assignment
    val assignUdf = udf { (v: Seq[Double]) =>
      val cs = bcCenters.value
      var best = 0; var bestD = Double.MaxValue; var i = 0
      while (i < cs.length) {
        val c = cs(i); var d = 0.0; var j = 0
        val n = math.min(c.length, v.length)
        while (j < n) { val t = c(j) - v(j); d += t * t; j += 1 }
        if (d < bestD) { bestD = d; best = i }
        i += 1
      }
      best
    }
    // null embeddings can be neighbors of nothing (arr_cosine → null →
    // below every threshold/rank) — drop them before the assign UDF
    val cells = corpus.filter(col(vecCol).isNotNull)
      .select(col(idCol), col(vecCol).cast("array<double>").as("cvec"))
      .withColumn("cell", assignUdf(col("cvec")))
    val probeUdf = udf { (v: Seq[Double]) =>
      bcCenters.value.zipWithIndex.map { case (c, i) =>
        var d = 0.0; var j = 0
        val n = math.min(c.length, v.length)
        while (j < n) { val t = c(j) - v(j); d += t * t; j += 1 }
        (d, i)
      }.sortBy(_._1).take(nprobe).map(_._2)
    }
    val probed = queries
      .select(col(qIdCol), col(qVecCol).cast("array<double>").as("qvec"))
      .withColumn("cell", explode(probeUdf(col("qvec"))))
    probed.join(cells, Seq("cell"))
      .filter(col(qIdCol) =!= col(idCol))
      .withColumn("sim", round(cosine(col("qvec"), col("cvec")), 6))
      .withColumn("nrank", row_number().over(
        Window.partitionBy(col(qIdCol)).orderBy(col("sim").desc, col(idCol))))
      .filter(col("nrank") <= k)
      .select(col(qIdCol).as("qid"), col("nrank"), col(idCol).as("neighbor"), col("sim"))
  }

  /** Random-hyperplane LSH parameters for a threshold + recall target.
    *
    * p(bit agrees | sim = t) = 1 − acos(t)/π. With `r` bits per band and
    * `b` bands, P(miss) = (1 − p^r)^b ≤ missProb. `r` also shards buckets:
    * 2^r possible keys per band. Returns (rowsPerBand, bands).
    */
  def lshParams(threshold: Double, missProb: Double = 1e-5, rowsPerBand: Int = 8): (Int, Int) = {
    // clamp p below 1 so threshold=1.0 (identical vectors) yields ≥1 band
    // instead of bands=0 (which would silently return zero pairs)
    val p = math.min(1.0 - math.acos(threshold) / math.Pi, 1.0 - 1e-9)
    val pr = math.pow(p, rowsPerBand)
    require(pr > 1e-9,
      s"threshold $threshold too low for $rowsPerBand-bit bands (p=$p); " +
        "banding cannot prune at this threshold — use exactSelfJoin")
    val bands = math.ceil(math.log(missProb) / math.log(1.0 - pr)).toInt
    (rowsPerBand, bands)
  }

  /** Deterministic random hyperplanes (seeded Gaussian), `nBits × dim`. */
  private[similarity] def hyperplanes(nBits: Int, dim: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new java.util.Random(seed)
    Array.fill(nBits)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Banded-LSH self-join above `threshold`: sign-bit signatures from seeded
    * random hyperplanes → one band key per (row, band) → equi-join on
    * (band, key) → dedup candidate pairs → exact codegen'd cosine verify.
    * Output == exact output up to the configured miss probability.
    *
    * Shuffle shape at scale: explode factor = `bands` (linear), candidate
    * join is an equi-join on the band key (shuffle-hash/sort-merge, AQE
    * skew-split applies), exact verify only inside buckets.
    */
  /** Expected fraction of all pairs that collide in ≥1 band, estimated
    * from a driver-side sample's actual band keys (Σ over buckets (k/s)²
    * per band, union-bounded over bands). This is the DATA-dependent
    * check the threshold-only math can't do: correlated embeddings (e.g.
    * all-positive components) collide far more than the random-vector
    * model predicts.
    */
  private[graft] def estimateCandidateFraction(
      sample: Array[Array[Double]], planes: Array[Array[Double]],
      r: Int, bands: Int): Double = {
    val s = sample.length
    if (s < 2) return 0.0
    val keys = sample.map { v =>
      Array.tabulate(bands) { band =>
        var key = 0L; var bit = 0
        while (bit < r) {
          val plane = planes(band * r + bit)
          var dot = 0.0; var i = 0
          val n = math.min(plane.length, v.length)
          while (i < n) { dot += plane(i) * v(i); i += 1 }
          if (dot > 0) key |= (1L << bit)
          bit += 1
        }
        key
      }
    }
    val perBand = (0 until bands).map { b =>
      keys.groupBy(_(b)).values.map(g => (g.size.toDouble / s) * (g.size.toDouble / s)).sum
    }
    math.min(1.0, perBand.sum) // union bound
  }

  def lshSelfJoin(df: DataFrame, idCol: String, vecCol: String, threshold: Double,
                  missProb: Double = 1e-5, rowsPerBand: Int = 8,
                  seed: Long = 42L, forceBanding: Boolean = false): DataFrame = {
    val (r, bands) = lshParams(threshold, missProb, rowsPerBand)
    // empty corpus (or all-null embeddings): no head() to take — the exact
    // path returns the correctly typed empty (a_id, b_id, sim) frame
    // without needing the dimension. The isNotNull probe also prevents an
    // NPE when the first-scanned row's embedding happens to be null.
    val firstRow = df.filter(col(vecCol).isNotNull)
      .select(size(col(vecCol))).head(1)
    if (firstRow.isEmpty) return exactSelfJoin(df, idCol, vecCol, threshold)
    val dim = firstRow(0).getInt(0)
    val planes = hyperplanes(r * bands, dim, seed)

    // Adaptive degeneration guard: when the sampled candidate fraction says
    // banding prunes (almost) nothing — low threshold and/or correlated
    // data — the banded join would SCORE EVERY PAIR ANYWAY, plus explode/
    // join overhead. Same output, strictly less work: exact all-pairs.
    if (!forceBanding) {
      // randomized 500-row sample (seeded TakeOrdered over rand — one linear
      // scan, bounded memory): limit(500) took the FIRST partitions, which
      // on sorted/clustered inputs is unrepresentative and can defeat or
      // falsely trigger the fallback
      val sample = df.filter(col(vecCol).isNotNull)
        .select(col(vecCol).cast("array<double>").as("__v__"))
        .orderBy(rand(seed))
        .limit(500).collect().map(_.getSeq[Double](0).toArray)
      val frac = estimateCandidateFraction(sample, planes, r, bands)
      if (frac > 0.3) {
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          f"lshSelfJoin: sampled candidate fraction $frac%.2f > 0.3 — banding cannot " +
            "prune at this threshold on this data; falling back to the tiled " +
            "ivfSelfJoin (same exact output, shuffle-planned instead of a " +
            "BroadcastNestedLoopJoin)")
        return ivfSelfJoin(df, idCol, vecCol, threshold)
      }
    }

    val bandKeysUdf = udf { (v: Seq[Double]) =>
      val keys = new Array[Long](bands)
      var band = 0
      while (band < bands) {
        var key = 0L
        var bit = 0
        while (bit < r) {
          val plane = planes(band * r + bit)
          var dot = 0.0
          var i = 0
          val n = math.min(plane.length, v.length)
          while (i < n) { dot += plane(i) * v(i); i += 1 }
          if (dot > 0) key |= (1L << bit)
          bit += 1
        }
        keys(band) = key
        band += 1
      }
      keys
    }

    // null embeddings can match nothing (exact path: arr_cosine yields
    // null → filtered); dropping them here keeps outputs identical and
    // prevents an NPE inside the band-key loop
    val vecs = df.filter(col(vecCol).isNotNull)
      .select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
    val keyed = vecs
      .withColumn("band_keys", bandKeysUdf(col("v")))
      .select(col("id"), posexplode(col("band_keys")).as(Seq("band", "key")))

    val candidates = keyed.as("x").join(keyed.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("a_id"), col("y.id").as("b_id"))

    // Verify BEFORE dedup: a pair colliding in m bands is scored m times
    // (cheap — one codegen'd loop each), but the distinct then runs on the
    // few ABOVE-threshold rows instead of shuffling every candidate pair.
    // (The reverse order cost a full extra shuffle of the candidate set.)
    candidates
      .join(vecs.select(col("id").as("a_id"), col("v").as("av")), "a_id")
      .join(vecs.select(col("id").as("b_id"), col("v").as("bv")), "b_id")
      .withColumn("sim", round(cosine(col("av"), col("bv")), 6))
      .filter(col("sim") >= threshold)
      .select(col("a_id"), col("b_id"), col("sim"))
      .distinct()
  }

  /** Angle (radians) between the directions of two vectors — `acos` of the
    * clamped cosine. A metric on the unit sphere, which is what makes the
    * triangle-inequality pruning in [[ivfSelfJoin]] EXACT.
    */
  private def angle(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0) math.Pi / 2
    else math.acos(math.max(-1.0, math.min(1.0, dot / denom)))
  }

  /** Load KMeans cell centers from `centroidsPath` if present, else fit and
    * save them there when a path is given — so a 100 TB corpus pays the
    * clustering scan ONCE across query batches / pipeline runs. ANY
    * centers are correctness-neutral for [[ivfSelfJoin]] (the radius bound
    * adapts); they only change pruning power.
    *
    * Fit strategy (`fit`): `"driver"` = seeded Lloyd's on a bounded ≤4000
    * row sample (cheapest for small nlist — no spark.ml pipeline
    * overhead); `"distributed"` = `spark.ml` KMeans over the FULL corpus
    * (k-means|| init, every Lloyd round a distributed pass); `"auto"`
    * (default) picks distributed once `nlist > 64`. The auto cutover is
    * the VERDICT-r15 fix: nlist scales with the corpus (constant cell
    * size ⇒ nlist ∝ n), so the driver fit's O(sample·nlist·dim·iters)
    * serial term was the one driver-side cost that GREW with corpus size
    * — at 100 TB (nlist in the tens of thousands) the fit must be a
    * distributed job, and past ~64 cells it already beats the driver
    * loop on wall-clock. Downstream is fit-agnostic: both paths persist /
    * return plain `(cell, center)` rows and the oracle boundary is the
    * persisted parquet, so swapping fits cannot change any replay
    * (pinned by CosineSimilaritySpec "distributed fit").
    *
    * REPRODUCIBILITY CAVEAT (ADVICE r16): without `centroidsPath`, BOTH
    * fit paths produce centers that depend on the input's physical
    * layout — the driver fit samples via `orderBy(rand(seed))` (rand is
    * seeded PER PARTITION) and k-means|| init likewise — so
    * [[cellSelfJoin]]/[[ivfTopK]] output can differ across executor
    * counts / partition layouts (each run is internally deterministic
    * and correct; the CELL ASSIGNMENT differs, and with it which
    * candidate pairs are probed). Pass `centroidsPath` whenever
    * determinism across cluster layouts matters: the first run stamps
    * the centers and every later run — any layout — replays them
    * bit-identically. `fit="auto"` also switches driver→distributed at
    * nlist > 64, which changes (layout-dependent) centers vs. older
    * versions for callers passing larger nlist; pin `fit` explicitly or,
    * again, stamp via `centroidsPath`.
    */
  private[graft] def fitOrLoadCentroids(
      df: DataFrame, vecCol: String, nlist: Int, seed: Long,
      centroidsPath: Option[String], fit: String = "auto"): Array[Array[Double]] = {
    val spark = df.sparkSession
    centroidsPath.filter { p =>
      val path = new org.apache.hadoop.fs.Path(p)
      // the path's OWN filesystem — FileSystem.get(conf) breaks for any
      // scheme other than fs.defaultFS (s3a:// path on an HDFS cluster)
      path.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(path)
    } match {
      case Some(p) =>
        spark.read.parquet(p).orderBy("cell")
          .collect().map(_.getSeq[Double](1).toArray)
      case None =>
        val useDistributed = fit match {
          case "distributed" => true
          case "driver" => false
          case "auto" => nlist > 64
          case other => throw new IllegalArgumentException(
            s"centroid fit must be driver|distributed|auto, got '$other'")
        }
        val centers =
          if (useDistributed) fitDistributed(df, vecCol, nlist, seed)
          else {
            // seeded Lloyd's over a bounded driver-side sample (≤4000 rows,
            // one randomized scan to collect): centers only steer PRUNING —
            // correctness never depends on them — so for small nlist a
            // driver mini-fit beats spark.ml pipeline overhead by ~1s
            val sample = df.filter(col(vecCol).isNotNull)
              .select(col(vecCol).cast("array<double>").as("__arr__"))
              .orderBy(rand(seed)).limit(4000)
              .collect().map(_.getSeq[Double](0).toArray)
            lloyd(sample, nlist, seed, iters = 8)
          }
        centroidsPath.foreach { p =>
          import spark.implicits._
          centers.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
            .toDF("cell", "center").repartition(1).write.mode("overwrite").parquet(p)
        }
        centers
    }
  }

  /** Distributed KMeans fit over the full corpus (`spark.ml`, k-means||
    * init, 8 Lloyd rounds to match [[lloyd]]). Each round is one
    * map-reduce over the corpus — no driver term grows with nlist, which
    * is what makes nlist ∝ corpus viable at 100 TB. k is capped at the
    * corpus row count (spark.ml rejects k > n); center count may come
    * back < k when clusters collapse, which every consumer tolerates
    * (they iterate `centers.length`).
    */
  private[graft] def fitDistributed(df: DataFrame, vecCol: String,
                                    nlist: Int, seed: Long): Array[Array[Double]] = {
    import org.apache.spark.ml.functions.array_to_vector
    val feat = df.filter(col(vecCol).isNotNull)
      .select(array_to_vector(col(vecCol).cast("array<double>")).as("__features__"))
    val kk = math.min(nlist.toLong, feat.count()).toInt
    require(kk >= 1, "fitDistributed: empty corpus")
    val km = new org.apache.spark.ml.clustering.KMeans()
      .setK(kk).setSeed(seed).setMaxIter(8)
      .setFeaturesCol("__features__").setPredictionCol("__pred__")
    km.fit(feat).clusterCenters.map(_.toArray)
  }

  /** Seeded Lloyd's iterations on an in-memory sample. Deterministic;
    * empty clusters keep their previous center. Returns ≤ k centers
    * (k capped at the sample size).
    */
  private[graft] def lloyd(points: Array[Array[Double]], k: Int, seed: Long,
                           iters: Int): Array[Array[Double]] = {
    require(points.nonEmpty, "lloyd: empty sample")
    val n = points.length
    val kk = math.min(k, n)
    val rnd = new java.util.Random(seed)
    // seeded init: k distinct sample points (shuffled index prefix)
    val idx = rnd.ints(0, n).distinct().limit(kk).toArray
    var centers = idx.map(points(_).clone())
    val assign = new Array[Int](n)
    var it = 0
    while (it < iters) {
      var i = 0
      while (i < n) {
        var best = 0; var bestD = Double.MaxValue; var c = 0
        while (c < centers.length) {
          val ctr = centers(c); var d = 0.0; var j = 0
          val dim = math.min(ctr.length, points(i).length)
          while (j < dim) { val t = ctr(j) - points(i)(j); d += t * t; j += 1 }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        assign(i) = best
        i += 1
      }
      val sums = Array.fill(centers.length)(new Array[Double](points(0).length))
      val counts = new Array[Int](centers.length)
      i = 0
      while (i < n) {
        val a = assign(i); val p = points(i); var j = 0
        val dim = math.min(sums(a).length, p.length)
        while (j < dim) { sums(a)(j) += p(j); j += 1 }
        counts(a) += 1
        i += 1
      }
      centers = centers.indices.map { c =>
        if (counts(c) == 0) centers(c)
        else sums(c).map(_ / counts(c))
      }.toArray
      it += 1
    }
    centers
  }

  /** EXACT cosine self-join above `threshold` via KMeans-cell blocking — the
    * data-adaptive replacement for [[exactSelfJoin]]'s all-pairs
    * BroadcastNestedLoopJoin (reference gesture: SQLRawSimilarInPlace's
    * cluster-then-compare blocking; re-designed here with an exactness
    * guarantee).
    *
    * Shape: assign every vector to its nearest of `nlist` KMeans cells (one
    * corpus scan); compute each cell's angular radius `r_i` = max angle of a
    * member to its (normalized) center (one aggregation); on the driver,
    * admit cell pair (i,j) only if `ang(c_i,c_j) ≤ acos(t) + r_i + r_j` —
    * by the spherical triangle inequality NO qualifying pair can span a
    * rejected cell pair, so recall is exactly 1 with NO tuning. Candidates
    * are generated by an EQUI-join of assignments against the (tiny,
    * broadcast) admissible-cell-pair table, then verified with the
    * codegen'd `arr_cosine`.
    *
    * Scale behavior (100 TB): shuffle volume is |corpus| × avg-degree
    * (degree = admissible partners per cell, ≤ nlist), NEVER pairs. On
    * clusterable embedding corpora (the real-world case) most cell pairs
    * are rejected and the quadratic verify is confined to nearby cells. On
    * isotropic data at a low threshold — where NO exact method can prune
    * (the qualifying pairs are the tail of the random-pair distribution) —
    * every cell pair is admitted and this degenerates gracefully to a TILED
    * all-pairs equi-join: still exact, still shuffle-planned (no
    * BroadcastNestedLoopJoin), with nlist² independently schedulable tiles
    * instead of one nested loop.
    */
  def ivfSelfJoin(df: DataFrame, idCol: String, vecCol: String, threshold: Double,
                  nlist: Int = 16, seed: Long = 42L,
                  centroidsPath: Option[String] = None,
                  fit: String = "auto"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // null embeddings can match nothing (exact path: arr_cosine yields null
    // → filtered), so drop them up front — identical output, and the assign
    // UDF / centroid sample never see a null (NPE otherwise; lshSelfJoin
    // applies the same filter for the same reason)
    val vecs = df.filter(col(vecCol).isNotNull)
      .select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
    if (vecs.isEmpty) return exactSelfJoin(df, idCol, vecCol, threshold)
    val centers = fitOrLoadCentroids(vecs, "v", nlist, seed, centroidsPath, fit)
    val bcCenters = spark.sparkContext.broadcast(centers)

    // nearest cell by ANGLE (consistent with the radius metric) + the angle
    // to that center, in one pass
    val assignUdf = udf { (v: Seq[Double]) =>
      val cs = bcCenters.value
      val arr = v.toArray
      var best = 0; var bestAng = Double.MaxValue; var i = 0
      while (i < cs.length) {
        val a = angle(arr, cs(i))
        if (a < bestAng) { bestAng = a; best = i }
        i += 1
      }
      (best, bestAng)
    }
    val assigned = vecs.withColumn("__a__", assignUdf(col("v")))
      .select(col("id"), col("v"), col("__a__._1").as("cell"), col("__a__._2").as("ang"))
      .cache()
    // bound the cache footprint: in a script, pin to the script's
    // CacheScope (released at script end); outside, release the PREVIOUS
    // invocation's assignment (the returned plan recomputes if a caller
    // re-materializes it later — correctness unaffected)
    graft.CacheScope.pin(assigned, lastAssignmentCache)

    // per-cell angular radius (nlist rows — driver-sized by construction)
    val radii = assigned.groupBy("cell").agg(max("ang").as("r"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap

    // admissible cell pairs (both orientations for i≠j, once for i=j): an
    // unordered vector pair {x,y} in cells (cx,cy) is generated exactly once
    // — by whichever orientation matches its id order — so no dedup pass
    val thrAng = math.acos(math.max(-1.0, math.min(1.0, threshold)))
    val cellPairs = for {
      i <- radii.keys.toSeq; j <- radii.keys.toSeq
      if angle(centers(i), centers(j)) <= thrAng + radii(i) + radii(j)
    } yield (i, j)
    val pairsDF = broadcast(cellPairs.toDF("ca", "cb"))

    // candidate generation on SKINNY (id, cell) rows — the exploded join
    // stream carries ~16 bytes/row instead of two embedding arrays (at 64
    // dims that's a ~60× shuffle-volume cut); arrays are re-attached by id
    // only for the surviving candidates (AQE broadcasts the vector side
    // when it fits, plain shuffle-hash otherwise)
    val slim = assigned.select(col("id"), col("cell"))
    val a = slim.select(col("id").as("a_id"), col("cell").as("ca"))
    val b = slim.select(col("id").as("b_id"), col("cell").as("cb"))
    val candidates = a.join(pairsDF, "ca")
      .join(b, Seq("cb"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"))
    // arrays re-attached from the CACHED assignment (not a fresh source
    // scan); both sides are the deduped corpus projection, so AQE
    // broadcasts them when they fit
    val withVec = assigned.select(col("id"), col("v"))
    candidates
      .join(withVec.select(col("id").as("a_id"), col("v").as("av")), "a_id")
      .join(withVec.select(col("id").as("b_id"), col("v").as("bv")), "b_id")
      .withColumn("sim", round(cosine(col("av"), col("bv")), 6))
      .filter(col("sim") >= threshold)
      .select(col("a_id"), col("b_id"), col("sim"))
  }

  /** SemDeDup-style APPROXIMATE near-dup self-join (Abbas et al. 2023):
    * exact cosine pairs WITHIN each k-means cell only — pairs across cell
    * boundaries are deliberately forfeited, so recall is governed by how
    * cleanly the corpus clusters. This is the embedding near-dup operator
    * that actually scales: per-cell work is (n/nlist)², so with
    * `nlist ∝ n` (constant cell size) total cost is LINEAR in the corpus
    * — ScaleSweep measures it — whereas [[ivfSelfJoin]]'s full-recall
    * tile gate (exact by contract, for the p8 oracle) degrades toward
    * all-pairs whenever cell radii exceed the threshold angle (low
    * thresholds, loose clusters, isotropic data). One shuffle of
    * (id, cell, vec) per side on the cell key; assignment is
    * [[graft.operators.sampling.ClusterSample.assign]]'s codegen'd
    * rounded-6 argmax (s28-proven SQL-replayable), centroids from
    * [[fitOrLoadCentroids]] (auto: distributed `spark.ml` KMeans past 64
    * cells — the fit itself stays distributed as nlist grows with the
    * corpus) or `centroidsPath` (the pay-the-clustering-once 100 TB
    * path; p86 uses it as the oracle boundary).
    */
  def cellSelfJoin(df: DataFrame, idCol: String, vecCol: String,
                   threshold: Double, nlist: Int = 16, seed: Long = 42L,
                   centroidsPath: Option[String] = None,
                   fit: String = "auto"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val vecs = df.filter(col(vecCol).isNotNull)
      .select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
    if (vecs.isEmpty) return exactSelfJoin(df, idCol, vecCol, threshold)
    val centers = fitOrLoadCentroids(vecs, "v", nlist, seed, centroidsPath, fit)
    val centDf = centers.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toSeq.toDF("cid", "cv")
    val assigned = graft.operators.sampling.ClusterSample
      .assign(vecs, "id", "v", centDf, "cid", "cv")
      .select(col("id"), col("v"), col("cluster").as("cell"))
    val a = assigned.select(col("cell"), col("id").as("a_id"), col("v").as("av"))
    val b = assigned.select(col("cell"), col("id").as("b_id"), col("v").as("bv"))
    a.join(b, Seq("cell"))
      .filter(col("a_id") < col("b_id"))
      .withColumn("sim", round(cosine(col("av"), col("bv")), 6))
      .filter(col("sim") >= threshold)
      .select(col("a_id"), col("b_id"), col("sim"))
  }
}
