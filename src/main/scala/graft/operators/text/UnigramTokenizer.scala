package graft.operators.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SentencePiece-style unigram-LM tokenizer (Kudo 2018, "Subword
  * Regularization", §3) — the other standard subword family next to BPE
  * ([[BpeTrain]]): a vocabulary of pieces with unigram log-probs, encoding
  * by Viterbi (the max-probability segmentation), trained by EM over the
  * word dictionary. This build uses the common deterministic hard-EM
  * variant: each round Viterbi-segments every dictionary word under the
  * current probabilities, re-counts piece usage, prunes to the target
  * vocabulary (single characters are never pruned — segmentability
  * guarantee), and re-normalizes.
  *
  * Scale posture mirrors the BPE trainer: piece statistics need only the
  * UNIQUE-WORD dictionary (one `groupBy(word)` shuffle of the corpus).
  * At or under `driverDictCap` it is collected and the whole loop runs on
  * the driver — O(iters × dict-chars × maxPieceLen²), seconds for
  * realistic caps; past the cap [[trainDistributed]] runs the identical
  * rounds with the dictionary kept distributed (broadcast-costs Viterbi
  * map pass + explode/groupBy recount, driver-side prune on the
  * vocab-bounded count table). ENCODING is a per-row broadcast-vocab
  * Viterbi, scan speed at 100 TB.
  *
  * Determinism contract (what the s32 oracle replays): piece costs are
  * `-ln(count/total)` doubles; Viterbi accumulates cost left-to-right, so
  * a given segmentation's cost is bitwise-identical in any engine that
  * adds the same doubles in the same order — DuckDB replays the encode as
  * a recursive-CTE path enumeration over the PERSISTED vocab and takes
  * MIN(cost) (ties broken by fewer pieces), which equals the Viterbi DP
  * by construction.
  *
  * No reference counterpart; beyond-reference LLM-pipeline surface per
  * the builder prompt.
  */
object UnigramTokenizer {

  /** (piece, count, cost) rows; `cost = -ln(count / total)` over the final
    * vocabulary. Deterministic: all ties break on the piece string.
    *
    * Dictionaries at or under `driverDictCap` unique words take a driver
    * fast path (the whole hard-EM loop runs on the collected
    * word-frequency dict — zero Spark jobs per round). Past the cap — the
    * 100 TB regime — [[trainDistributed]] runs the SAME deterministic
    * rounds with the dictionary kept distributed; the two paths are
    * pinned bit-identical in UnigramTokenizerSpec on a forced-low-cap
    * fixture (counts are exact Long sums, so partitioning cannot perturb
    * them; costs and Viterbi are then the same pure functions).
    */
  def train(df: DataFrame, textCol: String, vocabSize: Int,
            maxPieceLen: Int = 6, iters: Int = 4,
            seedCap: Int = 100000, driverDictCap: Int = 100000): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val dict = df.select(explode(split(col(textCol), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("freq"))
    // ONE corpus scan for the fast-path probe: collect cap+1 rows and
    // check the length driver-side (a separate count() would re-run the
    // explode+groupBy shuffle); only an over-cap dict pays a second scan,
    // and that is the regime where the corpus dominates the dict anyway
    val head =
      if (driverDictCap > 0) dict.limit(driverDictCap + 1).as[(String, Long)].collect()
      else Array.empty[(String, Long)]
    val rows =
      if (driverDictCap > 0 && head.length <= driverDictCap)
        trainOnDict(head.sortBy(_._1), vocabSize, maxPieceLen, iters, seedCap)
      else trainDistributed(dict, vocabSize, maxPieceLen, iters, seedCap)
    rows.toSeq.toDF("piece", "cnt", "cost")
  }

  private[graft] def trainOnDict(dict: Array[(String, Long)], vocabSize: Int,
                                 maxPieceLen: Int, iters: Int,
                                 seedCap: Int): Array[(String, Long, Double)] = {
    import scala.collection.mutable
    require(vocabSize > 0 && maxPieceLen > 0 && iters >= 0)
    // ---- seed: every substring up to maxPieceLen, count = Σ freq over
    //      (overlapping) occurrences; all single chars ride along ----
    val seed = mutable.HashMap.empty[String, Long]
    for ((w, f) <- dict; i <- 0 until w.length;
         j <- (i + 1) to math.min(i + maxPieceLen, w.length))
      seed.updateWith(w.substring(i, j))(c => Some(c.getOrElse(0L) + f))
    val chars: Set[String] = seed.keySet.filter(_.length == 1).toSet
    def cap(m: Iterable[(String, Long)], k: Int): Array[(String, Long)] =
      capVocab(m, k, chars)
    var vocab: Array[(String, Long)] = cap(seed, math.max(seedCap, vocabSize))
    // ---- hard-EM rounds: Viterbi under current costs, recount, prune ----
    for (_ <- 1 to iters) {
      val costs = toCosts(vocab)
      val counts = mutable.HashMap.empty[String, Long]
      for ((w, f) <- dict; p <- viterbi(w, costs, maxPieceLen))
        counts.updateWith(p)(c => Some(c.getOrElse(0L) + f))
      // unused single chars keep a floor count of 1 (never pruned, so the
      // encoder can always fall back to characters)
      chars.foreach(c => counts.updateWith(c)(v => Some(math.max(v.getOrElse(0L), 1L))))
      vocab = cap(counts, vocabSize)
    }
    // final prune unconditionally: with iters=0 the EM loop never runs and
    // the seed (capped at max(seedCap, vocabSize)) would escape vocabSize
    vocab = cap(vocab, vocabSize)
    val costs = toCosts(vocab)
    vocab.sortBy { case (p, c) => (-c, p) }
      .map { case (p, c) => (p, c, costs(p)) }
  }

  /** Prune to `k` pieces: every single character survives (segmentability
    * guarantee), the rest keep the top `k - |chars|` slots by
    * (count desc, piece asc) — fully deterministic.
    */
  private def capVocab(m: Iterable[(String, Long)], k: Int,
                       chars: Set[String]): Array[(String, Long)] = {
    val (cs, rest) = m.toArray.partition { case (p, _) => chars(p) }
    cs ++ rest.sortBy { case (p, c) => (-c, p) }.take(math.max(0, k - cs.length))
  }

  /** Distributed hard-EM: the same deterministic rounds as [[trainOnDict]]
    * with the word dictionary kept as a DataFrame — the over-`driverDictCap`
    * path for corpora whose unique-word dictionary (~10⁷–10⁸ rows at
    * 100 TB) cannot be collected. Mirrors [[BpeTrain]]'s split: per-word
    * work is a broadcast-state map pass, statistics are
    * explode+`groupBy(piece)` shuffles over the dictionary only, and the
    * driver holds nothing bigger than the vocabulary.
    *
    *  - SEED: one explode of every ≤`maxPieceLen` substring occurrence →
    *    `groupBy(piece).sum(freq)` (map-side combinable); the single-char
    *    rows (alphabet-bounded) collect separately, the rest prune to
    *    `max(seedCap, vocabSize)` via a deterministic
    *    (cnt desc, piece asc) `orderBy+limit` — a TakeOrdered, not a
    *    global sort.
    *  - EM ROUND: broadcast the (vocab-bounded) cost map, Viterbi-segment
    *    each word in a map pass, `explode(pieces)` +
    *    `groupBy(piece).sum(freq)`; the recount table has at most |vocab|
    *    rows, so the driver-side prune collects only vocabulary.
    *
    * Bit-identical to the driver path (spec-pinned): piece counts are
    * exact Long sums (associative — partitioning cannot perturb them),
    * costs are the same `-ln(count/total)` doubles, and [[viterbi]] is the
    * same pure function on both sides.
    */
  private[graft] def trainDistributed(dict: DataFrame, vocabSize: Int,
                                      maxPieceLen: Int, iters: Int,
                                      seedCap: Int): Array[(String, Long, Double)] = {
    val spark = dict.sparkSession
    import spark.implicits._
    require(vocabSize > 0 && maxPieceLen > 0 && iters >= 0)
    val d = dict.select(col("word"), col("freq").cast("long").as("freq")).cache()
    try {
      val subs = udf((w: String) => {
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < w.length) {
          var j = i + 1
          val jMax = math.min(i + maxPieceLen, w.length)
          while (j <= jMax) { out += w.substring(i, j); j += 1 }
          i += 1
        }
        out.toSeq
      })
      val seedCounts = d.select(explode(subs(col("word"))).as("piece"), col("freq"))
        .groupBy("piece").agg(sum("freq").as("cnt"))
      val charRows = seedCounts.where(length(col("piece")) === 1)
        .as[(String, Long)].collect()
      val chars: Set[String] = charRows.map(_._1).toSet
      val k0 = math.max(seedCap, vocabSize)
      val rest = seedCounts.where(length(col("piece")) > 1)
        .orderBy(col("cnt").desc, col("piece"))
        .limit(math.max(0, k0 - charRows.length))
        .as[(String, Long)].collect()
      var vocab: Array[(String, Long)] = charRows ++ rest
      for (_ <- 1 to iters) {
        val bc = spark.sparkContext.broadcast(toCosts(vocab))
        val seg = udf((w: String) => viterbi(w, bc.value, maxPieceLen))
        val counts = scala.collection.mutable.HashMap.from(
          d.select(explode(seg(col("word"))).as("piece"), col("freq"))
            .groupBy("piece").agg(sum("freq").as("cnt"))
            .as[(String, Long)].collect())
        bc.unpersist(false)
        // unused single chars keep a floor count of 1, as on the driver path
        chars.foreach(c => counts.updateWith(c)(v => Some(math.max(v.getOrElse(0L), 1L))))
        vocab = capVocab(counts, vocabSize, chars)
      }
      vocab = capVocab(vocab, vocabSize, chars)
      val costs = toCosts(vocab)
      vocab.sortBy { case (p, c) => (-c, p) }
        .map { case (p, c) => (p, c, costs(p)) }
    } finally d.unpersist()
  }

  /** piece → cost = −ln(count / total). */
  private def toCosts(vocab: Array[(String, Long)]): Map[String, Double] = {
    val total = vocab.map(_._2).sum.toDouble
    vocab.map { case (p, c) => p -> -math.log(c / total) }.toMap
  }

  /** Min-cost segmentation: DP left-to-right, `best(j) = min over i of
    * best(i) + cost(w[i..j))`, ties on cost broken by FEWER pieces then
    * by the lexicographically smaller piece ending at j.
    *
    * `oovCost = None` (train-time: the training corpus is covered by
    * construction) throws if some character is not in the vocabulary.
    * `oovCost = Some(c)` (encode-time over a NEW corpus) lets any unknown
    * single character segment as its own piece at cost `c` — one strange
    * document must not kill a 100 TB encode job.
    */
  def viterbi(w: String, costs: Map[String, Double],
              maxPieceLen: Int, oovCost: Option[Double] = None): Seq[String] = {
    val n = w.length
    if (n == 0) return Seq.empty
    val best = Array.fill(n + 1)(Double.PositiveInfinity)
    val bestNp = Array.fill(n + 1)(Int.MaxValue)
    val back = Array.fill(n + 1)(-1) // start index of the piece ending at j
    best(0) = 0.0; bestNp(0) = 0
    var j = 1
    while (j <= n) {
      var i = math.max(0, j - maxPieceLen)
      while (i < j) {
        if (best(i) < Double.PositiveInfinity) {
          val piece = w.substring(i, j)
          val pieceCost = costs.get(piece)
            .orElse(if (i == j - 1) oovCost else None) // unknown single char
          pieceCost.foreach { c =>
            val cand = best(i) + c
            val candNp = bestNp(i) + 1
            // ties on cost break by fewer pieces, then by the
            // lexicographically smaller piece ending at j (full determinism)
            val take = cand < best(j) ||
              (cand == best(j) && (candNp < bestNp(j) ||
                (candNp == bestNp(j) && back(j) >= 0 &&
                  piece < w.substring(back(j), j))))
            if (take) { best(j) = cand; bestNp(j) = candNp; back(j) = i }
          }
        }
        i += 1
      }
      j += 1
    }
    require(best(n) < Double.PositiveInfinity,
      s"unigram vocab cannot segment '$w' — character missing from vocabulary")
    // walk back
    val out = scala.collection.mutable.ListBuffer.empty[String]
    var pos = n
    while (pos > 0) { out.prepend(w.substring(back(pos), pos)); pos = back(pos) }
    out.toSeq
  }

  /** Appends `n_pieces` (long), `enc_cost` (total Viterbi cost, 6 dp) and
    * `n_oov` (pieces outside the vocabulary — the encode-health signal a
    * 100 TB job monitors for train/serve vocabulary drift) per document:
    * each whitespace word segmented independently, costs summed.
    * Broadcast-vocab UDF — per-row, scan speed. Null text yields null
    * outputs (the BpeTrain convention). The piece-length bound is
    * DERIVED from the vocabulary (an independent parameter smaller than
    * the longest trained piece would silently ignore those pieces), and
    * characters unseen at train time segment as single pieces at
    * `max(cost) + 1` — one strange document must not kill the job.
    */
  def withEncoding(df: DataFrame, textCol: String, vocab: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val costs: Map[String, Double] = vocab.select("piece", "cost")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    require(costs.nonEmpty, "withEncoding: empty vocabulary")
    val maxPieceLen = costs.keysIterator.map(_.length).max
    val oov = costs.valuesIterator.max + 1.0
    val codec = new UnigramCodec(
      spark.sparkContext.broadcast(costs), maxPieceLen, oov)
    val enc = udf((text: String) => Option(text).map { t =>
      val words = t.split(" ").filter(_.nonEmpty)
      var np = 0L
      var cost = 0.0
      var noov = 0L
      for (w <- words) {
        val (pieces, c, o) = codec.segment(w)
        np += pieces.length
        cost += c
        noov += o
      }
      (np, cost, noov)
    }.orNull)
    df.withColumn("__e__", enc(col(textCol)))
      .withColumn("n_pieces", col("__e__._1"))
      .withColumn("enc_cost", round(col("__e__._2"), 6))
      .withColumn("n_oov", col("__e__._3"))
      .drop("__e__")
  }

  /** Total order on candidate segmentations: (cost asc, piece count asc,
    * reversed piece sequence lexicographic) — the order [[viterbi]]'s
    * per-position tie-break composes into (see [[withPieces]]); rank 1
    * under it IS the Viterbi path. Suffix-monotone (appending the same
    * piece to two paths preserves their relative order: equal cost/np
    * deltas, and the reversed sequences gain the same HEAD element), which
    * is exactly the property that makes the n-best DP below exact.
    */
  private val segOrder: Ordering[(Double, Int, List[String])] =
    new Ordering[(Double, Int, List[String])] {
      def compare(a: (Double, Int, List[String]), b: (Double, Int, List[String])): Int = {
        val c = java.lang.Double.compare(a._1, b._1)
        if (c != 0) return c
        val n = Integer.compare(a._2, b._2)
        if (n != 0) return n
        // reversed-path lexicographic; equal-np paths have equal length
        var (x, y) = (a._3, b._3)
        while (x.nonEmpty && y.nonEmpty) {
          val h = x.head.compareTo(y.head)
          if (h != 0) return h
          x = x.tail; y = y.tail
        }
        Integer.compare(x.length, y.length)
      }
    }

  /** N-best segmentations of one word — the enumeration substrate of
    * SentencePiece's subword regularization (Kudo 2018 §4 samples from
    * the n-best list): up to `k` segmentations in [[segOrder]] (so entry 1
    * is exactly [[viterbi]]'s path), each as (total cost, pieces). The DP
    * keeps the k best (cost, np, REVERSED path) candidates per position;
    * exactness follows from suffix-monotonicity of the order. `oovCost`
    * as in [[viterbi]]. Cost O(len × maxPieceLen × k log k) per word —
    * per-row scan work.
    */
  def viterbiNBest(w: String, costs: Map[String, Double], maxPieceLen: Int,
                   k: Int, oovCost: Option[Double] = None): Seq[(Double, Seq[String])] = {
    require(k > 0, s"k must be positive, got $k")
    val n = w.length
    if (n == 0) return Seq((0.0, Seq.empty))
    // best(j): up to k candidates (cost, np, pieces REVERSED — prepend is
    // O(1) and segOrder compares reversed order anyway)
    val best = Array.fill(n + 1)(List.empty[(Double, Int, List[String])])
    best(0) = List((0.0, 0, Nil))
    var j = 1
    while (j <= n) {
      val cands = scala.collection.mutable.ArrayBuffer.empty[(Double, Int, List[String])]
      var i = math.max(0, j - maxPieceLen)
      while (i < j) {
        val piece = w.substring(i, j)
        val pc = costs.get(piece).orElse(if (i == j - 1) oovCost else None)
        pc.foreach { c =>
          for ((bc, bnp, bp) <- best(i)) cands += ((bc + c, bnp + 1, piece :: bp))
        }
        i += 1
      }
      best(j) = cands.sorted(segOrder).take(k).toList
      j += 1
    }
    require(best(n).nonEmpty,
      s"unigram vocab cannot segment '$w' — character missing from vocabulary")
    best(n).map { case (c, _, rev) => (c, rev.reverse) }
  }

  /** N-best table: one row per (doc, word occurrence, rank) —
    * (idCol, wpos, word, rank, pieces, n_pieces, cost 6dp), with `wpos`
    * the 1-based word position and `rank` 1-based in [[segOrder]] (rank 1
    * = the Viterbi path). Null text contributes no rows. Per-row
    * broadcast-vocab work (posexplode + UDF) — no shuffle, scan speed;
    * per-task word memo as in [[UnigramCodec]]. A sampler draws from the
    * ranked list downstream (softmax over -cost/alpha) — the enumeration
    * itself stays deterministic and SQL-replayable (the s35 oracle ranks
    * the same recursive-CTE path enumeration).
    */
  def nbestTable(df: DataFrame, idCol: String, textCol: String,
                 vocab: DataFrame, k: Int): DataFrame = {
    val spark = df.sparkSession
    val costs: Map[String, Double] = vocab.select("piece", "cost")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    require(costs.nonEmpty, "nbestTable: empty vocabulary")
    val maxPieceLen = costs.keysIterator.map(_.length).max
    val oov = costs.valuesIterator.max + 1.0
    val bc = spark.sparkContext.broadcast(costs)
    val nb = udf(new (String => Seq[(Double, Seq[String])]) with Serializable {
      @transient private lazy val memo =
        new java.util.HashMap[String, Seq[(Double, Seq[String])]]()
      def apply(w: String): Seq[(Double, Seq[String])] = {
        val hit = memo.get(w)
        if (hit != null) return hit
        val out = viterbiNBest(w, bc.value, maxPieceLen, k, oovCost = Some(oov))
        if (memo.size < (1 << 16)) memo.put(w, out)
        out
      }
    })
    df.filter(col(textCol).isNotNull)
      .select(col(idCol),
        posexplode(filter(split(col(textCol), " "), w => w =!= ""))
          .as(Seq("__wp__", "word")))
      .select(col(idCol), (col("__wp__") + 1).as("wpos"), col("word"),
        posexplode(nb(col("word"))).as(Seq("__rk__", "__s__")))
      .select(col(idCol), col("wpos"), col("word"),
        (col("__rk__") + 1).as("rank"),
        col("__s__._2").as("pieces"),
        size(col("__s__._2")).cast("long").as("n_pieces"),
        round(col("__s__._1"), 6).as("cost"))
  }

  /** Seeded subword-regularization sampling (Kudo 2018 §4): ONE sampled
    * segmentation per word occurrence, drawn from the [[viterbiNBest]]
    * list with probability ∝ exp(−alpha·cost) — `alpha = 0` is uniform
    * over the n-best, large alpha concentrates on the Viterbi path.
    * Output (idCol, wpos, word, rank, pieces, n_pieces, cost): `rank` is
    * the chosen candidate's position in the n-best order.
    *
    * Determinism contract (what the s37 oracle replays): the draw is the
    * repo's portable uniform — `u = first 8 md5 hex chars of
    * "<id>:<wpos>:<seed>" / 2^32` (ShardExport's formula, per OCCURRENCE
    * so repeated words sample independently) — and the inverse-CDF walk
    * uses weights `round(exp(−alpha·cost), 9)` cumulated in rank order,
    * choosing the first rank whose running sum exceeds `u · total`.
    * Every step is the same double arithmetic in the same order in any
    * engine, so DuckDB replays the selection exactly (the exp/libm
    * bitwise-agreement assumption documented in DomainReweight, held
    * empirically across rounds). Per-row broadcast-vocab work with the
    * n-best memo — no shuffle, scan speed.
    */
  /** Half-UP rounding to 9 decimals for the sampling weights. DuckDB's
    * `ROUND(x, 9)` is half-AWAY-from-zero; the weights are nonnegative,
    * so half-up is the identical rule — whereas `math.rint` is IEEE
    * half-to-EVEN and ranks the two candidates differently at an exact
    * midpoint, breaking the bit-exact cross-engine draw replay the s37
    * oracle contract requires. Weights are ≤ 1 (costs ≥ 0), so the
    * `x*1e9 + 0.5` sum is exact integer territory, no overflow.
    */
  private[graft] def roundHalfUp9(x: Double): Double =
    math.floor(x * 1e9 + 0.5) / 1e9

  def sampledTable(df: DataFrame, idCol: String, textCol: String,
                   vocab: DataFrame, k: Int, alpha: Double,
                   seed: Long): DataFrame = {
    require(alpha >= 0, s"alpha must be >= 0, got $alpha")
    val spark = df.sparkSession
    val costs: Map[String, Double] = vocab.select("piece", "cost")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    require(costs.nonEmpty, "sampledTable: empty vocabulary")
    val maxPieceLen = costs.keysIterator.map(_.length).max
    val oov = costs.valuesIterator.max + 1.0
    val bc = spark.sparkContext.broadcast(costs)
    // u comes in as a COLUMN from the canonical codegen'd draw (one
    // construction, one place — CorpusShuffle.draw); only the n-best walk
    // runs in the UDF
    val pick = udf(new ((Double, String) => (Int, Seq[String], Double))
        with Serializable {
      @transient private lazy val memo =
        new java.util.HashMap[String, Seq[(Double, Seq[String])]]()
      private def nbest(w: String): Seq[(Double, Seq[String])] = {
        val hit = memo.get(w)
        if (hit != null) return hit
        val out = viterbiNBest(w, bc.value, maxPieceLen, k, oovCost = Some(oov))
        if (memo.size < (1 << 16)) memo.put(w, out)
        out
      }
      def apply(u: Double, w: String): (Int, Seq[String], Double) = {
        val cands = nbest(w)
        // inverse-CDF walk in rank order over rounded softmax weights
        val ws = cands.map { case (c, _) => roundHalfUp9(math.exp(-alpha * c)) }
        val total = ws.sum
        // all weights rounded to zero (alpha·minCost > ~21): degenerate
        // distribution — take the Viterbi path, as the oracle's COALESCE does
        if (total == 0.0) {
          val (c, ps) = cands.head
          return (1, ps, c)
        }
        val t = u * total
        var cum = 0.0
        var i = 0
        while (i < ws.length - 1 && { cum += ws(i); cum <= t }) i += 1
        val (c, ps) = cands(i)
        (i + 1, ps, c)
      }
    })
    val u = graft.operators.sampling.CorpusShuffle.draw(
      concat_ws(":", col(idCol).cast("string"), col("wpos").cast("string")),
      seed, plusHalf = false)
    df.filter(col(textCol).isNotNull)
      .select(col(idCol),
        posexplode(filter(split(col(textCol), " "), w => w =!= ""))
          .as(Seq("__wp__", "word")))
      .select(col(idCol), (col("__wp__") + 1).as("wpos"), col("word"))
      .select(col(idCol), col("wpos"), col("word"),
        pick(u, col("word")).as("__s__"))
      .select(col(idCol), col("wpos"), col("word"),
        col("__s__._1").as("rank"),
        col("__s__._2").as("pieces"),
        size(col("__s__._2")).cast("long").as("n_pieces"),
        round(col("__s__._3"), 6).as("cost"))
  }

  /** Deterministic piece→id mapping over a trained vocabulary: ids are
    * assigned 0-based by (count desc, piece asc) — exactly [[train]]'s
    * output row order — so an oracle recomputes them as a rank over the
    * persisted (piece, cnt) table. The unigram analogue of
    * [[BpeTrain.vocabOf]]'s id layout.
    */
  def vocabIds(vocab: DataFrame): Map[String, Long] =
    vocab.select("piece", "cnt").collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (p, c) => (-c, p) }
      .zipWithIndex.map { case ((p, _), i) => p -> i.toLong }.toMap

  /** Full tokenizer output — the columns [[SequencePack]]/TokenBudget and
    * a training-data writer consume (the unigram counterpart of
    * [[BpeTrain.withBpeTokenIds]]): appends `pieces array<string>` (every
    * word's Viterbi segmentation, concatenated across words in order),
    * `piece_ids array<long>` (via [[vocabIds]]; OOV pieces map to -1, the
    * BPE convention), `n_pieces`, `enc_cost`. Null text yields null
    * outputs. Broadcast-vocab per-row UDF — no shuffle, scan speed.
    *
    * Determinism of the PIECE SEQUENCE itself (what the s33 oracle
    * replays): among all min-cost segmentations with minimal piece count,
    * [[viterbi]] returns the reverse-lexicographic minimum — smallest
    * last piece, then smallest second-to-last, and so on. (Costs are
    * additive, so any optimal path's prefix to each of its cuts is itself
    * optimal; the DP's per-position tie-break — smallest piece ending at
    * j — therefore composes into exactly that global order.) An oracle
    * enumerates candidate paths and picks MIN(cost), MIN(n_pieces),
    * MIN(reversed piece list); spec-pinned against brute force on random
    * vocabularies.
    */
  def withPieces(df: DataFrame, textCol: String, vocab: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val rows = vocab.select("piece", "cnt", "cost").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    require(rows.nonEmpty, "withPieces: empty vocabulary")
    val costs: Map[String, Double] = rows.map { case (p, _, c) => p -> c }.toMap
    val ids: Map[String, Long] = rows.map { case (p, c, _) => (p, c) }
      .sortBy { case (p, c) => (-c, p) }
      .zipWithIndex.map { case ((p, _), i) => p -> i.toLong }.toMap
    val maxPieceLen = costs.keysIterator.map(_.length).max
    val oov = costs.valuesIterator.max + 1.0
    val codec = new UnigramCodec(
      spark.sparkContext.broadcast(costs), maxPieceLen, oov)
    val bcI = spark.sparkContext.broadcast(ids)
    val enc = udf((text: String) => Option(text).map { t =>
      val pieces = scala.collection.mutable.ArrayBuffer.empty[String]
      var cost = 0.0
      for (w <- t.split(" ") if w.nonEmpty) {
        val (ps, c, _) = codec.segment(w)
        pieces ++= ps
        cost += c
      }
      (pieces.toSeq, pieces.map(p => bcI.value.getOrElse(p, -1L)).toSeq,
        pieces.length.toLong, cost)
    }.orNull)
    df.withColumn("__t__", enc(col(textCol)))
      .withColumn("pieces", col("__t__._1"))
      .withColumn("piece_ids", col("__t__._2"))
      .withColumn("n_pieces", col("__t__._3"))
      .withColumn("enc_cost", round(col("__t__._4"), 6))
      .drop("__t__")
  }
}

/** Broadcast-vocab Viterbi segmenter with a per-task word→(pieces, cost)
  * memo: corpora are Zipfian, so the bounded cache over the unique words a
  * task sees eliminates nearly all repeat segmentation work — the same
  * economics that let training run on the unique-word dictionary, applied
  * to the encode path (mirrors [[BpeCodec]]'s memo next door).
  * `@transient lazy` — rebuilt empty in each deserialized task closure, so
  * no cross-task sharing; capped so one adversarial high-cardinality
  * partition cannot balloon executor memory. Pure memoization: output is
  * identical with or without.
  */
private[graft] final class UnigramCodec(
    bc: org.apache.spark.broadcast.Broadcast[Map[String, Double]],
    maxPieceLen: Int, oov: Double) extends Serializable {
  @transient private lazy val memo =
    new java.util.HashMap[String, (Seq[String], Double, Int)]()
  private val memoCap = 1 << 16

  /** (pieces, total cost, OOV piece count) for one word. */
  def segment(w: String): (Seq[String], Double, Int) = {
    val hit = memo.get(w)
    if (hit != null) return hit
    val ps = UnigramTokenizer.viterbi(w, bc.value, maxPieceLen, oovCost = Some(oov))
    var c = 0.0
    var noov = 0
    ps.foreach { p =>
      bc.value.get(p) match {
        case Some(pc) => c += pc
        case None => c += oov; noov += 1
      }
    }
    val out = (ps, c, noov)
    if (memo.size < memoCap) memo.put(w, out)
    out
  }
}
