package graft.operators.text

import org.apache.spark.sql.{Column, DataFrame, functions => F}
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding merge learning (Sennrich et al. 2016) —
  * the "train a tokenizer on the corpus" stage of an LLM data pipeline.
  *
  * Shape: BPE statistics live on the UNIQUE-WORD frequency dictionary, not
  * the corpus — one corpus shuffle builds `(word, freq)`, and every merge
  * round then runs on that (much smaller) cached dictionary:
  * adjacent-symbol pairs are exploded with their word frequencies, counted
  * (map-side combinable shuffle over the dictionary only), and the winning
  * pair — max count, ties broken lexicographically by (left, right) so the
  * result is deterministic on any partitioning — is folded back into the
  * symbol arrays with a per-row `aggregate` HOF (no shuffle). The 1-row
  * `limit(1).collect()` per round is a scalar argmax, not a data collect.
  *
  * At 100 TB the unique-word dictionary is ~10⁷–10⁸ rows — comfortably
  * distributed, and each of the k rounds touches only it. The corpus
  * itself is read once.
  *
  * No reference counterpart (the reference has no tokenizer training);
  * north-star extension per the builder prompt. Encoding with the learned
  * merges ([[encode]]) is pure per-row HOF arithmetic — scan speed.
  */
object BpeTrain {

  /** One BPE merge step applied to a symbol array: greedy left-to-right
    * fold replacing adjacent (l, r) with l+r. The guard keeps `element_at`
    * off the empty accumulator; a freshly merged symbol never re-merges in
    * the same pass (it no longer equals `l` — standard BPE semantics).
    */
  private def applyMerge(syms: Column, l: String, r: String): Column =
    F.aggregate(
      syms,
      F.array().cast("array<string>"),
      (acc, x) =>
        F.when(
          F.size(acc) > 0 && F.element_at(acc, -1) === F.lit(l) && x === F.lit(r),
          F.concat(F.slice(acc, F.lit(1), F.size(acc) - 1), F.array(F.lit(l + r))))
          .otherwise(F.concat(acc, F.array(x))))

  private def charsOf(word: Column): Column = F.split(word, "")

  /** Adjacent-pair struct array of a symbol array (empty for 1-symbol words). */
  private def pairsOf(syms: Column): Column =
    F.when(F.size(syms) >= 2,
        F.transform(F.sequence(F.lit(0), F.size(syms) - 2),
          i => F.struct(F.element_at(syms, i + 1).as("l"),
            F.element_at(syms, i + 2).as("r"))))
      .otherwise(F.array().cast("array<struct<l:string,r:string>>"))

  /** Learn `numMerges` merges from the corpus. Returns (rank, left, right,
    * pair_count) ordered by rank; stops early if no pair remains.
    *
    * Dictionaries at or under `driverDictCap` unique words take a driver
    * fast path (identical algorithm and tie-breaking on the collected
    * word-frequency dict — k merge rounds cost zero Spark jobs instead of
    * ~3k tiny ones). Past the cap — the 100 TB regime — the rounds run
    * distributed on the cached dictionary. Same pattern as
    * [[graft.operators.dedup.Components.labels]]' bounded union-find.
    */
  def learnMerges(df: DataFrame, textCol: String, numMerges: Int,
                  driverDictCap: Int = 100000): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val dict = df.select(explode(split(col(textCol), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("freq"))
    val merges =
      if (driverDictCap > 0 && dict.limit(driverDictCap + 1).count() <= driverDictCap)
        driverLearnMerges(
          dict.as[(String, Long)].collect(), numMerges)
      else distributedLearnMerges(dict, numMerges)._1
    merges.toDF("rank", "left", "right", "pair_count")
  }

  /** Reference algorithm on the collected (word, freq) dict — bounded by
    * `driverDictCap`, exact same argmax + lexicographic tie-break as the
    * distributed path (asserted equal in LmTokenizerSpec).
    */
  private def driverLearnMerges(dict: Array[(String, Long)],
                                numMerges: Int): Seq[(Int, String, String, Long)] = {
    val syms = dict.map { case (w, f) => (w.split("").toBuffer, f) }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    for (rank <- 1 to numMerges if merges.length == rank - 1) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      for ((s, f) <- syms; i <- 0 until s.length - 1)
        counts.updateWith((s(i), s(i + 1)))(c => Some(c.getOrElse(0L) + f))
      if (counts.nonEmpty) {
        val ((l, r), cnt) = counts.minBy { case ((a, b), c) => (-c, a, b) }
        merges += ((rank, l, r, cnt))
        for ((s, _) <- syms) {
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          for (x <- s) {
            if (out.nonEmpty && out.last == l && x == r) out(out.length - 1) = l + r
            else out += x
          }
          s.clear(); s ++= out
        }
      }
    }
    merges.toSeq
  }

  /** Distributed merge learning, BATCHED: each Spark round computes the
    * pair-count table once and applies a PREFIX of the (-cnt, l, r)-sorted
    * candidates in one projection, instead of one round per merge — cutting
    * the job count per merge from ~3 to ~3/|batch| (a 30k-merge tokenizer
    * training stops being ~100k tiny jobs).
    *
    * The batch is EXACTLY equivalent to the sequential algorithm — not the
    * usual lossy approximation — because a candidate is admitted only while
    * two guards hold, which together imply it would still be the argmax at
    * its sequential turn:
    *
    *  1. interaction: its symbols are disjoint from every already-selected
    *     merge's `{l, r, l+r}` — so earlier batch members change neither
    *     its count nor its occurrences;
    *  2. new-pair dominance: its count strictly exceeds every pair a prior
    *     selected merge could CREATE. A merge (l,r) only creates pairs
    *     `(x, lr)` (count ≤ current cnt(x, l)) and `(lr, y)` (count ≤
    *     current cnt(r, y)), so `max(rightMax(l), leftMax(r))` over the
    *     selected merges bounds every created pair; `≤` stops the batch
    *     (a tie could win the (l, r) tie-break).
    *
    * Selection stops at the first rejected candidate (prefix property:
    * every unselected pair with unchanged count stays ranked behind every
    * selected one). Asserted equal to the driver reference path in
    * LmTokenizerSpec, including on seeded random corpora.
    */
  private[graft] def distributedLearnMerges(
      dict: DataFrame, numMerges: Int,
      batchCap: Int = 32): (Seq[(Int, String, String, Long)], Int) = {
    var cur = dict.withColumn("syms", charsOf(col("word")))
      .select("syms", "freq").cache()
    cur.count() // materialize before the rounds reuse it
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var rounds = 0
    var exhausted = false
    try {
      while (merges.length < numMerges && !exhausted) {
        val pairCounts = cur.select(explode(pairsOf(col("syms"))).as("p"), col("freq"))
          .groupBy(col("p.l"), col("p.r")).agg(sum("freq").as("cnt"))
          .cache()
        val budget = math.min(batchCap, numMerges - merges.length)
        val top = pairCounts.orderBy(col("cnt").desc, col("l"), col("r"))
          .limit(budget).collect()
          .map(t => (t.getString(0), t.getString(1), t.getLong(2)))
        if (top.isEmpty) { exhausted = true; pairCounts.unpersist(); }
        else {
          // per-symbol adjacency maxima for guard 2 — vocab-sized
          // (alphabet + merges so far), never corpus-sized
          val leftMax = pairCounts.groupBy("l").agg(max("cnt"))
            .collect().map(t => t.getString(0) -> t.getLong(1)).toMap
          val rightMax = pairCounts.groupBy("r").agg(max("cnt"))
            .collect().map(t => t.getString(0) -> t.getLong(1)).toMap
          pairCounts.unpersist()
          val sel = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
          val usedSyms = scala.collection.mutable.HashSet.empty[String]
          var createdBound = Long.MinValue
          var stop = false
          for ((l, r, cnt) <- top if !stop) {
            val interacts = usedSyms.contains(l) || usedSyms.contains(r)
            if (sel.nonEmpty && (interacts || cnt <= createdBound)) stop = true
            else {
              sel += ((l, r, cnt))
              usedSyms ++= Seq(l, r, l + r)
              createdBound = math.max(createdBound,
                math.max(rightMax.getOrElse(l, 0L), leftMax.getOrElse(r, 0L)))
            }
          }
          for ((l, r, cnt) <- sel) merges += ((merges.length + 1, l, r, cnt))
          // one projection applies the whole batch in rank order (the fold
          // nests ≤ batchCap HOFs — bounded, unlike a per-merge plan chain)
          var next = cur.withColumn("syms",
            sel.foldLeft(col("syms")) { case (s, (l, r, _)) => applyMerge(s, l, r) })
          rounds += 1
          // truncate lineage periodically: each round adds one projection to
          // the logical plan, so analysis cost would grow O(rounds²) over a
          // long training run even though execution reads the cache
          if (rounds % 16 == 0) {
            next = next.localCheckpoint(true)
            cur.unpersist()
          } else {
            next = next.cache()
            next.count()
            cur.unpersist()
          }
          cur = next
        }
      }
    } finally cur.unpersist()
    (merges.toSeq, rounds)
  }

  /** Above this merge-table size the HOF encode switches to the UDF path:
    * the fold builds one NESTED `aggregate` expression per merge, and at
    * the documented numMerges=1000 default that ~1000-deep tree
    * stack-overflows Catalyst analysis (and would be a codegen blowup even
    * where it survived). 16 nested HOFs analyze and codegen comfortably.
    */
  private val hofMergeCap = 16

  /** Token count per row after applying `merges` (in rank order) to every
    * whitespace word. Small merge tables run as pure per-row nested HOFs
    * (whole-stage codegen, no UDF); past [[hofMergeCap]] the identical
    * greedy left-to-right algorithm runs as a Scala loop inside a UDF over
    * the (driver-side, vocabulary-sized) merge table — same output,
    * asserted in LmTokenizerSpec. Either way: no shuffle, scan speed.
    */
  def withBpeTokenCount(df: DataFrame, textCol: String,
                        merges: Seq[(String, String)],
                        outCol: String = "n_bpe_tokens"): DataFrame =
    if (merges.size <= hofMergeCap) {
      def encodeWord(w: Column): Column =
        merges.foldLeft(charsOf(w)) { case (syms, (l, r)) => applyMerge(syms, l, r) }
      val words = F.filter(F.split(col(textCol), " "), _ =!= "")
      df.withColumn(outCol,
        F.aggregate(F.transform(words, w => F.size(encodeWord(w))),
          F.lit(0), (acc, n) => acc + n).cast("long"))
    } else {
      val table = merges.toArray
      val enc = F.udf { (text: String) =>
        // Option return ⇒ null text stays null, matching the HOF path
        Option(text).map { t =>
          var total = 0L
          for (w <- t.split(" ") if w.nonEmpty) {
            var syms: Array[String] = w.split("")
            var m = 0
            while (m < table.length && syms.length > 1) {
              val (l, r) = table(m)
              val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
              var j = 0
              while (j < syms.length) {
                if (out.nonEmpty && out(out.length - 1) == l && syms(j) == r)
                  out(out.length - 1) = l + r
                else out += syms(j)
                j += 1
              }
              syms = out.toArray
              m += 1
            }
            total += syms.length
          }
          total
        }
      }
      df.withColumn(outCol, enc(col(textCol)))
    }

  /** Vocabulary induced by a training run: base alphabet (every distinct
    * character of the corpus' words, sorted) gets ids 0..|A|-1, then each
    * merge's output symbol in rank order — the standard BPE id layout.
    */
  def vocabOf(df: DataFrame, textCol: String,
              merges: Seq[(String, String)]): Seq[(Long, String)] = {
    val alphabet = df
      .select(explode(split(regexp_replace(col(textCol), " ", ""), "")).as("ch"))
      .filter(col("ch") =!= "")
      .distinct().collect().map(_.getString(0)).sorted
    val tokens = alphabet.toSeq ++ merges.map { case (l, r) => l + r }
    tokens.zipWithIndex.map { case (t, i) => (i.toLong, t) }
  }

  /** Encode each row's text to BPE token IDS (words greedily merged in
    * rank order, symbols mapped through `vocab`, word encodings
    * concatenated in order). Symbols outside the vocabulary — characters
    * never seen at train time — encode as -1, so OOV is visible instead of
    * silently dropped. Always the UDF path: the vocab map is driver-side
    * model state either way. No shuffle; scan speed.
    */
  def withBpeTokenIds(df: DataFrame, textCol: String,
                      merges: Seq[(String, String)], vocab: Map[String, Long],
                      outCol: String = "bpe_ids"): DataFrame = {
    val table = merges.toArray
    val enc = F.udf { (text: String) =>
      Option(text).map { t =>
        val out = scala.collection.mutable.ArrayBuffer.empty[Long]
        for (w <- t.split(" ") if w.nonEmpty) {
          var syms: Array[String] = w.split("")
          var m = 0
          while (m < table.length && syms.length > 1) {
            val (l, r) = table(m)
            val merged = new scala.collection.mutable.ArrayBuffer[String](syms.length)
            var j = 0
            while (j < syms.length) {
              if (merged.nonEmpty && merged(merged.length - 1) == l && syms(j) == r)
                merged(merged.length - 1) = l + r
              else merged += syms(j)
              j += 1
            }
            syms = merged.toArray
            m += 1
          }
          syms.foreach(sym => out += vocab.getOrElse(sym, -1L))
        }
        out.toSeq
      }
    }
    df.withColumn(outCol, enc(col(textCol)))
  }
}
