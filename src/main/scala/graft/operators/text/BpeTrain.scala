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
      else distributedLearnMerges(dict, numMerges)
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

  private def distributedLearnMerges(dict: DataFrame,
                                     numMerges: Int): Seq[(Int, String, String, Long)] = {
    var cur = dict.withColumn("syms", charsOf(col("word")))
      .select("syms", "freq").cache()
    cur.count() // materialize before the rounds reuse it
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    try {
      for (rank <- 1 to numMerges if merges.length == rank - 1) {
        val top = cur.select(explode(pairsOf(col("syms"))).as("p"), col("freq"))
          .groupBy(col("p.l"), col("p.r")).agg(sum("freq").as("cnt"))
          .orderBy(col("cnt").desc, col("l"), col("r"))
          .limit(1).collect()
        if (top.nonEmpty) {
          val (l, r, cnt) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
          merges += ((rank, l, r, cnt))
          val next = cur
            .withColumn("syms", applyMerge(col("syms"), l, r))
            .cache()
          next.count()
          cur.unpersist()
          cur = next
        }
      }
    } finally cur.unpersist()
    merges.toSeq
  }

  /** Token count per row after applying `merges` (in rank order) to every
    * whitespace word — pure per-row nested HOFs, no shuffle, no UDF.
    */
  def withBpeTokenCount(df: DataFrame, textCol: String,
                        merges: Seq[(String, String)],
                        outCol: String = "n_bpe_tokens"): DataFrame = {
    def encodeWord(w: Column): Column =
      merges.foldLeft(charsOf(w)) { case (syms, (l, r)) => applyMerge(syms, l, r) }
    val words = F.filter(F.split(col(textCol), " "), _ =!= "")
    df.withColumn(outCol,
      F.aggregate(F.transform(words, w => F.size(encodeWord(w))),
        F.lit(0), (acc, n) => acc + n).cast("long"))
  }
}
