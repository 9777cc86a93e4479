package graft.operators.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Near-duplicate text detection operators over a document table.
  *
  * Scale guidance (100 TB):
  *  - [[shingles]] / all per-document steps are pure per-row Catalyst
  *    expressions — no shuffle, no UDFs.
  *  - [[jaccardSelfJoin]] (inverted index) shuffles once on the shingle and
  *    once on the pair key. Its Achilles heel is posting-list skew: a
  *    shingle present in k documents emits k² pairs, so hot shingles
  *    (boilerplate) square. `maxDocFreq` caps the posting list — standard
  *    df-capping; near-dup pairs share many shingles, so dropping the few
  *    ultra-common ones does not lose true pairs in practice.
  *  - [[minHashSelfJoin]] is the banded-LSH scale path: signature size is
  *    constant per document (shuffle volume linear in corpus size, not in
  *    pair count), candidates collide only on full r-hash bands, and exact
  *    Jaccard re-verification keeps the output exact up to the configured
  *    miss probability.
  */
object TextDedup {

  /** Distinct word n-gram shingles per document (per-row, no shuffle;
    * native single-pass [[graft.functions.WordShingles]] expression —
    * this is the corpus-wide hot loop every text-dedup operator shares).
    */
  def shingles(df: DataFrame, idCol: String, textCol: String, n: Int = 3): DataFrame = {
    val quoted = "`" + textCol.replace("`", "``") + "`"
    df.select(col(idCol).as("doc_id"),
        expr(s"word_shingles($quoted, $n)").as("shingles"))
      .filter(size(col("shingles")) >= 1)
  }

  /** Ordered in-list pair generation + co-occurrence count shared by the
    * posting-list joins: `ds` must be a SORTED id array per row.
    */
  private def pairCounts(postings: DataFrame, countName: String): DataFrame =
    postings
      .select(explode(expr(
        """flatten(transform(ds, (x, i) ->
          |  transform(slice(ds, i + 2, size(ds)), y -> struct(x as a, y as b))))""".stripMargin)).as("p"))
      .groupBy(col("p.a").as("a_id"), col("p.b").as("b_id"))
      .agg(count(lit(1)).as(countName))

  /** Exact Jaccard self-join via an inverted shingle index, with a
    * document-frequency cap on shingles (skew guard). Returns pairs with
    * `jaccard >= threshold` computed over ALL shingles of each doc (the cap
    * only prunes candidate generation; `n_common` counts capped shingles, so
    * the cap must be mirrored in any oracle).
    */
  def jaccardSelfJoin(sh: DataFrame, threshold: Double, maxDocFreq: Int = 500): DataFrame = {
    val counts = sh.select(col("doc_id"), size(col("shingles")).as("n_sh"))
    val inv = sh.select(col("doc_id"), explode(col("shingles")).as("sh"))
    // Posting-list formulation: ONE shuffle builds the per-shingle doc list;
    // the df-cap is a free filter on the list size (a shingle in k docs
    // otherwise yields k² pair rows); ordered pairs are generated inside
    // each list, then one shuffle aggregates pair co-occurrence counts.
    // (The naive inverted-index SELF-JOIN shuffles the index twice more
    // and needs a separate doc-frequency aggregation for the cap.)
    val postings = inv.groupBy(col("sh"))
      .agg(sort_array(collect_list(col("doc_id"))).as("ds"))
      .filter(size(col("ds")) <= maxDocFreq && size(col("ds")) >= 2)
    val pairs = pairCounts(postings, "n_common")
    pairs
      .join(counts.select(col("doc_id").as("a_id"), col("n_sh").as("a_n")), "a_id")
      .join(counts.select(col("doc_id").as("b_id"), col("n_sh").as("b_n")), "b_id")
      .withColumn("jaccard", round(col("n_common").cast("double") /
        (col("a_n") + col("b_n") - col("n_common")), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("a_id"), col("b_id"), col("n_common"), col("jaccard"))
  }

  /** Exact n-gram CONTAINMENT self-join — the asymmetric near-dup signal
    * Jaccard structurally misses: a short document quoted wholesale
    * inside a much longer one has containment(short→long) ≈ 1 while
    * Jaccard ≈ |short|/|long| ≈ 0 (the classic boilerplate-quote /
    * doc-subset trap in training-data dedup; the fix is to screen on
    * max-containment, not just symmetric overlap). Same single-shuffle
    * posting-list formulation and df-cap as [[jaccardSelfJoin]]; emits
    * both directions' containments per unordered pair and keeps pairs
    * where EITHER is at or above `threshold`.
    *
    * @return (a_id, b_id, n_common, containment_a = n_common/|A|,
    *         containment_b = n_common/|B|), rounded to 4 dp
    */
  def containmentSelfJoin(sh: DataFrame, threshold: Double,
                          maxDocFreq: Int = 500): DataFrame = {
    val counts = sh.select(col("doc_id"), size(col("shingles")).as("n_sh"))
    val inv = sh.select(col("doc_id"), explode(col("shingles")).as("sh"))
    val postings = inv.groupBy(col("sh"))
      .agg(sort_array(collect_list(col("doc_id"))).as("ds"))
      .filter(size(col("ds")) <= maxDocFreq && size(col("ds")) >= 2)
    val pairs = pairCounts(postings, "n_common")
    pairs
      .join(counts.select(col("doc_id").as("a_id"), col("n_sh").as("a_n")), "a_id")
      .join(counts.select(col("doc_id").as("b_id"), col("n_sh").as("b_n")), "b_id")
      .withColumn("containment_a",
        round(col("n_common").cast("double") / col("a_n"), 4))
      .withColumn("containment_b",
        round(col("n_common").cast("double") / col("b_n"), 4))
      .filter(greatest(col("containment_a"), col("containment_b")) >= threshold)
      .select(col("a_id"), col("b_id"), col("n_common"),
        col("containment_a"), col("containment_b"))
  }

  /** Pick `(bands, rowsPerBand)` for a target Jaccard threshold and hash
    * budget. The banding S-curve's inflection sits at `(1/b)^(1/r)`; among
    * factorizations with `b*r <= numHashes` (and most of the budget used)
    * this chooses the one whose inflection lands closest to — without
    * drifting far above — the threshold, so near-threshold pairs keep a
    * high collision probability while sub-threshold candidate volume stays
    * banded away. Standard MMDS ch.3 tuning, exposed so callers stop
    * hand-picking (24, 4) for every threshold.
    */
  def banding(threshold: Double, numHashes: Int = 96): (Int, Int) = {
    require(threshold > 0 && threshold < 1, "threshold must be in (0,1)")
    require(numHashes >= 2, "numHashes must be >= 2")
    val options = for {
      r <- 1 to numHashes
      b = numHashes / r
      if b >= 1 && b * r > numHashes / 2 // don't waste most of the budget
    } yield (b, r)
    options.minBy { case (b, r) =>
      val inflection = math.pow(1.0 / b, 1.0 / r)
      // drifting above the threshold MISSES true pairs (the expensive
      // error); drifting below only admits extra verify candidates
      if (inflection > threshold) 10 * (inflection - threshold)
      else threshold - inflection
    }
  }

  /** [[minHashSelfJoin]] with `(bands, rowsPerBand)` auto-tuned for the
    * threshold via [[banding]].
    */
  def minHashSelfJoinTuned(sh: DataFrame, threshold: Double,
                           numHashes: Int = 96): DataFrame = {
    val (b, r) = banding(threshold, numHashes)
    minHashSelfJoin(sh, threshold, bands = b, rowsPerBand = r)
  }

  /** Banded MinHash-LSH self-join: signature → bands of `r` hashes →
    * equi-join on (band, band-slice) → dedup → exact Jaccard verify via
    * `array_intersect` on the full shingle sets. Output == exact output for
    * pairs above `threshold` up to the banding miss probability
    * ((1 − t^r)^b; e.g. t=0.8, r=4, b=24 → ~3e-6).
    */
  def minHashSelfJoin(sh: DataFrame, threshold: Double,
                      bands: Int = 24, rowsPerBand: Int = 4): DataFrame = {
    val numHashes = bands * rowsPerBand
    // native double-hashing signature (graft.functions.MinHashSig): 2 hash
    // evals per shingle, not numHashes — see the expression's scaladoc
    val sig = sh.withColumn("sig", expr(s"minhash_sig(shingles, $numHashes)"))
    // one row per (doc, band); band key = the band's r-hash slice. SKINNY
    // rows only — dragging the full shingle array through both sides of
    // the banded self-join would multiply its shuffle volume by 2×bands;
    // shingles are re-joined from `docs` just for the surviving candidates
    val keyed = sig.select(col("doc_id"),
      posexplode(expr(s"transform(sequence(0, ${bands - 1}), " +
        s"b -> slice(sig, b * $rowsPerBand + 1, $rowsPerBand))")).as(Seq("band", "key")))
    val candidates = keyed.as("x").join(keyed.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
      .distinct()
    val docs = sh.select(col("doc_id"), col("shingles"))
    candidates
      .join(docs.select(col("doc_id").as("a_id"), col("shingles").as("a_sh")), "a_id")
      .join(docs.select(col("doc_id").as("b_id"), col("shingles").as("b_sh")), "b_id")
      .withColumn("n_common", size(array_intersect(col("a_sh"), col("b_sh"))))
      .withColumn("jaccard", round(col("n_common").cast("double") /
        (size(col("a_sh")) + size(col("b_sh")) - col("n_common")), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("a_id"), col("b_id"), col("jaccard"))
  }

  /** Winnowing-fingerprint near-dup candidates (via the native
    * [[graft.functions.WinnowFingerprints]] expression): pairs of documents
    * sharing ≥ `minShared` fingerprints. Guarantee (SIGMOD'03): any shared
    * substring of length ≥ w+k−1 chars produces a shared fingerprint, so
    * copy-paste plagiarism cannot hide. Same posting-list shuffle shape as
    * [[jaccardSelfJoin]] — fingerprints are just pre-hashed shingles with
    * provable coverage at a fraction of the index size.
    */
  def winnowSelfJoin(df: DataFrame, idCol: String, textCol: String,
                     k: Int = 8, w: Int = 4, minShared: Int = 2,
                     maxDocFreq: Int = 500): DataFrame = {
    val quoted = "`" + textCol.replace("`", "``") + "`"
    val fps = df.select(col(idCol).as("doc_id"),
      expr(s"winnow_fingerprints($quoted, $k, $w)").as("fps"))
    val inv = fps.select(col("doc_id"), explode(col("fps")).as("fp"))
    val postings = inv.groupBy(col("fp"))
      .agg(sort_array(collect_list(col("doc_id"))).as("ds"))
      .filter(size(col("ds")) <= maxDocFreq && size(col("ds")) >= 2)
    pairCounts(postings, "n_shared")
      .filter(col("n_shared") >= minShared)
  }

  /** SimHash near-dup candidates: 64-bit signature per doc (via the native
    * [[graft.functions.SimHash64]] expression), pairs within `maxHamming`
    * bits. Banding for scale: split the 64-bit signature into `16-bit`
    * chunks — any pair within Hamming distance 3 shares at least one exact
    * chunk (pigeonhole), so the join is an equi-join on (chunk index, chunk
    * value), never all-pairs.
    */
  def simHashSelfJoin(df: DataFrame, idCol: String, textCol: String,
                      maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3, "4 chunks of 16 bits guarantee recall only up to hamming 3")
    val sigs = df.select(col(idCol).as("doc_id"),
      call_function("simhash64", split(col(textCol), " ")).as("sig"))
    val chunked = sigs.select(col("doc_id"), col("sig"),
      posexplode(expr(
        "transform(sequence(0, 3), i -> (sig >> (i * 16)) & 65535)")).as(Seq("chunk", "ckey")))
    chunked.as("x").join(chunked.as("y"),
        col("x.chunk") === col("y.chunk") && col("x.ckey") === col("y.ckey") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"),
        col("x.sig").as("a_sig"), col("y.sig").as("b_sig"))
      .distinct()
      .withColumn("hamming", bit_count(col("a_sig").bitwiseXOR(col("b_sig"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("a_id"), col("b_id"), col("hamming"))
  }

  /** Corpus-wide PARAGRAPH dedup (the RefinedWeb/FineWeb "line dedup"
    * stage): split every document on `sep`, keep each distinct paragraph
    * only at its FIRST occurrence corpus-wide (ordered by (id, position)),
    * and reassemble documents from their surviving paragraphs in original
    * order. Boilerplate (nav bars, subscribe footers) that repeats across
    * millions of pages disappears everywhere but its first sighting.
    *
    * Output: id, `text_dedup` (possibly empty), `n_kept`, `n_paras`.
    *
    * Scale shape: first-occurrence selection is a groupBy on md5(para) —
    * map-side partial min makes a boilerplate paragraph repeated a billion
    * times combine to one row per map task, so hot paragraphs do NOT skew
    * the shuffle (a window over the hash would buffer the hot partition
    * instead). The winner set is SKINNY (hash + (id, pos)); paragraph text
    * shuffles twice (winner join, regroup), which is the floor for a
    * content-keyed global dedup that must rebuild documents. md5 stands in
    * for paragraph equality, same as the exact-dedup operator.
    */
  def dedupParagraphs(df: DataFrame, idCol: String, textCol: String,
                      sep: String = "\n\n"): DataFrame = {
    val splitPat = java.util.regex.Pattern.quote(sep)
    val paras = df
      .select(col(idCol),
        posexplode(split(col(textCol), splitPat)).as(Seq("pos", "para")))
      .withColumn("h", md5(col("para")))
    val winners = paras.groupBy("h")
      .agg(min(struct(col(idCol), col("pos"))).as("w"))
    val kept = paras.join(winners, "h")
      .filter(struct(col(idCol), col("pos")) === col("w"))
    val rebuilt = kept.groupBy(idCol)
      .agg(
        array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("para")))),
            x => x.getField("para")),
          sep).as("text_dedup"),
        count(lit(1)).as("n_kept"))
    df.select(col(idCol), size(split(col(textCol), splitPat)).as("n_paras"))
      .join(rebuilt, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("text_dedup"), lit("")).as("text_dedup"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"), col("n_paras"))
  }
}
