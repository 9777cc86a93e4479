package graft.operators.multimodal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Perceptual-hash image near-dedup: 64-bit dHash/aHash per image
  * ([[ImageCodec]] — real JDK decode), candidate pairs via pigeonhole
  * banding, exact Hamming verify. The image analog of the SimHash text
  * path ([[graft.operators.dedup.TextDedup.simHashSelfJoin]]) — same
  * band-join scale shape, generalized to any Hamming radius.
  *
  * Banding: split the 64-bit hash into `maxHamming + 1` contiguous
  * chunks; two hashes within Hamming distance `maxHamming` differ in at
  * most `maxHamming` bits, so at least one chunk is bit-identical
  * (pigeonhole) — candidates collide on an (chunk index, chunk value)
  * equi-join, NEVER an all-pairs scan. At 100 TB the shuffle is
  * |images| × (maxHamming+1) skinny rows keyed by chunk value; exact
  * verify (`bit_count(a^b)`) touches only collided pairs. Recall within
  * the radius is 100% by construction (no LSH miss probability).
  *
  * Determinism: hashes are exact integers ([[ImageCodec]] contract) and
  * the join/filter are set operations — output is hash-exact at any
  * executor count, and DuckDB replays banding + Hamming from a persisted
  * (id, hash) table with the same shift/mask arithmetic (the p124
  * oracle; arithmetic-vs-logical right shift is neutralized by the chunk
  * mask).
  *
  * Skew note: a degenerate hash value shared by millions of images
  * (e.g. flat single-color frames → dHash 0) would hot-spot its chunk
  * buckets; `maxChunkFreq` drops chunk keys above the cap — loudly, via
  * the returned pair set only (cap semantics documented: capped keys
  * contribute no candidates; exact dups still pair through their other
  * chunks unless ALL their chunks are capped).
  */
object ImageDedup {

  /** (id, img_hash) for every decodable image; undecodable rows are
    * DROPPED (documented — filter them via `mm_decode_image_meta` first
    * if you need the reject list).
    */
  def hashes(df: DataFrame, idCol: String, binaryCol: String,
             method: String = "dhash"): DataFrame = {
    val hasher = method match {
      case "dhash" => udf((b: Array[Byte]) => ImageCodec.dHash(b))
      case "ahash" => udf((b: Array[Byte]) => ImageCodec.aHash(b))
      case other => throw new IllegalArgumentException(
        s"ImageDedup method must be dhash|ahash, got '$other'")
    }
    df.select(col(idCol).as("id"), hasher(col(binaryCol)).as("img_hash"))
      .filter(col("img_hash").isNotNull)
  }

  /** Near-dup pairs (a_id, b_id, hamming) among images within
    * `maxHamming` bits, end-to-end from binary columns.
    */
  def selfJoin(df: DataFrame, idCol: String, binaryCol: String,
               maxHamming: Int = 6, method: String = "dhash",
               maxChunkFreq: Long = 0L, pairBands: Boolean = false): DataFrame =
    selfJoinFromHashes(hashes(df, idCol, binaryCol, method),
      "id", "img_hash", maxHamming, maxChunkFreq, pairBands)

  /** The banded Hamming self-join on an already-hashed (id, hash) frame —
    * the stage DuckDB replays from the persisted stamp. Ids must be
    * distinct (one hash per image).
    *
    * `pairBands = true` switches to TWO-CHUNK banding, the
    * high-volume regime: with `maxHamming + 2` chunks, two hashes
    * within the radius differ in at most `maxHamming` chunks, so they
    * AGREE on at least two — the join key becomes an (i, j, ckey_i,
    * ckey_j) chunk PAIR with double the bit width (multi-index hashing,
    * Norouzi et al.). Same 100% recall by pigeonhole; candidate volume
    * drops from n²/2^(64/(r+1)) to n²/2^(2·64/(r+2)) for a
    * C(r+2, 2)/(r+1)-fold explode — at corpus scale (10⁸+ hashes, where
    * single-chunk buckets of 8–12 bits go quadratic by the birthday
    * bound) this is the difference between a linear shuffle and an
    * all-pairs blowup. Single-chunk stays the default for small/medium
    * corpora where the extra explode dominates.
    */
  def selfJoinFromHashes(hashed: DataFrame, idCol: String, hashCol: String,
                         maxHamming: Int = 6,
                         maxChunkFreq: Long = 0L,
                         pairBands: Boolean = false,
                         bandWidth: Int = 0): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 31,
      s"maxHamming must be in [0, 31], got $maxHamming (chunks need >= 2 bits)")
    // bandWidth > 0 selects the generalized multi-index path explicitly
    // (width 1 = single chunks, 2 = pair keys, 3+ = wider combos — see
    // explodeComboChunks for when to widen); bandWidth 0 defers to the
    // legacy pairBands flag
    val width = if (bandWidth > 0) bandWidth else if (pairBands) 2 else 1
    val sigs = hashed.select(col(idCol).as("doc_id"), col(hashCol).as("h"))
    // merge hint: BOTH sides of the candidate join are the corpus-sized
    // posting table, so broadcasting is never right — but Catalyst's
    // sizeInBytes for an explode keeps the CHILD's estimate (the
    // (maxHamming+1)-way or C(n,2)-way blow-up is invisible), and a
    // skinny projected lineage can fall under the auto-broadcast
    // threshold: the 50x scale sweep observed a 9 GiB broadcast build
    // attempt (hard failure at spark.sql.maxBroadcastTableBytes) on
    // exactly this join. Sort-merge is the plan a 100 TB corpus needs.
    val verified =
      if (width == 1) {
        val chunked = singleChunked(sigs, maxHamming, maxChunkFreq)
        chunked.hint("merge").as("x").join(chunked.as("y"),
          col("x.chunk") === col("y.chunk") && col("x.ckey") === col("y.ckey") &&
            col("x.doc_id") < col("y.doc_id"))
      } else if (width == 2) {
        val chunked = pairChunked(sigs, maxHamming, maxChunkFreq)
        chunked.hint("merge").as("x").join(chunked.as("y"),
          col("x.ci") === col("y.ci") && col("x.cj") === col("y.cj") &&
            col("x.ki") === col("y.ki") && col("x.kj") === col("y.kj") &&
            col("x.doc_id") < col("y.doc_id"))
      } else {
        val chunked = explodeComboChunks(sigs, "h", maxHamming, width, maxChunkFreq)
        chunked.hint("merge").as("x").join(chunked.as("y"),
          col("x.cid") === col("y.cid") && col("x.ckey") === col("y.ckey") &&
            col("x.doc_id") < col("y.doc_id"))
      }
    verified
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"),
        col("x.h").as("a_h"), col("y.h").as("b_h"))
      .distinct()
      .withColumn("hamming", bit_count(col("a_h").bitwiseXOR(col("b_h"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("a_id"), col("b_id"), col("hamming"))
  }

  /** Explode a frame with a long column `hashCol` into single-chunk
    * posting rows, preserving every input column and adding (chunk,
    * ckey): chunk i covers bits [i·base, (i+1)·base), the last chunk
    * absorbs the remainder — widths are fixed by maxHamming alone, so
    * the oracle replays them from the same integer arithmetic. The
    * optional hot-chunk cap (flat-image degeneracy) drops chunk keys
    * whose posting list exceeds the cap — a frequency join on the skinny
    * key, same shape as the linkage gram caps. Shared by the image,
    * audio, and video band joins.
    */
  private[multimodal] def explodeSingleChunks(df: DataFrame, hashCol: String,
                                              maxHamming: Int,
                                              maxChunkFreq: Long): DataFrame = {
    val n = maxHamming + 1
    val base = 64 / n
    val chunkExprs = (0 until n).map { i =>
      val start = i * base
      val len = if (i == n - 1) 64 - start else base
      val mask = if (len >= 64) -1L else (1L << len) - 1L
      s"struct(cast($i as int) as chunk, shiftright($hashCol, $start) & ${mask}L as ckey)"
    }
    val chunked0 = df
      .withColumn("__c__", explode(expr(s"array(${chunkExprs.mkString(", ")})")))
      .withColumn("chunk", col("__c__.chunk"))
      .withColumn("ckey", col("__c__.ckey"))
      .drop("__c__")
    if (maxChunkFreq <= 0L) chunked0
    else {
      val hot = chunked0.groupBy(col("chunk"), col("ckey"))
        .agg(count(lit(1)).as("__n__"))
        .filter(col("__n__") > maxChunkFreq)
        .select(col("chunk"), col("ckey"))
      chunked0.join(hot, Seq("chunk", "ckey"), "left_anti")
    }
  }

  /** Explode a frame with a long column `hashCol` into two-chunk posting
    * rows (ci, cj, ki, kj), ci < cj over maxHamming + 2 chunks,
    * preserving every input column (see [[selfJoinFromHashes]]'s
    * pairBands doc). The cap applies per combination key.
    */
  private[multimodal] def explodePairChunks(df: DataFrame, hashCol: String,
                                            maxHamming: Int,
                                            maxChunkFreq: Long): DataFrame = {
    val m = maxHamming + 2
    require(64 / m >= 2, s"pairBands needs chunks >= 2 bits: maxHamming <= 30")
    val base = 64 / m
    def chunkSql(i: Int): String = {
      val start = i * base
      val len = if (i == m - 1) 64 - start else base
      val mask = if (len >= 64) -1L else (1L << len) - 1L
      s"shiftright($hashCol, $start) & ${mask}L"
    }
    val comboExprs = for (i <- 0 until m; j <- (i + 1) until m) yield
      s"struct(cast($i as int) as ci, cast($j as int) as cj, " +
        s"${chunkSql(i)} as ki, ${chunkSql(j)} as kj)"
    val chunked0 = df
      .withColumn("__c__", explode(expr(s"array(${comboExprs.mkString(", ")})")))
      .withColumn("ci", col("__c__.ci")).withColumn("cj", col("__c__.cj"))
      .withColumn("ki", col("__c__.ki")).withColumn("kj", col("__c__.kj"))
      .drop("__c__")
    if (maxChunkFreq <= 0L) chunked0
    else {
      val hot = chunked0.groupBy(col("ci"), col("cj"), col("ki"), col("kj"))
        .agg(count(lit(1)).as("__n__"))
        .filter(col("__n__") > maxChunkFreq)
        .select(col("ci"), col("cj"), col("ki"), col("kj"))
      chunked0.join(hot, Seq("ci", "cj", "ki", "kj"), "left_anti")
    }
  }

  /** Generalized multi-index banding (Norouzi et al.): explode into
    * `width`-chunk combination posting rows over `maxHamming + width`
    * chunks. Pigeonhole: two hashes within the radius differ in at most
    * `maxHamming` chunks, so they AGREE on at least `width` — at least
    * one width-subset matches entirely, giving 100% recall at candidate
    * volume n²·C(c,width)/2^(width·64/c). The width is the corpus-scale
    * knob: keep 2^(width·64/(maxHamming+width)) comfortably above the
    * corpus size or the birthday term n²/2^w dominates (measured: 20-bit
    * pair keys went super-linear between 10⁶ and 5×10⁶ hashes in the
    * r18 sweep; width 3 at maxHamming 4 gives ~28-bit keys and restores
    * linearity). The subset's chunk keys pack into ONE long at each
    * chunk's ACTUAL bit width — the chunks partition 64 bits, so any
    * subset's widths sum to <= 64 and the packed key is collision-free
    * at every width (r19 fix; see the packing comment below). The join
    * key stays a skinny (cid, ckey) pair whatever the width. The cap
    * applies per combination key.
    */
  private[multimodal] def explodeComboChunks(df: DataFrame, hashCol: String,
                                             maxHamming: Int, width: Int,
                                             maxChunkFreq: Long): DataFrame = {
    val c = maxHamming + width
    require(width >= 2, s"bandWidth >= 2 for combo banding, got $width")
    val base = 64 / c
    val lastLen = 64 - (c - 1) * base
    require(base >= 2,
      s"combo banding needs >=2-bit chunks: maxHamming=$maxHamming width=$width gives base=$base")
    def chunkLen(i: Int): Int = if (i == c - 1) lastLen else base
    def chunkSql(i: Int): String = {
      val start = i * base
      val mask = (1L << chunkLen(i)) - 1L
      s"(shiftright($hashCol, $start) & ${mask}L)"
    }
    // Pack by each chunk's ACTUAL bit width (not a fixed 16-bit slot): the
    // selected chunks are a subset of a 64-bit partition, so their widths
    // sum to <= 64 and the packed key never sheds leading chunks — the r18
    // fixed-slot packing silently collided distinct combos at width >= 5,
    // exactly the regime the width knob exists for (ADVICE r18).
    val comboExprs = (0 until c).combinations(width).toSeq.zipWithIndex.map {
      case (s, cid) =>
        val packed = s.map(i => (chunkSql(i), chunkLen(i)))
          .reduceLeft[(String, Int)] { case ((acc, _), (k, len)) =>
            (s"(shiftleft($acc, $len) | $k)", len)
          }._1
        s"struct(cast($cid as int) as cid, $packed as ckey)"
    }
    val chunked0 = df
      .withColumn("__c__", explode(expr(s"array(${comboExprs.mkString(", ")})")))
      .withColumn("cid", col("__c__.cid"))
      .withColumn("ckey", col("__c__.ckey"))
      .drop("__c__")
    if (maxChunkFreq <= 0L) chunked0
    else {
      val hot = chunked0.groupBy(col("cid"), col("ckey"))
        .agg(count(lit(1)).as("__n__"))
        .filter(col("__n__") > maxChunkFreq)
        .select(col("cid"), col("ckey"))
      chunked0.join(hot, Seq("cid", "ckey"), "left_anti")
    }
  }

  private def singleChunked(sigs: DataFrame, maxHamming: Int,
                            maxChunkFreq: Long): DataFrame =
    explodeSingleChunks(sigs, "h", maxHamming, maxChunkFreq)

  private def pairChunked(sigs: DataFrame, maxHamming: Int,
                          maxChunkFreq: Long): DataFrame =
    explodePairChunks(sigs, "h", maxHamming, maxChunkFreq)

  /** Feed-vs-catalog banded Hamming join — the PRODUCTION dedup shape: a
    * growing feed of new media screened against a bounded corpus of
    * already-ingested hashes (the persisted stamp), emitting
    * (feed_id, catalog_id, hamming) for every feed row within the radius.
    * Same pigeonhole banding as [[selfJoinFromHashes]] but across two
    * tables, so work is linear in the FEED: each feed hash explodes to
    * maxHamming+1 skinny rows that equi-join the catalog's chunk index —
    * never a self-join of the union, never all-pairs. `maxChunkFreq`
    * caps CATALOG-side posting lists (the bounded side owns the cap, the
    * linkage-gram lesson: feed growth then never degrades recall).
    * Modality-agnostic like the self-join (image dHash, audio energy
    * hash, video frame hashes all fit).
    */
  def joinAgainst(feed: DataFrame, feedIdCol: String, feedHashCol: String,
                  catalog: DataFrame, catalogIdCol: String, catalogHashCol: String,
                  maxHamming: Int = 6, maxChunkFreq: Long = 0L,
                  bandWidth: Int = 1): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 31,
      s"maxHamming must be in [0, 31], got $maxHamming (chunks need >= 2 bits)")
    require(bandWidth >= 1, s"bandWidth must be >= 1, got $bandWidth")
    // bandWidth > 1: generalized multi-index probing (explodeComboChunks)
    // — at a 10⁸-hash catalog, single-chunk 8-12-bit posting lists hold
    // catalog/2^bits entries and every feed probe pays that amplification;
    // wider combo keys keep posting lists near-singleton. Work stays
    // linear in the feed either way; width is the catalog-scale knob.
    if (bandWidth > 1) {
      val feedC = explodeComboChunks(
        feed.select(col(feedIdCol).as("doc_id"), col(feedHashCol).as("h")),
        "h", maxHamming, bandWidth, 0L)
      val catC = explodeComboChunks(
        catalog.select(col(catalogIdCol).as("doc_id"), col(catalogHashCol).as("h")),
        "h", maxHamming, bandWidth, maxChunkFreq) // bounded side owns the cap
      return feedC.as("x").join(catC.as("y"),
          col("x.cid") === col("y.cid") && col("x.ckey") === col("y.ckey"))
        .select(col("x.doc_id").as("feed_id"), col("y.doc_id").as("catalog_id"),
          col("x.h").as("a_h"), col("y.h").as("b_h"))
        .distinct()
        .withColumn("hamming", bit_count(col("a_h").bitwiseXOR(col("b_h"))))
        .filter(col("hamming") <= maxHamming)
        .select(col("feed_id"), col("catalog_id"), col("hamming"))
    }
    val n = maxHamming + 1
    val base = 64 / n
    val chunkExprs = (0 until n).map { i =>
      val start = i * base
      val len = if (i == n - 1) 64 - start else base
      val mask = if (len >= 64) -1L else (1L << len) - 1L
      s"struct(cast($i as int) as chunk, shiftright(h, $start) & ${mask}L as ckey)"
    }
    def chunked(df: DataFrame, idCol: String, hashCol: String): DataFrame =
      df.select(col(idCol).as("doc_id"), col(hashCol).as("h"))
        .select(col("doc_id"), col("h"),
          explode(expr(s"array(${chunkExprs.mkString(", ")})")).as("c"))
        .select(col("doc_id"), col("h"),
          col("c.chunk").as("chunk"), col("c.ckey").as("ckey"))
    val feedC = chunked(feed, feedIdCol, feedHashCol)
    val catC0 = chunked(catalog, catalogIdCol, catalogHashCol)
    val catC =
      if (maxChunkFreq <= 0L) catC0
      else {
        val hot = catC0.groupBy(col("chunk"), col("ckey"))
          .agg(count(lit(1)).as("__n__"))
          .filter(col("__n__") > maxChunkFreq)
          .select(col("chunk"), col("ckey"))
        catC0.join(hot, Seq("chunk", "ckey"), "left_anti")
      }
    feedC.as("x").join(catC.as("y"),
        col("x.chunk") === col("y.chunk") && col("x.ckey") === col("y.ckey"))
      .select(col("x.doc_id").as("feed_id"), col("y.doc_id").as("catalog_id"),
        col("x.h").as("a_h"), col("y.h").as("b_h"))
      .distinct()
      .withColumn("hamming", bit_count(col("a_h").bitwiseXOR(col("b_h"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("feed_id"), col("catalog_id"), col("hamming"))
  }

  /** Exact-duplicate image groups by content hash (byte-identical files)
    * — the cheap first pass before perceptual dedup: group id = min id
    * per MD5. Per-row hash + one skinny groupBy.
    */
  def exactGroups(df: DataFrame, idCol: String, binaryCol: String): DataFrame = {
    val h = md5(col(binaryCol))
    df.select(col(idCol).as("id"), h.as("content_hash"))
      .withColumn("group_id",
        min(col("id")).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("content_hash"))))
  }
}
