package graft.operators.multimodal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Video near-duplicate detection from FRAME-HASH SETS: each video is
  * fingerprinted by the perceptual hashes of up to `maxFrames` sampled
  * frames ([[VideoCodec.frameHashes]] — real MJPEG-AVI / GIF decode), and
  * two videos are near-duplicates when most of one's frames match a frame
  * of the other within a Hamming radius. This catches re-muxed, trimmed,
  * re-encoded, and frame-rate-changed copies that byte hashing misses —
  * the standard screen before training on scraped video.
  *
  * Scale shape (the part that matters at 100 TB): frame hashes explode to
  * skinny (id, frame_idx, hash) rows; candidate FRAME pairs come from the
  * same pigeonhole band join as images ([[ImageDedup]] — split the 64-bit
  * hash into maxHamming+1 chunks, equi-join on (chunk, value); two hashes
  * within the radius MUST agree on one chunk), never an all-pairs scan;
  * matched frames then aggregate per video pair. Static clips hash every
  * frame alike — the `maxChunkFreq` cap bounds any hot hash bucket
  * deterministically (documented drop, same semantics as the image path).
  *
  * Scoring: bidirectional containment — `overlap = greatest(matched_a /
  * n_a, matched_b / n_b)` where matched_x counts DISTINCT frames of video
  * x that found a partner within the radius. A 10-second excerpt of a
  * long video scores 1.0 through its own side (the trim case symmetric
  * Jaccard would dilute), and the score is bounded by 1 by construction.
  * All-integer counts; the division is the final projection.
  *
  * Determinism: hashes are exact integers given a pixel grid and the
  * join/aggregate are set operations — output is hash-exact at any
  * executor count. The oracle boundary is the PERSISTED (id, frame_idx,
  * hash) stamp: DuckDB replays banding, Hamming, and the pair aggregation
  * from it (the p124/p128 pattern — SQL cannot decode JPEG, it CAN replay
  * everything downstream of decode).
  */
object VideoDedup {

  /** Exploded (id, frame_idx, frame_hash) fingerprints for every row
    * whose bytes decode as MJPEG-AVI or GIF; undecodable rows are DROPPED
    * (documented — project [[VideoCodec.frameCount]] first for the reject
    * list).
    */
  def frameHashes(df: DataFrame, idCol: String, binaryCol: String,
                  maxFrames: Int = 16): DataFrame = {
    require(maxFrames >= 1, s"maxFrames must be positive, got $maxFrames")
    val hasher = udf((b: Array[Byte]) => VideoCodec.frameHashes(b, maxFrames))
    df.select(col(idCol).as("id"), hasher(col(binaryCol)).as("fh"))
      .filter(col("fh").isNotNull)
      .select(col("id"), explode(col("fh")).as("f"))
      .select(col("id"), col("f._1").as("frame_idx"), col("f._2").as("frame_hash"))
  }

  /** Near-dup video pairs end-to-end from binary columns. */
  def selfJoin(df: DataFrame, idCol: String, binaryCol: String,
               maxFrames: Int = 16, maxHamming: Int = 6,
               minOverlap: Double = 0.5, maxChunkFreq: Long = 0L,
               pairBands: Boolean = false): DataFrame =
    selfJoinFromHashes(frameHashes(df, idCol, binaryCol, maxFrames),
      "id", "frame_idx", "frame_hash", maxHamming, minOverlap, maxChunkFreq,
      pairBands)

  /** The banded Hamming frame join + per-pair aggregation on an already-
    * hashed (id, frame_idx, hash) frame — the stage DuckDB replays from
    * the persisted stamp. Returns (a_id, b_id, matched_a, matched_b,
    * a_frames, b_frames, overlap) with `a_id < b_id`, filtered to
    * `overlap >= minOverlap`.
    */
  def selfJoinFromHashes(hashed: DataFrame, idCol: String, idxCol: String,
                         hashCol: String, maxHamming: Int = 6,
                         minOverlap: Double = 0.5,
                         maxChunkFreq: Long = 0L,
                         pairBands: Boolean = false,
                         bandWidth: Int = 0): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 31,
      s"maxHamming must be in [0, 31], got $maxHamming")
    // see ImageDedup.selfJoinFromHashes: bandWidth > 0 selects the
    // generalized multi-index path; 0 defers to the pairBands flag
    val width = if (bandWidth > 0) bandWidth else if (pairBands) 2 else 1
    require(minOverlap >= 0.0 && minOverlap <= 1.0,
      s"minOverlap must be in [0, 1], got $minOverlap")
    val sigs = hashed.select(col(idCol).as("vid"), col(idxCol).as("fi"),
      col(hashCol).as("h"))
    // per-video sampled-frame counts: the overlap denominator (skinny agg,
    // broadcast-joined back onto the skinny pair table)
    val counts = sigs.groupBy(col("vid"))
      .agg(countDistinct(col("fi")).as("nf"))
    // shared banding helpers (ImageDedup): single-chunk by default,
    // two-chunk combination keys for the corpus-scale regime — see
    // ImageDedup.selfJoinFromHashes's pairBands doc
    // merge hint: same rationale as ImageDedup.selfJoinFromHashes — the
    // frame posting table is corpus-sized on BOTH sides and explode's
    // sizeInBytes underestimate can auto-broadcast it (the 50x sweep hit
    // a 9 GiB broadcast build on this very join); sort-merge always
    val candidates =
      if (width == 1) {
        val chunked = ImageDedup.explodeSingleChunks(sigs, "h",
          maxHamming, maxChunkFreq)
        chunked.hint("merge").as("x").join(chunked.as("y"),
          col("x.chunk") === col("y.chunk") && col("x.ckey") === col("y.ckey") &&
            col("x.vid") < col("y.vid"))
      } else if (width == 2) {
        val chunked = ImageDedup.explodePairChunks(sigs, "h",
          maxHamming, maxChunkFreq)
        chunked.hint("merge").as("x").join(chunked.as("y"),
          col("x.ci") === col("y.ci") && col("x.cj") === col("y.cj") &&
            col("x.ki") === col("y.ki") && col("x.kj") === col("y.kj") &&
            col("x.vid") < col("y.vid"))
      } else {
        val chunked = ImageDedup.explodeComboChunks(sigs, "h",
          maxHamming, width, maxChunkFreq)
        chunked.hint("merge").as("x").join(chunked.as("y"),
          col("x.cid") === col("y.cid") && col("x.ckey") === col("y.ckey") &&
            col("x.vid") < col("y.vid"))
      }
    // no distinct() on the candidate frame pairs: the per-pair
    // countDistinct aggregation below already dedups multi-band hits, and
    // an explicit distinct is a redundant FULL shuffle of the candidate
    // set ahead of it (measured on the 50x sweep: one full exchange of a
    // multi-million-row table for nothing)
    val framePairs = candidates
      .select(col("x.vid").as("a_id"), col("y.vid").as("b_id"),
        col("x.fi").as("a_fi"), col("y.fi").as("b_fi"),
        col("x.h").as("a_h"), col("y.h").as("b_h"))
      .filter(bit_count(col("a_h").bitwiseXOR(col("b_h"))) <= maxHamming)
    framePairs.groupBy(col("a_id"), col("b_id"))
      .agg(countDistinct(col("a_fi")).as("matched_a"),
        countDistinct(col("b_fi")).as("matched_b"))
      .join(counts.select(col("vid").as("a_id"), col("nf").as("a_frames")), "a_id")
      .join(counts.select(col("vid").as("b_id"), col("nf").as("b_frames")), "b_id")
      .withColumn("overlap", greatest(
        col("matched_a").cast("double") / col("a_frames").cast("double"),
        col("matched_b").cast("double") / col("b_frames").cast("double")))
      .filter(col("overlap") >= minOverlap)
      .select(col("a_id"), col("b_id"), col("matched_a"), col("matched_b"),
        col("a_frames"), col("b_frames"), col("overlap"))
  }
}

object VideoScreen {

  /** Feed-vs-catalog VIDEO screen — the production shape for video
    * ingest: new clips' frame-hash sets banded against the persisted
    * frame stamp of the ingested corpus ([[ImageDedup.joinAgainst]]'s
    * table split with [[VideoDedup]]'s containment scoring). Returns
    * (feed_id, catalog_id, matched_feed, matched_catalog, feed_frames,
    * catalog_frames, overlap) with overlap = bidirectional containment,
    * filtered to `>= minOverlap`. Work is linear in the feed (each feed
    * frame explodes to maxHamming+1 chunk rows probing the catalog
    * index); the catalog side owns the `maxChunkFreq` cap, so feed
    * growth never degrades recall. The catalog frame counts come from
    * the stamp itself — no re-decode of ingested media.
    */
  def screenFromHashes(feed: DataFrame, feedIdCol: String, feedIdxCol: String,
                       feedHashCol: String,
                       catalog: DataFrame, catIdCol: String, catIdxCol: String,
                       catHashCol: String,
                       maxHamming: Int = 6, minOverlap: Double = 0.5,
                       maxChunkFreq: Long = 0L,
                       bandWidth: Int = 1): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 31,
      s"maxHamming must be in [0, 31], got $maxHamming")
    require(minOverlap >= 0.0 && minOverlap <= 1.0,
      s"minOverlap must be in [0, 1], got $minOverlap")
    require(bandWidth >= 1, s"bandWidth must be >= 1, got $bandWidth")
    val fsigs = feed.select(col(feedIdCol).as("vid"), col(feedIdxCol).as("fi"),
      col(feedHashCol).as("h"))
    val csigs = catalog.select(col(catIdCol).as("vid"), col(catIdxCol).as("fi"),
      col(catHashCol).as("h"))
    val fCounts = fsigs.groupBy(col("vid")).agg(countDistinct(col("fi")).as("nf"))
    val cCounts = csigs.groupBy(col("vid")).agg(countDistinct(col("fi")).as("nf"))
    // bandWidth is the catalog-scale knob (see ImageDedup.joinAgainst):
    // wider combo keys keep the catalog's posting lists near-singleton
    def chunked(sigs: DataFrame, cap: Long): DataFrame =
      if (bandWidth == 1) ImageDedup.explodeSingleChunks(sigs, "h", maxHamming, cap)
      else ImageDedup.explodeComboChunks(sigs, "h", maxHamming, bandWidth, cap)
        .withColumnRenamed("cid", "chunk")
    val fChunked = chunked(fsigs, 0L)
    // the CATALOG (bounded side) owns the cap — linkage-gram discipline
    val cChunked = chunked(csigs, maxChunkFreq)
    fChunked.as("x").join(cChunked.as("y"),
        col("x.chunk") === col("y.chunk") && col("x.ckey") === col("y.ckey"))
      .select(col("x.vid").as("feed_id"), col("y.vid").as("catalog_id"),
        col("x.fi").as("f_fi"), col("y.fi").as("c_fi"),
        col("x.h").as("a_h"), col("y.h").as("b_h"))
      // no distinct: the countDistinct aggregation dedups multi-band hits
      .filter(bit_count(col("a_h").bitwiseXOR(col("b_h"))) <= maxHamming)
      .groupBy(col("feed_id"), col("catalog_id"))
      .agg(countDistinct(col("f_fi")).as("matched_feed"),
        countDistinct(col("c_fi")).as("matched_catalog"))
      .join(fCounts.select(col("vid").as("feed_id"), col("nf").as("feed_frames")),
        "feed_id")
      .join(cCounts.select(col("vid").as("catalog_id"),
        col("nf").as("catalog_frames")), "catalog_id")
      .withColumn("overlap", greatest(
        col("matched_feed").cast("double") / col("feed_frames").cast("double"),
        col("matched_catalog").cast("double") / col("catalog_frames").cast("double")))
      .filter(col("overlap") >= minOverlap)
      .select(col("feed_id"), col("catalog_id"), col("matched_feed"),
        col("matched_catalog"), col("feed_frames"), col("catalog_frames"),
        col("overlap"))
  }
}

/** Video SCENE (shot-cut) detection from the same frame-hash fingerprints
  * [[VideoDedup]] uses: a cut is a frame whose perceptual hash jumps more
  * than `cutThreshold` Hamming bits from the previous sampled frame —
  * the classic hash-delta shot detector, here in exact integer form.
  * Scene ids are the running count of cuts per video, so frame→scene
  * assignment, scene counts, and scene lengths all fall out of one
  * entity-keyed window pass (partitioned by video, ordered by frame
  * index — no cross-video shuffle, the scale-safe window shape).
  *
  * Determinism: bit_count(xor) over exact hashes and an integer running
  * sum — hash-exact anywhere; DuckDB replays LAG + BIT_COUNT + the
  * windowed SUM from the persisted (id, frame_idx, hash) stamp (the p133
  * oracle).
  */
object VideoScenes {

  /** Per-frame scene assignment from an already-hashed (id, frame_idx,
    * hash) frame: (id, frame_idx, hamming_prev, is_cut, scene_id).
    * The first frame of each video has hamming_prev −1 and opens scene 0;
    * each cut increments the video's scene id.
    */
  def fromHashes(hashed: DataFrame, idCol: String, idxCol: String,
                 hashCol: String, cutThreshold: Int = 16): DataFrame = {
    require(cutThreshold >= 0 && cutThreshold <= 64,
      s"cutThreshold must be in [0, 64], got $cutThreshold")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("frame_idx"))
    hashed.select(col(idCol).as("id"), col(idxCol).as("frame_idx"),
        col(hashCol).as("h"))
      .withColumn("__prev__", lag(col("h"), 1).over(w))
      .withColumn("hamming_prev",
        when(col("__prev__").isNull, lit(-1))
          .otherwise(bit_count(col("h").bitwiseXOR(col("__prev__")))
            .cast("int")))
      .withColumn("is_cut", col("hamming_prev") > cutThreshold)
      .withColumn("scene_id",
        sum(when(col("is_cut"), 1L).otherwise(0L))
          .over(w.rowsBetween(org.apache.spark.sql.expressions.Window
            .unboundedPreceding, 0)))
      .select(col("id"), col("frame_idx"), col("hamming_prev"),
        col("is_cut"), col("scene_id"))
  }

  /** End-to-end from binary columns (MJPEG-AVI / GIF — see
    * [[VideoCodec.frameHashes]]); undecodable rows are dropped.
    */
  def detect(df: DataFrame, idCol: String, binaryCol: String,
             maxFrames: Int = 16, cutThreshold: Int = 16): DataFrame =
    fromHashes(VideoDedup.frameHashes(df, idCol, binaryCol, maxFrames),
      "id", "frame_idx", "frame_hash", cutThreshold)
}
