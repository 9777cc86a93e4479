package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState,
  GroupStateTimeout, ListState, MapState, OutputMode, StatefulProcessor,
  TTLConfig, TimeMode, TimerValues, ValueState}

/** Custom stateful streaming operators over `KeyValueGroupedDataset`
  * (SURVEY §2.7 "stateful ops": the reference exposes only what Spark SQL
  * gives; this engine adds the `mapGroupsWithState` surface the builder
  * prompt calls for).
  *
  * Scale note: state lives in the state store partitioned by key —
  * per-key state is O(1) here (a running aggregate), so state size is
  * bounded by distinct keys, not event volume; pair with watermark-based
  * state expiry for unbounded key spaces.
  */
object Stateful {

  case class KeyCount(key: Long, batches: Int, total: Long)

  /** Running per-key event counts across micro-batches: one updated row
    * per key per batch (use with Update output mode). State: (batches
    * seen, total events).
    */
  def runningCounts(df: DataFrame, keyCol: String): Dataset[KeyCount] = {
    val spark = df.sparkSession
    import spark.implicits._
    // a null (or non-numeric) key would fail the non-nullable Long
    // encoder INSIDE the micro-batch and kill the whole query — one
    // poison record must not take the stream down
    df.select(col(keyCol).cast("long")).filter(col(keyCol).isNotNull).as[Long]
      .groupByKey(identity)
      .mapGroupsWithState[(Int, Long), KeyCount](GroupStateTimeout.NoTimeout) {
        case (key, rows, state: GroupState[(Int, Long)]) =>
          val (batches, total) = state.getOption.getOrElse((0, 0L))
          val n = rows.size
          val updated = (batches + 1, total + n)
          state.update(updated)
          KeyCount(key, updated._1, updated._2)
      }
  }

  case class Threshold(key: Long, total: Long)

  /** flatMapGroupsWithState surface: emit a row ONLY when a key's running
    * total crosses a multiple of `every` (0..n rows per key per batch —
    * the shape mapGroupsWithState's exactly-one-row contract cannot
    * express). Append output mode; state is one long per key.
    */
  def thresholdAlerts(df: DataFrame, keyCol: String, every: Long): Dataset[Threshold] = {
    require(every > 0, s"thresholdAlerts: every must be positive, got $every")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(keyCol).cast("long")).filter(col(keyCol).isNotNull).as[Long]
      .groupByKey(identity)
      .flatMapGroupsWithState[Long, Threshold](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        case (key, rows, state: GroupState[Long]) =>
          val before = state.getOption.getOrElse(0L)
          val after = before + rows.size
          state.update(after)
          // one alert per multiple of `every` crossed within this batch
          ((before / every + 1) to (after / every))
            .map(m => Threshold(key, m * every)).iterator
      }
  }

  case class DistinctCount(key: Long, n_distinct: Long)

  /** Spark 4 `transformWithState` processor: incremental per-key distinct
    * counting. The seen-value set lives in a [[MapState]] — each batch
    * reads/writes ONLY the values it touches, which is the point of the
    * new API: `mapGroupsWithState` would deserialize and re-serialize the
    * whole per-key set every batch, so its cost grows with state size
    * while this stays O(batch). Requires the RocksDB state store provider
    * (see [[Stateful.distinctCounts]]).
    */
  class DistinctCountProcessor extends StatefulProcessor[Long, (Long, String), DistinctCount] {
    @transient private var seen: MapState[String, Boolean] = _
    @transient private var cnt: ValueState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      seen = getHandle.getMapState[String, Boolean](
        "seen", Encoders.STRING, Encoders.scalaBoolean, TTLConfig.NONE)
      cnt = getHandle.getValueState[Long]("cnt", Encoders.scalaLong, TTLConfig.NONE)
    }
    override def handleInputRows(key: Long, rows: Iterator[(Long, String)],
                                 timerValues: TimerValues): Iterator[DistinctCount] = {
      var c = if (cnt.exists()) cnt.get() else 0L
      rows.foreach { case (_, v) =>
        if (!seen.containsKey(v)) { seen.updateValue(v, true); c += 1 }
      }
      cnt.update(c)
      Iterator.single(DistinctCount(key, c))
    }
  }

  /** Running per-key DISTINCT-value counts across micro-batches via
    * `transformWithState` (Update mode; one row per touched key per
    * batch). Caller must run with
    * `spark.sql.streaming.stateStore.providerClass =
    * ...state.RocksDBStateStoreProvider` — the new API is RocksDB-only.
    */
  def distinctCounts(df: DataFrame, keyCol: String, valueCol: String): Dataset[DistinctCount] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(keyCol).cast("long"), col(valueCol).cast("string"))
      .filter(col(keyCol).isNotNull && col(valueCol).isNotNull)
      .as[(Long, String)]
      .groupByKey(_._1)
      .transformWithState(new DistinctCountProcessor,
        TimeMode.None(), OutputMode.Update())
  }

  case class SessionOut(key: Long, session_start: Long, session_end: Long,
                        n_events: Long)

  /** Timer-finalized streaming sessionization via `transformWithState`
    * + EVENT-TIME TIMERS — the capability `session_window` aggregation
    * cannot express: emit one COMPLETED-session row per (key, session)
    * exactly when the watermark passes last_event + gap, with
    * arbitrary per-session state (here start/end/count; extend the
    * tuple for custom session payloads).
    *
    * Semantics match batch gap-sessionization exactly (q35: an event
    * merges into a session iff it lies within `gap` of the session's
    * interval, inclusive on both sides): state per key is the LIST of
    * still-open sessions, each with its own timer at end+gap, and input
    * rows are interval-merged against that list. Holding a list — not a
    * single open session — is what makes out-of-order input correct: a
    * late event above the watermark but more than `gap` BEFORE the
    * current session's start opens its own earlier session (the old
    * single-slot design wrongly merged it, dragging session_start
    * arbitrarily far back), and a still-later event within gap of THAT
    * session merges into it rather than being stranded. Every emission
    * happens in `handleExpiredTimer` once the watermark passes end+gap,
    * so no session can close while an above-watermark event could still
    * legally join it: streamed output == batch sessionization for any
    * arrival order the watermark admits. State per key is bounded by
    * (watermark delay / gap) + 1 open sessions, independent of stream
    * length. Append mode.
    */
  class SessionProcessor(gapMs: Long)
    extends StatefulProcessor[Long, (Long, java.sql.Timestamp), SessionOut] {
    @transient private var st: ListState[(Long, Long, Long)] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getListState[(Long, Long, Long)]("sess",
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
          Encoders.scalaLong), TTLConfig.NONE)
    override def handleInputRows(key: Long,
                                 rows: Iterator[(Long, java.sql.Timestamp)],
                                 timerValues: TimerValues): Iterator[SessionOut] = {
      val events = rows.map(_._2.getTime).toSeq
      if (events.isEmpty) return Iterator.empty
      val stored = st.get().toSeq
      // interval-merge the open sessions with the new events (sorted by
      // start; a point event is the interval [ts, ts])
      val items = (stored ++ events.map(ts => (ts, ts, 1L)))
        .sortBy(t => (t._1, t._2))
      val merged = List.newBuilder[(Long, Long, Long)]
      var cur: (Long, Long, Long) = items.head
      for (it <- items.tail) {
        if (it._1 <= cur._2 + gapMs)
          cur = (cur._1, math.max(cur._2, it._2), cur._3 + it._3)
        else { merged += cur; cur = it }
      }
      merged += cur
      val next = merged.result()
      // timer diff: one timer per open session at end+gap; a merge that
      // advances a session's end moves its timer, untouched ends keep
      // theirs (re-registering an identical timer would be a no-op churn)
      val oldT = stored.map(_._2 + gapMs).toSet
      val newT = next.map(_._2 + gapMs).toSet
      (oldT diff newT).foreach(getHandle.deleteTimer)
      (newT diff oldT).foreach(getHandle.registerTimer)
      st.put(next.toArray)
      Iterator.empty
    }
    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
                                    expiredTimerInfo: ExpiredTimerInfo): Iterator[SessionOut] = {
      val expiry = expiredTimerInfo.getExpiryTimeInMs
      val (done, live) = st.get().toSeq.partition(_._2 + gapMs <= expiry)
      if (live.isEmpty) st.clear() else if (done.nonEmpty) st.put(live.toArray)
      done.sortBy(_._1)
        .map { case (s, l, c) => SessionOut(key, s, l, c) }.iterator
    }
  }

  /** Completed sessions as an Append stream (see [[SessionProcessor]]).
    * Input must carry a WATERMARK on `tsCol` (event-time timers fire
    * against it); RocksDB state store required as for
    * [[distinctCounts]].
    */
  def sessions(df: DataFrame, keyCol: String, tsCol: String,
               gapSec: Long): Dataset[SessionOut] = {
    require(gapSec > 0, "gapSec must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(keyCol).cast("long"), col(tsCol).cast("timestamp"))
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .as[(Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .transformWithState(new SessionProcessor(gapSec * 1000L),
        TimeMode.EventTime(), OutputMode.Append())
  }

  case class HeavyHit(key: Long, value: String, count_min: Long,
                      max_err: Long)

  /** Streaming heavy hitters per key — the Misra-Gries frequent-items
    * sketch as a `transformWithState` processor: per key, a counter map
    * BOUNDED at `capacity` entries regardless of stream length or value
    * cardinality. A value outside a full map triggers the classic
    * all-counters decrement (zeros evicted); `max_err` accumulates the
    * decrement total, giving the standard guarantee per emitted row:
    * `count_min ≤ true_count ≤ count_min + max_err`, with
    * `max_err ≤ N/(capacity+1)` — so any value with true frequency above
    * N/(capacity+1) is guaranteed PRESENT in the sketch. When distinct
    * values per key never exceed `capacity`, counts are exact
    * (`max_err = 0`) — the spec's cross-batch equality case.
    *
    * Emission: one row per sketch entry per TOUCHED key per batch
    * (Update mode — the live "current top values" shape). Values are
    * processed in row order within a batch; the sketch's membership is
    * order-sensitive at eviction boundaries (inherent to MG), its
    * guarantee is not. State per key is ≤ capacity (value, count) pairs
    * plus one long, independent of stream length — the 100 TB posture
    * for "top domains / top tokens right now" over unbounded streams.
    */
  class HeavyHittersProcessor(capacity: Int)
    extends StatefulProcessor[Long, (Long, String), HeavyHit] {
    @transient private var counts: MapState[String, Long] = _
    @transient private var err: ValueState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      counts = getHandle.getMapState[String, Long]("mg",
        Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
      err = getHandle.getValueState[Long]("err", Encoders.scalaLong,
        TTLConfig.NONE)
    }
    override def handleInputRows(key: Long, rows: Iterator[(Long, String)],
                                 timerValues: TimerValues): Iterator[HeavyHit] = {
      // work on a driver-side copy of the ≤capacity-entry map: the MG
      // decrement touches every counter, and read-modify-write through
      // the store per event would be O(capacity) store calls per row
      val m = scala.collection.mutable.LinkedHashMap.empty[String, Long]
      counts.iterator().foreach { case (k2, c) => m(k2) = c }
      var e = if (err.exists()) err.get() else 0L
      for ((_, v) <- rows) {
        if (m.contains(v)) m(v) += 1L
        else if (m.size < capacity) m(v) = 1L
        else {
          // decrement all; evict zeros (amortized O(1) per input row)
          e += 1L
          val dead = scala.collection.mutable.ArrayBuffer.empty[String]
          for ((k2, c) <- m) { if (c == 1L) dead += k2 else m(k2) = c - 1L }
          dead.foreach(m.remove)
        }
      }
      counts.clear()
      m.foreach { case (v, c) => counts.updateValue(v, c) }
      err.update(e)
      m.iterator.map { case (v, c) => HeavyHit(key, v, c, e) }
    }
  }

  /** Current per-key heavy-hitter sketches as an Update stream (see
    * [[HeavyHittersProcessor]]); RocksDB state store required as for
    * [[distinctCounts]].
    */
  def heavyHitters(df: DataFrame, keyCol: String, valueCol: String,
                   capacity: Int): Dataset[HeavyHit] = {
    require(capacity >= 1, s"capacity must be >= 1, got $capacity")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(keyCol).cast("long"), col(valueCol).cast("string"))
      .filter(col(keyCol).isNotNull && col(valueCol).isNotNull)
      .as[(Long, String)]
      .groupByKey(_._1)
      .transformWithState(new HeavyHittersProcessor(capacity),
        TimeMode.None(), OutputMode.Update())
  }

  case class CooccurPair(a: Long, b: Long)

  /** Streaming co-occurrence pair emission — the incremental half of
    * [[graft.operators.graph.CooccurEdges]]: baskets ACCUMULATE across
    * micro-batches (an order gathering lines, a session gathering page
    * views), and each newly-seen item emits one pair per already-seen
    * basket member, both orientations, exactly once per (basket, pair).
    * Counting the appended pairs by (a, b) therefore reproduces the
    * batch operator's weights for ANY chunking of the input — the
    * batch-parity property the spec pins. Per-batch pair generation
    * alone cannot do this (it misses pairs whose items arrived in
    * different batches).
    *
    * `maxBasketSize` is the mandatory state/blowup guard (the batch
    * cap's streaming edition): a basket stops absorbing items past the
    * cap, so state per key and pairs per item are both ≤ cap. Streaming
    * can't know the future, so truncation keeps FIRST-ARRIVAL items —
    * unlike the batch operator's smallest-items rule — which makes the
    * capped variant arrival-order-dependent by nature; the parity
    * contract is for baskets within the cap. Append mode.
    */
  class CooccurProcessor(cap: Int)
    extends StatefulProcessor[Long, (Long, Long), CooccurPair] {
    @transient private var st: ListState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getListState[Long]("items", Encoders.scalaLong, TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[(Long, Long)],
                                 timerValues: TimerValues): Iterator[CooccurPair] = {
      val have = scala.collection.mutable.LinkedHashSet(st.get().toSeq: _*)
      val before = have.size
      val out = List.newBuilder[CooccurPair]
      // sorted intake: the emitted pair SET is order-free below the cap,
      // and sorting makes the capped truncation deterministic per batch
      for (item <- rows.map(_._2).toSeq.distinct.sorted
           if !have.contains(item) && have.size < cap) {
        for (s <- have) { out += CooccurPair(item, s); out += CooccurPair(s, item) }
        have += item
      }
      if (have.size > before) st.put(have.toArray)
      out.result().iterator
    }
  }

  /** Co-occurrence pairs as an Append stream (see [[CooccurProcessor]]);
    * RocksDB state store required as for [[distinctCounts]].
    */
  def cooccurPairs(df: DataFrame, basketCol: String, itemCol: String,
                   maxBasketSize: Int = 256): Dataset[CooccurPair] = {
    require(maxBasketSize >= 1, "maxBasketSize must be >= 1 (state bound)")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(basketCol).cast("long"), col(itemCol).cast("long"))
      .filter(col(basketCol).isNotNull && col(itemCol).isNotNull)
      .as[(Long, Long)]
      .groupByKey(_._1)
      .transformWithState(new CooccurProcessor(maxBasketSize),
        TimeMode.None(), OutputMode.Append())
  }

  case class HammingMatch(a_id: String, b_id: String, hamming: Int)

  /** Streaming perceptual near-dup screen — the incremental half of
    * [[graft.operators.multimodal.ImageDedup]]: a stream of
    * (id, 64-bit hash) rows (image dHash, audio energy hash, video frame
    * hash — modality-agnostic) is banded into `maxHamming + 1` pigeonhole
    * chunk buckets; each bucket keeps the (id, hash) members it has seen
    * and every arriving row is verified (exact `bitCount(xor)`) against
    * the bucket's history, so near-duplicates are caught ACROSS
    * micro-batches — the ingest-time "have we seen this image before"
    * screen, with no re-scan of the corpus.
    *
    * Exactly-once pair emission without a global distinct (which Append
    * streaming cannot do): two hashes within the radius share one or
    * more chunks, and the pair is emitted only from their MINIMAL shared
    * chunk index — computable locally from the two hashes, so any bucket
    * can decide "mine or not mine" without coordination. Uncapped, the
    * emitted pair SET therefore equals
    * [[graft.operators.multimodal.ImageDedup.selfJoinFromHashes]] on the
    * union of all batches, for ANY chunking of the input (the
    * batch-parity property the spec pins), with `a_id < b_id`.
    *
    * `maxBucketSize` is the mandatory state guard (a degenerate hash —
    * flat images — would otherwise grow one bucket without bound): a
    * full bucket stops absorbing members (first-arrival kept, the
    * [[CooccurProcessor]] rule), so a pair survives capping only if its
    * minimal shared bucket held the earlier row — the capped contract is
    * a SUBSET of the batch pairs, arrival-order-dependent by nature.
    * Stored ids are idempotent under re-delivery; a cap-REJECTED id is
    * remembered in a bounded secondary state list (`cap` most-recent
    * rejects), so re-delivering it within that window emits nothing —
    * emission is idempotent under at-least-once redelivery (r19, VERDICT
    * r18 ask #3). Only a redelivery arriving after ≥ `cap` newer rejects
    * in the same bucket can still re-emit (never drop) pairs. Append
    * mode; RocksDB state store recommended.
    */
  /** Shared multi-index banding arithmetic for the streaming screens —
    * the same chunk/combination layout as
    * [[graft.operators.multimodal.ImageDedup.explodeComboChunks]] (and,
    * at width 1, as the batch single-chunk banding), so the streamed
    * pair sets stay batch-parity at ANY width. Combos are in
    * lexicographic `combinations` order: the cid a SQL-side banding
    * select assigns is the index this object assigns, which is what the
    * exactly-once min-shared-combo emission rule keys on.
    */
  private[streaming] object HammingBands {
    def chunkOf(h: Long, i: Int, c: Int): Long = {
      val base = 64 / c
      val start = i * base
      val len = if (i == c - 1) 64 - start else base
      val mask = if (len >= 64) -1L else (1L << len) - 1L
      (h >>> start) & mask
    }
    def combos(maxHamming: Int, width: Int): Array[Array[Int]] =
      (0 until (maxHamming + width)).combinations(width).map(_.toArray).toArray
    /** Index of the lexicographically first combination whose chunks all
      * agree, or -1 (for width 1 this is exactly min-shared-chunk).
      */
    def minSharedCombo(h1: Long, h2: Long, cs: Array[Array[Int]], c: Int): Int = {
      var i = 0
      while (i < cs.length) {
        val s = cs(i)
        var j = 0
        var all = true
        while (all && j < s.length) {
          all = chunkOf(h1, s(j), c) == chunkOf(h2, s(j), c)
          j += 1
        }
        if (all) return i
        i += 1
      }
      -1
    }
    /** SQL struct expressions `(chunk = cid, ckey = packed keys)` for the
      * banding select over a long column; width >= 2 packs each 16-bit-
      * guarded chunk key into one long (ImageDedup's packing).
      */
    def comboSelectExprs(hashCol: String, maxHamming: Int, width: Int): Seq[String] = {
      val c = maxHamming + width
      val base = 64 / c
      val lastLen = 64 - (c - 1) * base
      require(width == 1 || base >= 2,
        s"combo banding needs >=2-bit chunks: maxHamming=$maxHamming width=$width gives base=$base")
      def chunkLen(i: Int): Int = if (i == c - 1) lastLen else base
      def chunkSql(i: Int): String = {
        val start = i * base
        val len = chunkLen(i)
        val mask = if (len >= 64) -1L else (1L << len) - 1L
        s"(shiftright($hashCol, $start) & ${mask}L)"
      }
      // actual-width packing, identical to ImageDedup.explodeComboChunks
      // (the batch-parity contract): subset widths sum to <= 64 bits, so
      // no combo key ever sheds its leading chunks (ADVICE r18)
      combos(maxHamming, width).zipWithIndex.map { case (s, cid) =>
        val packed = s.map(i => (chunkSql(i), chunkLen(i))).toSeq
          .reduceLeft[(String, Int)] { case ((acc, _), (k, len)) =>
            (s"(shiftleft($acc, $len) | $k)", len)
          }._1
        s"struct(cast($cid as int) as chunk, $packed as ckey)"
      }.toSeq
    }
  }

  class HammingScreenProcessor(maxHamming: Int, cap: Int, bandWidth: Int = 1)
    extends StatefulProcessor[(Int, Long), (Int, Long, String, Long), HammingMatch] {
    private val c = maxHamming + bandWidth
    private val combos = HammingBands.combos(maxHamming, bandWidth)
    private def minSharedChunk(h1: Long, h2: Long): Int =
      HammingBands.minSharedCombo(h1, h2, combos, c)
    @transient private var st: ListState[(String, Long)] = _
    // Cap-rejected ids, kept so an at-least-once REDELIVERY of a rejected
    // id does not re-emit its matches (the r18 exactly-once hole: a member
    // id is idempotent via `have`, but a rejected id left no trace).
    // Bounded at `cap` most-recent entries — redelivery happens within a
    // replayed-batch horizon, so an LRU window the size of the bucket
    // itself covers it; an eviction can only re-admit an id that was
    // rejected ≥ cap rejections ago, which at worst re-emits pairs, never
    // drops any.
    @transient private var rej: ListState[String] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      st = getHandle.getListState[(String, Long)]("members",
        Encoders.tuple(Encoders.STRING, Encoders.scalaLong), TTLConfig.NONE)
      rej = getHandle.getListState[String]("rejected",
        Encoders.STRING, TTLConfig.NONE)
    }
    override def handleInputRows(key: (Int, Long),
                                 rows: Iterator[(Int, Long, String, Long)],
                                 timerValues: TimerValues): Iterator[HammingMatch] = {
      val have = scala.collection.mutable.LinkedHashMap(st.get().toSeq: _*)
      val before = have.size
      val rejected = scala.collection.mutable.LinkedHashSet(rej.get().toSeq: _*)
      var rejChanged = false
      val out = List.newBuilder[HammingMatch]
      // sorted intake: deterministic truncation within a batch (the
      // emitted set is order-free below the cap)
      for ((chunk, _, id, h) <- rows.toSeq.sortBy(r => (r._3, r._4))
           if !have.contains(id) && !rejected.contains(id)) {
        for ((oid, oh) <- have if oid != id) {
          val d = java.lang.Long.bitCount(h ^ oh)
          if (d <= maxHamming && minSharedChunk(h, oh) == chunk) {
            val (a, b) = if (id < oid) (id, oid) else (oid, id)
            out += HammingMatch(a, b, d)
          }
        }
        if (have.size < cap) have += (id -> h)
        else { rejected += id; rejChanged = true }
      }
      while (rejected.size > cap) { rejected -= rejected.head; rejChanged = true }
      if (have.size > before) st.put(have.toArray)
      if (rejChanged) rej.put(rejected.toArray)
      out.result().iterator
    }
  }

  /** Near-dup matches as an Append stream (see [[HammingScreenProcessor]]).
    * Input: a streaming frame with an id column and a 64-bit hash column
    * (produce hashes upstream with the `mm_dhash` / `mm_audio_hash` /
    * `mm_video_frame_hashes` projections — per-row, stream-safe).
    */
  def hammingScreen(df: DataFrame, idCol: String, hashCol: String,
                    maxHamming: Int = 6,
                    maxBucketSize: Int = 256,
                    bandWidth: Int = 1): Dataset[HammingMatch] = {
    require(maxHamming >= 0 && maxHamming <= 31,
      s"maxHamming must be in [0, 31], got $maxHamming")
    require(maxBucketSize >= 1, "maxBucketSize must be >= 1 (state bound)")
    require(bandWidth >= 1, s"bandWidth must be >= 1, got $bandWidth")
    val spark = df.sparkSession
    import spark.implicits._
    // identical banding arithmetic to ImageDedup.selfJoinFromHashes /
    // explodeComboChunks — the batch-parity contract depends on it.
    // bandWidth is the corpus-scale knob exactly as in the batch join:
    // at width 1 the state buckets grow ∝ corpus/2^(64/(maxHamming+1)),
    // so a large ingest corpus needs wider combo keys or the cap binds
    // and recall degrades
    val chunkExprs = HammingBands.comboSelectExprs("h", maxHamming, bandWidth)
    df.select(col(idCol).cast("string").as("id"), col(hashCol).cast("long").as("h"))
      .filter(col("id").isNotNull && col("h").isNotNull)
      .select(col("id"), col("h"),
        explode(expr(s"array(${chunkExprs.mkString(", ")})")).as("c"))
      .select(col("c.chunk").as("chunk"), col("c.ckey").as("ckey"),
        col("id"), col("h"))
      .as[(Int, Long, String, Long)]
      .groupByKey(r => (r._1, r._2))
      .transformWithState(
        new HammingScreenProcessor(maxHamming, maxBucketSize, bandWidth),
        TimeMode.None(), OutputMode.Append())
  }

  case class VideoFrameMatch(a_id: String, b_id: String, a_fi: Int, b_fi: Int,
                             a_nf: Int, b_nf: Int)
  case class VideoScreenMatch(a_id: String, b_id: String,
                              matched_a: Int, matched_b: Int,
                              a_frames: Int, b_frames: Int, overlap: Double)

  /** Bucket stage of the streaming VIDEO screen: keyed by (chunk, ckey)
    * like [[HammingScreenProcessor]], but members are FRAMES —
    * (video_id, frame_idx, hash, video_frame_count) — and the emitted
    * unit is a frame MATCH. The same min-shared-chunk rule makes each
    * frame pair emit exactly once across all buckets and batches; the
    * per-video frame count rides along so the pair stage never needs a
    * side lookup (the "small extension of the HammingScreenProcessor
    * state" the r17 verdict sketched). `cap` bounds members per bucket
    * (first-arrival kept) — the capped match set is a subset of the
    * uncapped one, arrival-order-dependent like every capped screen.
    */
  class VideoScreenBucketProcessor(maxHamming: Int, cap: Int, bandWidth: Int = 1)
    extends StatefulProcessor[(Int, Long),
      (Int, Long, String, Int, Long, Int), VideoFrameMatch] {
    private val c = maxHamming + bandWidth
    private val combos = HammingBands.combos(maxHamming, bandWidth)
    private def minSharedChunk(h1: Long, h2: Long): Int =
      HammingBands.minSharedCombo(h1, h2, combos, c)
    @transient private var st: ListState[(String, Int, Long, Int)] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getListState[(String, Int, Long, Int)]("frames",
        Encoders.tuple(Encoders.STRING, Encoders.scalaInt,
          Encoders.scalaLong, Encoders.scalaInt), TTLConfig.NONE)
    override def handleInputRows(key: (Int, Long),
                                 rows: Iterator[(Int, Long, String, Int, Long, Int)],
                                 timerValues: TimerValues): Iterator[VideoFrameMatch] = {
      // LinkedHashMap keyed by (vid, fi): idempotent under re-delivery of
      // stored members, deterministic intake order within a batch
      val have = scala.collection.mutable.LinkedHashMap(
        st.get().map(m => (m._1, m._2) -> m).toSeq: _*)
      val before = have.size
      val out = List.newBuilder[VideoFrameMatch]
      for ((chunk, _, vid, fi, h, nf) <- rows.toSeq.sortBy(r => (r._3, r._4, r._5))
           if !have.contains((vid, fi))) {
        for (((ovid, ofi), (_, _, oh, onf)) <- have if ovid != vid) {
          val d = java.lang.Long.bitCount(h ^ oh)
          if (d <= maxHamming && minSharedChunk(h, oh) == chunk) {
            if (vid < ovid) out += VideoFrameMatch(vid, ovid, fi, ofi, nf, onf)
            else out += VideoFrameMatch(ovid, vid, ofi, fi, onf, nf)
          }
        }
        if (have.size < cap) have += ((vid, fi) -> ((vid, fi, h, nf)))
      }
      if (have.size > before) st.put(have.values.toArray)
      out.result().iterator
    }
  }

  /** Pair stage of the streaming video screen: keyed by (a_id, b_id),
    * accumulating the distinct matched frame pairs and emitting the pair
    * ONCE, in the micro-batch where bidirectional containment first
    * crosses `minOverlap`. Matched counts only grow and the frame totals
    * are fixed, so the emitted pair SET equals the batch
    * [[graft.operators.multimodal.VideoDedup.selfJoinFromHashes]] pair
    * set on the union of all batches (the monotone-crossing argument;
    * spec-pinned) — the REPORTED counts are the at-crossing values, a
    * lower bound on the batch job's final counts by construction.
    * Exactly-once: a batch that only re-delivers already-stored frame
    * matches leaves overlapBefore == overlapAfter and emits nothing.
    */
  class VideoScreenPairProcessor(minOverlap: Double)
    extends StatefulProcessor[(String, String),
      VideoFrameMatch, VideoScreenMatch] {
    @transient private var st: ListState[(Int, Int, Int, Int)] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getListState[(Int, Int, Int, Int)]("matches",
        Encoders.tuple(Encoders.scalaInt, Encoders.scalaInt,
          Encoders.scalaInt, Encoders.scalaInt), TTLConfig.NONE)
    // Denominators are the MAX stored frame count per side, not ms.head's:
    // a video id is expected to arrive with one fixed frame set (the
    // mm_video_frame_hashes projection is atomic per video), but if an
    // upstream ever redelivers an id with a GROWN frame set, max() makes
    // the crossing decision deterministic (order-free) and conservative
    // rather than whichever tuple happened to be stored first (ADVICE r18).
    private def overlap(ms: Iterable[(Int, Int, Int, Int)]): Double =
      if (ms.isEmpty) 0.0
      else {
        val aNf = ms.map(_._3).max
        val bNf = ms.map(_._4).max
        math.max(ms.map(_._1).toSet.size.toDouble / math.max(aNf, 1),
          ms.map(_._2).toSet.size.toDouble / math.max(bNf, 1))
      }
    override def handleInputRows(key: (String, String),
                                 rows: Iterator[VideoFrameMatch],
                                 timerValues: TimerValues): Iterator[VideoScreenMatch] = {
      val have = scala.collection.mutable.LinkedHashSet(st.get().toSeq: _*)
      val before = have.size
      val crossedBefore = before > 0 && overlap(have) >= minOverlap
      rows.foreach(m => have += ((m.a_fi, m.b_fi, m.a_nf, m.b_nf)))
      if (have.size > before) st.put(have.toArray)
      val ovAfter = overlap(have)
      if (!crossedBefore && have.nonEmpty && ovAfter >= minOverlap) {
        Iterator.single(VideoScreenMatch(key._1, key._2,
          have.map(_._1).toSet.size, have.map(_._2).toSet.size,
          have.map(_._3).max, have.map(_._4).max, ovAfter))
      } else Iterator.empty
    }
  }

  /** Streaming VIDEO ingest screen — frame-set containment near-dup
    * across micro-batches (the streaming edition of
    * [[graft.operators.multimodal.VideoScreen]]; r17 verdict ask #8).
    * Input: one row per VIDEO with an id column and a frame-hash column
    * of `array<struct<frame_idx int, hash long>>` — exactly the
    * `mm_video_frame_hashes` projection, so a video's whole sampled
    * frame set arrives atomically and its frame count is `size(frames)`
    * (no partial-video state problem). Frames band into (chunk, ckey)
    * buckets; [[VideoScreenBucketProcessor]] emits each in-radius frame
    * pair exactly once (min-shared-chunk rule), and
    * [[VideoScreenPairProcessor]] emits a video pair the first time
    * bidirectional containment reaches `minOverlap` — two chained
    * transformWithState stages, both append-mode (Spark's
    * multi-stateful-operator support). Uncapped, the emitted pair set
    * equals the batch frame-set self-join for any chunking of the
    * input; `maxBucketSize` bounds per-bucket state and makes the
    * emitted set a subset (the shared cap contract). A redelivered
    * cap-REJECTED frame can re-emit its frame matches from the bucket
    * stage, but the pair stage absorbs them (its match set is idempotent
    * and the crossing test compares before/after), so the VIDEO pair
    * output stays exactly-once without a rejected-frame state list.
    */
  def videoScreen(df: DataFrame, idCol: String, framesCol: String,
                  maxHamming: Int = 6, minOverlap: Double = 0.5,
                  maxBucketSize: Int = 256,
                  bandWidth: Int = 1): Dataset[VideoScreenMatch] = {
    require(maxHamming >= 0 && maxHamming <= 31,
      s"maxHamming must be in [0, 31], got $maxHamming")
    require(minOverlap >= 0.0 && minOverlap <= 1.0,
      s"minOverlap must be in [0, 1], got $minOverlap")
    require(maxBucketSize >= 1, "maxBucketSize must be >= 1 (state bound)")
    require(bandWidth >= 1, s"bandWidth must be >= 1, got $bandWidth")
    val spark = df.sparkSession
    import spark.implicits._
    val chunkExprs = HammingBands.comboSelectExprs("h", maxHamming, bandWidth)
    df.select(col(idCol).cast("string").as("id"), col(framesCol).as("fr"))
      .filter(col("id").isNotNull && col("fr").isNotNull && size(col("fr")) > 0)
      .select(col("id"), size(col("fr")).as("nf"), explode(col("fr")).as("f"))
      // POSITIONAL struct-field access (star-expand + rename): the
      // projection's field names vary — mm_video_frame_hashes yields
      // (_1, _2), a collect_list(struct(idx, hash)) stamp carries its
      // column names — the contract is (frame_idx, hash) BY POSITION
      .select(col("id"), col("nf"), col("f.*"))
      .toDF("id", "nf", "fi", "h")
      .select(col("id"), col("nf"),
        col("fi").cast("int").as("fi"), col("h").cast("long").as("h"))
      .select(col("id"), col("nf"), col("fi"), col("h"),
        explode(expr(s"array(${chunkExprs.mkString(", ")})")).as("c"))
      .select(col("c.chunk").as("chunk"), col("c.ckey").as("ckey"),
        col("id"), col("fi"), col("h"), col("nf"))
      .as[(Int, Long, String, Int, Long, Int)]
      .groupByKey(r => (r._1, r._2))
      .transformWithState(
        new VideoScreenBucketProcessor(maxHamming, maxBucketSize, bandWidth),
        TimeMode.None(), OutputMode.Append())
      .groupByKey(m => (m.a_id, m.b_id))
      .transformWithState(new VideoScreenPairProcessor(minOverlap),
        TimeMode.None(), OutputMode.Append())
  }

  case class Anomaly(key: Long, ts: Long, value: Double, mean: Double,
                     std: Double, zscore: Double)

  /** Streaming anomaly detection — per-key exponentially-weighted mean
    * and variance (the EW Welford update: diff = x−μ, incr = α·diff,
    * μ += incr, σ² = (1−α)(σ² + diff·incr)), emitting a row ONLY when a
    * point deviates more than `k` EW standard deviations after a
    * `warmup`-point burn-in (Append mode — the alert stream shape).
    * State per key is three numbers, independent of stream length;
    * rows are processed in (ts, value) order within a batch for
    * determinism. The anomalous point still updates the state (spikes
    * inflate the variance and self-dampen — standard EWMA-control-chart
    * behavior).
    */
  def ewmaAnomalies(df: DataFrame, keyCol: String, tsCol: String,
                    valCol: String, alpha: Double, k: Double,
                    warmup: Int = 5): Dataset[Anomaly] = {
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1), got $alpha")
    require(k > 0 && warmup >= 1, "k must be positive, warmup >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(keyCol).cast("long"),
        unix_micros(col(tsCol).cast("timestamp")), col(valCol).cast("double"))
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull &&
        col(valCol).isNotNull)
      .as[(Long, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Double, Double, Long), Anomaly](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        case (key, rows, state: GroupState[(Double, Double, Long)]) =>
          var (mean, vr, n) = state.getOption.getOrElse((0.0, 0.0, 0L))
          val out = scala.collection.mutable.ArrayBuffer.empty[Anomaly]
          for ((_, ts, x) <- rows.toSeq.sortBy(r => (r._2, r._3))) {
            if (n == 0L) { mean = x; vr = 0.0 }
            else {
              val diff = x - mean
              val std = math.sqrt(vr)
              if (n >= warmup && std > 0 && math.abs(diff) > k * std)
                out += Anomaly(key, ts, x, mean, std, diff / std)
              val incr = alpha * diff
              mean += incr
              vr = (1 - alpha) * (vr + diff * incr)
            }
            n += 1
          }
          state.update((mean, vr, n))
          out.iterator
      }
  }

  case class CusumAlarm(key: String, ts: Long, value: Double,
                        s_pos: Double, s_neg: Double)

  /** Streaming two-sided CUSUM drift monitor — the live twin of the
    * batch [[graft.operators.temporal.Cusum]] detector: per-key state is
    * just (s⁺, s⁻) updated by the textbook recurrences
    * s⁺ = max(0, s⁺ + x − μ − κ), s⁻ = max(0, s⁻ + μ − κ − x); a row is
    * emitted whenever either side sits above `threshold` (Append mode —
    * the alert stream shape). Unlike [[ewmaAnomalies]] this fires on
    * small PERSISTENT shifts, not single spikes.
    *
    * Parity contract: rows are processed in (ts, value) order within a
    * batch, so for an in-timestamp-order stream the alarm set equals the
    * batch operator's (the batch closed form computes in exact decimal;
    * the streaming recurrence in double — ~1e-12 apart on 2-dec data,
    * which only matters for a point sitting exactly on the threshold).
    * State per key is two numbers, independent of stream length.
    */
  def cusumAlarms(df: DataFrame, keyCol: String, tsCol: String,
                  valCol: String, target: Double, slack: Double,
                  threshold: Double): Dataset[CusumAlarm] = {
    require(slack >= 0 && threshold > 0, "slack >= 0, threshold > 0")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(keyCol).cast("string"),
        unix_micros(col(tsCol).cast("timestamp")), col(valCol).cast("double"))
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull &&
        col(valCol).isNotNull)
      .as[(String, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Double, Double), CusumAlarm](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        case (key, rows, state: GroupState[(Double, Double)]) =>
          var (sp, sn) = state.getOption.getOrElse((0.0, 0.0))
          val out = scala.collection.mutable.ArrayBuffer.empty[CusumAlarm]
          for ((_, ts, x) <- rows.toSeq.sortBy(r => (r._2, r._3))) {
            sp = math.max(0.0, sp + (x - target - slack))
            sn = math.max(0.0, sn + (target - slack - x))
            if (sp > threshold || sn > threshold)
              out += CusumAlarm(key, ts, x, sp, sn)
          }
          state.update((sp, sn))
          out.iterator
      }
  }

  case class FunnelProgress(user_id: Long, depth: Int, step_ts: Seq[Long])

  /** Streaming ordered funnel — the micro-batch twin of
    * [[graft.operators.temporal.Funnel.analyze]]: per-user step state
    * advances when the NEXT step's event type arrives strictly after
    * the previous step's time (ties never advance) and, with
    * `maxSpanSeconds` set, within the window of step 1. Emits one
    * updated (user, depth, step timestamps-in-micros) row per touched
    * user per batch (Update mode).
    *
    * Parity contract: rows are processed in (ts, type) order WITHIN a
    * batch, so for a stream that is in timestamp order ACROSS batches
    * the final state equals the batch operator's min-chain exactly
    * (asserted in StreamingSpec); a late-arriving earlier step-1 event
    * cannot rewind already-advanced state — inherent to single-pass
    * streaming, same trade-off as any funnel over a live stream.
    *
    * Scale shape: state per user is k timestamps (bounded by funnel
    * length, NOT event volume); each batch touches only its own users.
    */
  def funnelProgress(df: DataFrame, userCol: String, tsCol: String,
                     typeCol: String, steps: Seq[String],
                     maxSpanSeconds: Long = 0L): Dataset[FunnelProgress] = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.length == steps.length,
      s"funnel steps must be distinct, got $steps")
    val spark = df.sparkSession
    import spark.implicits._
    val stepArr = steps.toIndexedSeq
    val spanUs = maxSpanSeconds * 1000000L
    df.select(col(userCol).cast("long"),
        unix_micros(col(tsCol).cast("timestamp")), col(typeCol).cast("string"))
      .filter(col(userCol).isNotNull && col(tsCol).isNotNull &&
        col(typeCol).isNotNull)
      .as[(Long, Long, String)]
      .groupByKey(_._1)
      .mapGroupsWithState[Seq[Long], FunnelProgress](GroupStateTimeout.NoTimeout) {
        case (key, rows, state: GroupState[Seq[Long]]) =>
          var times = state.getOption.getOrElse(Seq.empty[Long]).toVector
          // deterministic in-batch order — the source of the in-order
          // parity with the batch operator
          for ((_, ts, et) <- rows.toSeq.sortBy(r => (r._2, r._3))) {
            val d = times.length
            if (d < stepArr.length && et == stepArr(d)) {
              val afterPrev = d == 0 || ts > times(d - 1)
              val inWindow = d == 0 || spanUs <= 0 || ts <= times.head + spanUs
              if (afterPrev && inWindow) times = times :+ ts
            }
          }
          state.update(times)
          FunnelProgress(key, times.length, times)
      }
  }
}
