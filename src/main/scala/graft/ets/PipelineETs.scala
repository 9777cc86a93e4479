package graft.ets

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.dsl.ScriptContext
import graft.operators.dedup.TextDedup
import graft.operators.similarity.CosineSimilarity

/** DSL surface for the training-data pipeline operators
  * ([[graft.operators.dedup.TextDedup]] /
  * [[graft.operators.similarity.CosineSimilarity]] /
  * [[graft.operators.multimodal.Multimodal]]), so a script user can run
  * them without writing Scala — the "first-class operator" surface the
  * builder prompt requires beyond the reference's own ETs.
  */
object PipelineETs {
  def all: Seq[ET] = Seq(DedupET, SimilarityJoinET, AnnTopKET, BinaryMetaInPlaceET, LangIdET,
    DecontaminateET, RepetitionInPlaceET, PiiScrubInPlaceET, CorpusMixET, CorpusSplitET,
    ParagraphDedupInPlaceET, UnigramLmET, BigramLmET, BpeTrainET, SequencePackET,
    IncrementalDedupET, DocChunkET, GroupCapET, CorpusShuffleET, ResampleET,
    CorpusStatsET, TokenBudgetET, SubstringDedupInPlaceET, ImportanceSelectET,
    ClusterSampleET, ShardExportET, GopherRulesET, PerplexityBucketsET,
    TemperatureMixET, BoilerplateCleanET, DomainReweightET, C4RulesET,
    UnigramTokenizerET, SubseqSearchET, FunnelET, SeasonalDecomposeET,
    RetentionET, TransitionsET, PageRankFixedET, WordPieceET, MarketBasketET,
    PathsET, ProfileET, EwmaET, TrianglesET, LabelPropagationET, HoltET,
    TwapET, RobustOutliersET, StreamFunnelET, StreamAnomalyET, HistogramET,
    Scd2ET, AcfET, AbTestET, StreamSessionsET, StreamHeavyHittersET, Bm25ET,
    MmrRerankET, TextNormalizeInPlaceET, UrlCanonicalizeInPlaceET, CusumET,
    StreamCusumET, Bm25IndexET, RetrievalEvalET, AttributionET, SurvivalET,
    DistDriftET, SnippetsInPlaceET, FuzzyLinkageET, KCoreET, BfsHopsET, TrustRankET, EntityResolveET,
    BlocklistET, AsOfJoinET, RandomProjectionET, CooccurEdgesET, SsspET,
    CorenessET, StreamCooccurET, HarmonicCentralityET, ImageDedupET,
    NeighborhoodFunctionET, AudioFeaturesET, VideoDedupET, VideoScenesET,
    StreamHammingScreenET, StreamVideoScreenET)
}

/** `run hits as SnippetsInPlace.`` [where textCol="text" and
  * qtermsCol="qterms" and window="8" and stride="4"]` — query-biased
  * best-window snippet per row (see [[graft.operators.text.Snippets]]).
  */
object SnippetsInPlaceET extends NoPathET {
  override def name = "SnippetsInPlace"
  override def train(ctx: ScriptContext, df: DataFrame, path: String,
                     params: Map[String, String]): DataFrame =
    graft.operators.text.Snippets.bestWindow(df,
      params.getOrElse("textCol", "text"),
      params.getOrElse("qtermsCol", "qterms"),
      params.getOrElse("window", "8").toInt,
      params.getOrElse("stride", "4").toInt)
}

/** `run rows as DistDrift.`` where a="view" and b="purchase" [and
  * sideCol/valueCol and measure="psi"|"ks"|"psiBuckets" and nBuckets]` —
  * distribution drift between two samples (see
  * [[graft.operators.stats.DistDrift]]).
  */
object DistDriftET extends NoPathET {
  override def name = "DistDrift"
  override def train(ctx: ScriptContext, df: DataFrame, path: String,
                     params: Map[String, String]): DataFrame = {
    val sideCol = params.getOrElse("sideCol", "event_type")
    val valueCol = params.getOrElse("valueCol", "value")
    val a = params.getOrElse("a",
      throw new IllegalArgumentException("DistDrift requires a"))
    val b = params.getOrElse("b",
      throw new IllegalArgumentException("DistDrift requires b"))
    val nb = params.getOrElse("nBuckets", "10").toInt
    params.getOrElse("measure", "psi") match {
      case "psi" => graft.operators.stats.DistDrift.psi(df, sideCol, valueCol, a, b, nb)
      case "psiBuckets" =>
        graft.operators.stats.DistDrift.psiBuckets(df, sideCol, valueCol, a, b, nb)
      case "ks" => graft.operators.stats.DistDrift.ks(df, sideCol, valueCol, a, b)
      case other => throw new IllegalArgumentException(
        s"DistDrift measure must be psi|psiBuckets|ks, got '$other'")
    }
  }
}

/** `run subjects as Survival.`` [where durCol="dur" and eventCol="event"]`
  * — Kaplan-Meier product-limit survival curve over right-censored
  * durations (see [[graft.operators.temporal.Survival]]).
  */
object SurvivalET extends NoPathET {
  override def name = "Survival"
  override def train(ctx: ScriptContext, df: DataFrame, path: String,
                     params: Map[String, String]): DataFrame =
    graft.operators.temporal.Survival.kaplanMeier(df,
      params.getOrElse("durCol", "dur"),
      params.getOrElse("eventCol", "event"))
}

/** `run events as Attribution.`` where touchTypes="view,click" and
  * convType="purchase" [and lookbackDays="3" and userCol/tsCol/typeCol/
  * valueCol]` — linear / position / time-decay multi-touch conversion
  * attribution in one pass (see [[graft.operators.temporal.Attribution]]).
  */
object AttributionET extends NoPathET {
  override def name = "Attribution"
  override def train(ctx: ScriptContext, df: DataFrame, path: String,
                     params: Map[String, String]): DataFrame =
    graft.operators.temporal.Attribution.multiTouch(df,
      params.getOrElse("userCol", "user_id"),
      params.getOrElse("tsCol", "ts"),
      params.getOrElse("typeCol", "event_type"),
      params.getOrElse("valueCol", "value"),
      params.getOrElse("touchTypes", "view,click").split(",").map(_.trim).toSeq,
      params.getOrElse("convType", "purchase"),
      params.getOrElse("lookbackDays", "3").toInt)
}

/** `run ranked as RetrievalEval.`` where qrelsTable="judgments" and
  * k="10" [and qIdCol/idCol/rankCol]` — precision/recall@k, MRR, binary
  * nDCG per query (see [[graft.operators.text.RetrievalMetrics]]).
  */
object RetrievalEvalET extends NoPathET {
  override def name = "RetrievalEval"
  override def train(ctx: ScriptContext, df: DataFrame, path: String,
                     params: Map[String, String]): DataFrame =
    graft.operators.text.RetrievalMetrics.evaluate(df,
      ctx.spark.table(params.getOrElse("qrelsTable",
        throw new IllegalArgumentException("RetrievalEval requires qrelsTable"))),
      params.getOrElse("qIdCol", "qid"),
      params.getOrElse("idCol", "doc_id"),
      params.getOrElse("rankCol", "rank"),
      params.getOrElse("k", "10").toInt)
}

/** `run batch as Bm25Index.`/idx` [where mode="ingest" and idCol/textCol
  * and txn="3" and txnAppId="app"]` — append a batch to the persistent
  * incremental BM25 index (see [[graft.operators.text.Bm25Index]]);
  * `mode="query"` treats the input table as queries (qIdCol/qTextCol/k)
  * and serves top-k from the index with term-range file pruning;
  * `mode="maintain"` runs the segment merge (zorder-compact + vacuum).
  */
object Bm25IndexET extends ET {
  override def name = "Bm25Index"
  override def train(ctx: ScriptContext, df: DataFrame, path: String,
                     params: Map[String, String]): DataFrame = {
    require(path.nonEmpty, "Bm25Index requires the index path")
    import graft.operators.text.Bm25Index
    params.getOrElse("mode", "ingest") match {
      case "ingest" =>
        val v = Bm25Index.ingest(df,
          params.getOrElse("idCol", "doc_id"),
          params.getOrElse("textCol", "text"), path,
          params.get("txn").map(_.toLong), params.get("txnAppId"),
          params.getOrElse("maintainEvery", "16").toInt,
          params.getOrElse("retainVersions", "8").toInt)
        import ctx.spark.implicits._
        Seq((path, v)).toDF("index", "postings_version")
      case "query" =>
        Bm25Index.topK(ctx.spark, path, df,
          params.getOrElse("qIdCol", "qid"),
          params.getOrElse("qTextCol", "qtext"),
          params.getOrElse("k", "10").toInt,
          params.getOrElse("k1", "1.2").toDouble,
          params.getOrElse("b", "0.75").toDouble)
      case "maintain" =>
        Bm25Index.maintain(ctx.spark, path,
          params.getOrElse("retainVersions", "8").toInt)
        import ctx.spark.implicits._
        Seq(path).toDF("index")
      case other => throw new IllegalArgumentException(
        s"Bm25Index mode must be ingest|query|maintain, got '$other'")
    }
  }
}

/** `run stream as StreamCusum.`` where target="50" and slack="15" and
  * threshold="500" [and keyCol/tsCol/valCol]` — streaming two-sided
  * CUSUM drift alarms (see [[graft.streaming.Stateful.cusumAlarms]]);
  * per-key state is two doubles, Append-mode alert stream.
  */
object StreamCusumET extends NoPathET {
  override def name = "StreamCusum"
  override def train(ctx: ScriptContext, df: DataFrame, path: String,
                     params: Map[String, String]): DataFrame =
    graft.streaming.Stateful.cusumAlarms(df,
      params.getOrElse("keyCol", "event_type"),
      params.getOrElse("tsCol", "ts"),
      params.getOrElse("valCol", "value"),
      params.getOrElse("target",
        throw new IllegalArgumentException("StreamCusum requires target")).toDouble,
      params.getOrElse("slack", "0").toDouble,
      params.getOrElse("threshold",
        throw new IllegalArgumentException("StreamCusum requires threshold")).toDouble).toDF()
}

/** `run events as Cusum.`` where target="50" and slack="15" and
  * threshold="500" [and keyCol/tsCol/idCol/valCol and mode="alarms"]` —
  * two-sided CUSUM drift detection in exact decimal arithmetic (see
  * [[graft.operators.temporal.Cusum]]).
  */
object CusumET extends NoPathET {
  override def name = "Cusum"
  override def train(ctx: ScriptContext, df: DataFrame, path: String,
                     params: Map[String, String]): DataFrame = {
    val f = if (params.getOrElse("mode", "detect") == "alarms")
      graft.operators.temporal.Cusum.alarms _
    else graft.operators.temporal.Cusum.detect _
    f(df, params.getOrElse("keyCol", "event_type"),
      params.getOrElse("tsCol", "ts"),
      params.getOrElse("idCol", "event_id"),
      params.getOrElse("valCol", "value"),
      params.getOrElse("target",
        throw new IllegalArgumentException("Cusum requires target")).toDouble,
      params.getOrElse("slack", "0").toDouble,
      params.getOrElse("threshold",
        throw new IllegalArgumentException("Cusum requires threshold")).toDouble)
  }
}

/** `run pages as UrlCanonicalizeInPlace.`` [where urlCol="url"]` — adds
  * `url_canon`/`host`/`domain` for URL-level dedup and per-domain caps
  * (see [[graft.operators.text.UrlOps]]).
  */
object UrlCanonicalizeInPlaceET extends NoPathET {
  override def name = "UrlCanonicalizeInPlace"
  override def train(ctx: ScriptContext, df: DataFrame, path: String,
                     params: Map[String, String]): DataFrame =
    graft.operators.text.UrlOps.canonicalize(df,
      params.getOrElse("urlCol", "url"))
}

/** `run docs as TextNormalizeInPlace.`` [where textCol="text" and
  * lowercase="true"]` — unicode NFC + whitespace/control normalization in
  * place, with `n_chars_raw`/`n_chars_norm` audit columns (see
  * [[graft.operators.text.TextNormalize]]).
  */
object TextNormalizeInPlaceET extends NoPathET {
  override def name = "TextNormalizeInPlace"
  override def train(ctx: ScriptContext, df: DataFrame, path: String,
                     params: Map[String, String]): DataFrame =
    graft.operators.text.TextNormalize.normalize(df,
      params.getOrElse("textCol", "text"),
      params.getOrElse("lowercase", "false").toBoolean)
}

/** `run cands as MmrRerank.`` where vectorTable="embs" and k="5" [and
  * lambda="0.7" ...]` — greedy Maximal-Marginal-Relevance diversity
  * re-rank of per-query candidate lists (see
  * [[graft.operators.similarity.Mmr]]); the input table carries
  * (qIdCol, idCol, relCol), vectors come from `vectorTable`.
  */
object MmrRerankET extends NoPathET {
  override def name = "MmrRerank"
  override def train(ctx: ScriptContext, df: DataFrame, path: String,
                     params: Map[String, String]): DataFrame =
    graft.operators.similarity.Mmr.rerank(df,
      ctx.spark.table(params.getOrElse("vectorTable",
        throw new IllegalArgumentException("MmrRerank requires vectorTable"))),
      params.getOrElse("qIdCol", "qid"),
      params.getOrElse("idCol", "doc_id"),
      params.getOrElse("relCol", "rel"),
      params.getOrElse("vecIdCol", "vec_id"),
      params.getOrElse("vecCol", "embedding"),
      params.getOrElse("k", "10").toInt,
      params.getOrElse("lambda", "0.7").toDouble)
}

/** `run docs as Bm25.`` where queryTable="q" [and k="10" and k1="1.2" and
  * b="0.75"]` — Okapi BM25 lexical top-k retrieval (see
  * [[graft.operators.text.Bm25]]). `mode="rrf"` instead fuses ranked
  * lists by reciprocal-rank fusion: `lists="t1,t2"` names registered
  * tables carrying (qidCol, rank, idCol); the input table is ignored.
  */
object Bm25ET extends NoPathET {
  override def name = "Bm25"
  override def train(ctx: ScriptContext, df: DataFrame, path: String,
                     params: Map[String, String]): DataFrame = {
    import graft.operators.text.Bm25
    val idCol = params.getOrElse("idCol", "doc_id")
    val qidCol = params.getOrElse("qIdCol", "qid")
    val k = params.getOrElse("k", "10").toInt
    params.getOrElse("mode", "topk") match {
      case "topk" =>
        val queries = ctx.spark.table(params.getOrElse("queryTable",
          throw new IllegalArgumentException("Bm25 requires queryTable")))
        Bm25.topK(df, queries, idCol,
          params.getOrElse("textCol", "text"), qidCol,
          params.getOrElse("qTextCol", "qtext"), k,
          params.getOrElse("k1", "1.2").toDouble,
          params.getOrElse("b", "0.75").toDouble)
      case "rrf" =>
        val lists = params.getOrElse("lists",
          throw new IllegalArgumentException("Bm25 mode=rrf requires lists"))
          .split(",").map(_.trim).filter(_.nonEmpty).toSeq
          .map(ctx.spark.table)
        Bm25.rrfFuse(lists, qidCol, idCol, k,
          params.getOrElse("c", "60").toInt)
      case other => throw new IllegalArgumentException(
        s"Bm25 mode must be topk|rrf, got '$other'")
    }
  }
}

/** `run stream as StreamHeavyHitters.`` where capacity="16" [and
  * keyCol/valueCol]` — per-key Misra-Gries frequent-items sketch over an
  * unbounded stream (see [[graft.streaming.Stateful.heavyHitters]]):
  * bounded state, Update-mode emission of the current sketch, the
  * `count_min ≤ true ≤ count_min + max_err` guarantee. RocksDB state
  * store required.
  */
object StreamHeavyHittersET extends NoPathET {
  override def name = "StreamHeavyHitters"
  override def train(ctx: ScriptContext, df: DataFrame, path: String,
                     params: Map[String, String]): DataFrame =
    graft.streaming.Stateful.heavyHitters(df,
      params.getOrElse("keyCol", "user_id"),
      params.getOrElse("valueCol", "event_type"),
      params.getOrElse("capacity", "16").toInt).toDF()
}

/** `run stream as StreamCooccur.`` [where basketCol="bk" and itemCol="i"
  * and maxBasketSize="256"]` — incremental co-occurrence pair emission
  * across micro-batches (see [[graft.streaming.Stateful.cooccurPairs]]);
  * needs the RocksDB state store provider.
  */
object StreamCooccurET extends NoPathET {
  override def name = "StreamCooccur"
  override def train(ctx: ScriptContext, df: DataFrame, path: String,
                     params: Map[String, String]): DataFrame =
    graft.streaming.Stateful.cooccurPairs(df,
      params.getOrElse("basketCol", "bk"), params.getOrElse("itemCol", "i"),
      maxBasketSize = params.getOrElse("maxBasketSize", "256").toInt).toDF()
}

/** `run stream as StreamHammingScreen.`` [where idCol="id" and
  * hashCol="h" and maxHamming="6" and maxBucketSize="256" and
  * bandWidth="1"]` — streaming
  * perceptual near-dup screen across micro-batches (see
  * [[graft.streaming.Stateful.hammingScreen]]): banded Hamming buckets
  * with exactly-once min-chunk pair emission, batch-parity with
  * ImageDedup's self-join when uncapped; needs the RocksDB state store
  * provider.
  *
  * Delivery caveat (ADVICE r17): stored ids are idempotent under
  * re-delivery, but an id REJECTED by a full `maxBucketSize` bucket is
  * not remembered — if the SOURCE re-delivers such a row (at-least-once
  * upstream, e.g. duplicate Kafka produces), its matches re-emit. When
  * caps can bind and the upstream is at-least-once, dedup the output
  * downstream by `(a_id, b_id)` (a `dropDuplicates` or the sink's
  * upsert key).
  */
object StreamHammingScreenET extends NoPathET {
  override def name = "StreamHammingScreen"
  override def train(ctx: ScriptContext, df: DataFrame, path: String,
                     params: Map[String, String]): DataFrame =
    graft.streaming.Stateful.hammingScreen(df,
      params.getOrElse("idCol", "id"), params.getOrElse("hashCol", "h"),
      maxHamming = params.getOrElse("maxHamming", "6").toInt,
      maxBucketSize = params.getOrElse("maxBucketSize", "256").toInt,
      bandWidth = params.getOrElse("bandWidth", "1").toInt).toDF()
}

/** `run stream as StreamVideoScreen.`` [where idCol="id" and
  * framesCol="frames" and maxHamming="6" and minOverlap="0.5" and
  * maxBucketSize="256" and bandWidth="1"]` — streaming VIDEO ingest screen (see
  * [[graft.streaming.Stateful.videoScreen]]): frame-set containment
  * near-dup across micro-batches. Input rows carry a whole video each:
  * `framesCol` is an `array<struct<frame_idx int, hash long>>` — field
  * names are free, the two struct fields are read BY POSITION — e.g.
  * the `mm_video_frame_hashes` projection. A video pair is
  * appended ONCE, in the batch where bidirectional containment first
  * reaches `minOverlap`; uncapped, the emitted pair set equals the
  * batch VideoDedup self-join for any chunking. Needs the RocksDB
  * state store provider. Same delivery caveat as StreamHammingScreen:
  * when `maxBucketSize` binds and the upstream is at-least-once, dedup
  * downstream by `(a_id, b_id)`.
  */
object StreamVideoScreenET extends NoPathET {
  override def name = "StreamVideoScreen"
  override def train(ctx: ScriptContext, df: DataFrame, path: String,
                     params: Map[String, String]): DataFrame =
    graft.streaming.Stateful.videoScreen(df,
      params.getOrElse("idCol", "id"), params.getOrElse("framesCol", "frames"),
      maxHamming = params.getOrElse("maxHamming", "6").toInt,
      minOverlap = params.getOrElse("minOverlap", "0.5").toDouble,
      maxBucketSize = params.getOrElse("maxBucketSize", "256").toInt,
      bandWidth = params.getOrElse("bandWidth", "1").toInt).toDF()
}

/** `run stream as StreamSessions.`` where gapSec="1800" [and
  * keyCol/tsCol]` — timer-finalized streaming sessionization (see
  * [[graft.streaming.Stateful.sessions]]); needs a watermark on the
  * input and the RocksDB state store provider.
  */
object StreamSessionsET extends NoPathET {
  override def name = "StreamSessions"
  override def train(ctx: ScriptContext, df: DataFrame, path: String,
                     params: Map[String, String]): DataFrame =
    graft.streaming.Stateful.sessions(df,
      params.getOrElse("keyCol", "user_id"), params.getOrElse("tsCol", "ts"),
      params.getOrElse("gapSec", "1800").toLong).toDF()
}

/** `run rows as AbTest.`` where a="A" and b="B" [and
  * variantCol="variant" and successCol="converted"]` — pooled
  * two-proportion z readout (see [[graft.operators.stats.AbTest]]).
  */
object AbTestET extends NoPathET {
  override def name = "AbTest"
  override def train(ctx: ScriptContext, df: DataFrame, path: String,
                     params: Map[String, String]): DataFrame =
    params.getOrElse("mode", "ztest") match {
      case "ztest" => graft.operators.stats.AbTest.zTest(df,
        params.getOrElse("variantCol", "variant"),
        params.getOrElse("successCol", "converted"),
        params.getOrElse("a", "A"), params.getOrElse("b", "B"))
      // mode="cuped": per-unit metric + pre-experiment covariate ->
      // variance-reduced per-variant means (Deng et al. 2013)
      case "cuped" => graft.operators.stats.AbTest.cuped(df,
        params.getOrElse("variantCol", "variant"),
        params.getOrElse("metricCol", "y"),
        params.getOrElse("covCol", "x"))
      case other => throw new IllegalArgumentException(
        s"AbTest mode must be ztest|cuped, got '$other'")
    }
}

/** `run series as Acf.`` where maxLag="30" [and keyCol/tCol/valCol]` —
  * per-key autocorrelation / periodicity scan; `otherTable="b"` [and
  * `otherValCol`] switches to CROSS-correlation against that session
  * table over lags −maxLag..maxLag (see
  * [[graft.operators.temporal.Autocorrelation]]).
  */
object AcfET extends NoPathET {
  override def name = "Acf"
  override def train(ctx: ScriptContext, df: DataFrame, path: String,
                     params: Map[String, String]): DataFrame = {
    val tCol = params.getOrElse("tCol", "t")
    val valCol = params.getOrElse("valCol", "v")
    val maxLag = params.getOrElse("maxLag", "30").toInt
    params.get("otherTable") match {
      case Some(tbl) => graft.operators.temporal.Autocorrelation.ccf(
        df, ctx.spark.table(tbl), tCol, valCol,
        params.getOrElse("otherValCol", valCol), maxLag)
      case None => graft.operators.temporal.Autocorrelation.acf(df,
        params.getOrElse("keyCol", "k"), tCol, valCol, maxLag)
    }
  }
}

/** `run log as Scd2.`` where attrCols="tier,status" [and keyCol/tsCol/
  * tieCol]` — SCD Type-2 dimension build (see
  * [[graft.operators.temporal.Scd2]]).
  */
object Scd2ET extends NoPathET {
  override def name = "Scd2"
  override def train(ctx: ScriptContext, df: DataFrame, path: String,
                     params: Map[String, String]): DataFrame =
    graft.operators.temporal.Scd2.build(df,
      params.getOrElse("keyCol", "user_id"), params.getOrElse("tsCol", "ts"),
      params.getOrElse("attrCols", throw new IllegalArgumentException(
        "Scd2 requires attrCols=\"a,b\"")).split(",").map(_.trim)
        .filter(_.nonEmpty).toSeq,
      params.get("tieCol"))
}

/** `run rows as Histogram.`` where valCol="v" and nBuckets="20" [and
  * mode="width|depth"]` — distributed binning (see
  * [[graft.operators.profile.Histogram]]).
  */
object HistogramET extends NoPathET {
  override def name = "Histogram"
  override def train(ctx: ScriptContext, df: DataFrame, path: String,
                     params: Map[String, String]): DataFrame = {
    val c = params.getOrElse("valCol", "v")
    val n = params.getOrElse("nBuckets", "10").toInt
    params.getOrElse("mode", "width") match {
      case "width" => graft.operators.profile.Histogram.equiWidth(df, c, n)
      case "depth" => graft.operators.profile.Histogram.equiDepth(df, c, n)
      case other => throw new IllegalArgumentException(
        s"Histogram mode must be width|depth, got '$other'")
    }
  }
}

/** `run stream as StreamFunnel.`` where steps="a,b,c" [and userCol/
  * tsCol/typeCol/maxSpanSeconds]` — per-user streaming funnel state
  * (see [[graft.streaming.Stateful.funnelProgress]]); Update-mode
  * output, one row per touched user per micro-batch.
  */
object StreamFunnelET extends NoPathET {
  override def name = "StreamFunnel"
  override def train(ctx: ScriptContext, df: DataFrame, path: String,
                     params: Map[String, String]): DataFrame =
    graft.streaming.Stateful.funnelProgress(df,
      params.getOrElse("userCol", "user_id"), params.getOrElse("tsCol", "ts"),
      params.getOrElse("typeCol", "event_type"),
      params.getOrElse("steps", throw new IllegalArgumentException(
        "StreamFunnel requires steps=\"a,b,c\"")).split(",").map(_.trim)
        .filter(_.nonEmpty).toSeq,
      params.getOrElse("maxSpanSeconds", "0").toLong).toDF()
}

/** `run stream as StreamAnomaly.`` where alpha="0.3" and k="4" [and
  * keyCol/tsCol/valCol/warmup]` — streaming EWMA anomaly alerts (see
  * [[graft.streaming.Stateful.ewmaAnomalies]]); Append-mode alert rows.
  */
object StreamAnomalyET extends NoPathET {
  override def name = "StreamAnomaly"
  override def train(ctx: ScriptContext, df: DataFrame, path: String,
                     params: Map[String, String]): DataFrame =
    graft.streaming.Stateful.ewmaAnomalies(df,
      params.getOrElse("keyCol", "user_id"), params.getOrElse("tsCol", "ts"),
      params.getOrElse("valCol", "value"),
      params.getOrElse("alpha", "0.3").toDouble,
      params.getOrElse("k", "4.0").toDouble,
      params.getOrElse("warmup", "5").toInt).toDF()
}

/** `run rows as RobustOutliers.`` [where keyCol="k" and valCol="v" and
  * threshold="3.5"]` — modified-z-score outlier screen (see
  * [[graft.operators.profile.RobustOutliers]]).
  */
object RobustOutliersET extends NoPathET {
  override def name = "RobustOutliers"
  override def train(ctx: ScriptContext, df: DataFrame, path: String,
                     params: Map[String, String]): DataFrame =
    graft.operators.profile.RobustOutliers.summary(df,
      params.getOrElse("keyCol", "k"), params.getOrElse("valCol", "v"),
      params.getOrElse("threshold", "3.5").toDouble)
}

/** `run samples as Twap.`` [where keyCol="k" and tsCol="ts" and
  * valCol="v" and tieCol="event_id"]` — time-weighted average over
  * irregular samples (see [[graft.operators.temporal.Twap]]).
  */
object TwapET extends NoPathET {
  override def name = "Twap"
  override def train(ctx: ScriptContext, df: DataFrame, path: String,
                     params: Map[String, String]): DataFrame =
    graft.operators.temporal.Twap.compute(df,
      params.getOrElse("keyCol", "k"), params.getOrElse("tsCol", "ts"),
      params.getOrElse("valCol", "v"), params.get("tieCol"))
}

/** `run series as Holt.`` where alpha="0.5" and beta="0.25" [and
  * keyCol/tCol/valCol/chunk]` — Holt linear-trend smoothing as a
  * 2x2-matrix segmented scan (see [[graft.operators.temporal.Holt]]).
  */
object HoltET extends NoPathET {
  override def name = "Holt"
  override def train(ctx: ScriptContext, df: DataFrame, path: String,
                     params: Map[String, String]): DataFrame =
    graft.operators.temporal.Holt.smooth(df,
      params.getOrElse("keyCol", "k"), params.getOrElse("tCol", "t"),
      params.getOrElse("valCol", "v"),
      params.getOrElse("alpha", throw new IllegalArgumentException(
        "Holt requires alpha=...")).toDouble,
      params.getOrElse("beta", throw new IllegalArgumentException(
        "Holt requires beta=...")).toDouble,
      params.getOrElse("chunk", "4096").toInt)
}

/** `run edges as LabelPropagation.`` [where srcCol="src" and
  * dstCol="dst" and iterations="5"]` — deterministic synchronous LPA
  * communities (see [[graft.operators.graph.LabelPropagation]]).
  */
object LabelPropagationET extends NoPathET {
  override def name = "LabelPropagation"
  override def train(ctx: ScriptContext, df: DataFrame, path: String,
                     params: Map[String, String]): DataFrame =
    graft.operators.graph.LabelPropagation.run(df,
      params.getOrElse("srcCol", "src"), params.getOrElse("dstCol", "dst"),
      params.getOrElse("iterations", "5").toInt)
}

/** `run edges as Triangles.`` [where srcCol="src" and dstCol="dst"]` —
  * degree-oriented triangle census (see
  * [[graft.operators.graph.Triangles]]).
  */
object TrianglesET extends NoPathET {
  override def name = "Triangles"
  override def train(ctx: ScriptContext, df: DataFrame, path: String,
                     params: Map[String, String]): DataFrame =
    graft.operators.graph.Triangles.perNode(df,
      params.getOrElse("srcCol", "src"), params.getOrElse("dstCol", "dst"))
}

/** `run series as Ewma.`` where alpha="0.5" [and keyCol="k" and
  * tCol="t" and valCol="v" and chunk="4096"]` — segmented-scan
  * exponential smoothing (see [[graft.operators.temporal.Ewma]]).
  */
object EwmaET extends NoPathET {
  override def name = "Ewma"
  override def train(ctx: ScriptContext, df: DataFrame, path: String,
                     params: Map[String, String]): DataFrame =
    graft.operators.temporal.Ewma.smooth(df,
      params.getOrElse("keyCol", "k"), params.getOrElse("tCol", "t"),
      params.getOrElse("valCol", "v"),
      params.getOrElse("alpha", throw new IllegalArgumentException(
        "Ewma requires alpha=...")).toDouble,
      params.getOrElse("chunk", "4096").toInt)
}

/** `run tbl as Profile.`` [where cols="a,b,c" and exact="false"]` —
  * one-scan column profiling (see
  * [[graft.operators.profile.ColumnProfile]]); defaults to every
  * column. `exact="false"` switches distinct counts to HLL (no Expand
  * blowup — the 100 TB mode).
  */
object ProfileET extends NoPathET {
  override def name = "Profile"
  override def train(ctx: ScriptContext, df: DataFrame, path: String,
                     params: Map[String, String]): DataFrame = {
    val cols = params.get("cols") match {
      case Some(cs) => cs.split(",").map(_.trim).filter(_.nonEmpty).toSeq
      case None => df.columns.toSeq
    }
    graft.operators.profile.ColumnProfile.profile(df, cols,
      exact = params.getOrElse("exact", "true").toBoolean)
  }
}

/** `run basket_rows as MarketBasket.`` where minSupport="5" [and
  * basketCol="order_id" and itemCol="item"]` — pair association rules
  * (see [[graft.operators.basket.MarketBasket]]).
  */
object MarketBasketET extends NoPathET {
  override def name = "MarketBasket"
  override def train(ctx: ScriptContext, df: DataFrame, path: String,
                     params: Map[String, String]): DataFrame =
    graft.operators.basket.MarketBasket.pairRules(df,
      params.getOrElse("basketCol", "order_id"),
      params.getOrElse("itemCol", "item"),
      params.getOrElse("minSupport", "2").toLong)
}

/** `run events as Paths.`` where k="3" and topN="25" [and
  * userCol/tsCol/typeCol/tieCol/sep]` — top first-k event paths (see
  * [[graft.operators.temporal.Paths]]).
  */
object PathsET extends NoPathET {
  override def name = "Paths"
  override def train(ctx: ScriptContext, df: DataFrame, path: String,
                     params: Map[String, String]): DataFrame =
    graft.operators.temporal.Paths.top(df,
      params.getOrElse("userCol", "user_id"), params.getOrElse("tsCol", "ts"),
      params.getOrElse("typeCol", "event_type"),
      params.getOrElse("k", "3").toInt, params.getOrElse("topN", "25").toInt,
      params.getOrElse("sep", ">"), params.get("tieCol"))
}

/** `run docs as WordPiece.`` where vocab="a,##b,..." [and textCol="text"
  * and unk="[UNK]"]` — WordPiece greedy longest-match encode (see
  * [[graft.operators.text.WordPiece]]). `vocabTable="t"` reads the
  * vocabulary from a session table's `piece` column instead (the output
  * end of a trained vocab), capped like other model-state collects.
  */
object WordPieceET extends NoPathET {
  override def name = "WordPiece"
  override def train(ctx: ScriptContext, df: DataFrame, path: String,
                     params: Map[String, String]): DataFrame = {
    val vocab: Seq[String] = params.get("vocabTable") match {
      case Some(tbl) =>
        val rows = ctx.spark.table(tbl)
          .select(col("piece").cast("string")).limit(1000001).collect()
        require(rows.length <= 1000000,
          s"WordPiece vocabTable '$tbl' exceeds 1M pieces — not a vocab table?")
        rows.map(_.getString(0)).toSeq
      case None => params.getOrElse("vocab", throw new IllegalArgumentException(
        "WordPiece requires vocab=\"p1,p2,...\" or vocabTable=..."))
        .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    }
    graft.operators.text.WordPiece.withWordPieces(df,
      params.getOrElse("textCol", "text"), vocab,
      params.getOrElse("unk", "[UNK]"))
  }
}

/** `run events as Retention.`` where periodSec="86400" [and
  * userCol="user_id" and tsCol="ts"]` — cohort retention matrix (see
  * [[graft.operators.temporal.Retention]]).
  */
object RetentionET extends NoPathET {
  override def name = "Retention"
  override def train(ctx: ScriptContext, df: DataFrame, path: String,
                     params: Map[String, String]): DataFrame =
    graft.operators.temporal.Retention.matrix(df,
      params.getOrElse("userCol", "user_id"), params.getOrElse("tsCol", "ts"),
      params.getOrElse("periodSec", "86400").toLong)
}

/** `run events as Transitions.`` where [userCol="user_id" and tsCol="ts"
  * and typeCol="event_type" and tieCol="event_id"]` — first-order
  * event-transition matrix (see
  * [[graft.operators.temporal.Transitions]]).
  */
object TransitionsET extends NoPathET {
  override def name = "Transitions"
  override def train(ctx: ScriptContext, df: DataFrame, path: String,
                     params: Map[String, String]): DataFrame =
    graft.operators.temporal.Transitions.matrix(df,
      params.getOrElse("userCol", "user_id"), params.getOrElse("tsCol", "ts"),
      params.getOrElse("typeCol", "event_type"), params.get("tieCol"))
}

/** `run edges as PageRankFixed.`` where [srcCol="src" and dstCol="dst"
  * and iterations="5"]` — integer fixed-point PageRank (see
  * [[graft.operators.graph.PageRank]]; bit-reproducible, unlike the
  * reference-compat GraphX `PageRank` ET next door in MlETs).
  */
object PageRankFixedET extends NoPathET {
  override def name = "PageRankFixed"
  override def train(ctx: ScriptContext, df: DataFrame, path: String,
                     params: Map[String, String]): DataFrame =
    params.get("weightCol") match {
      // weightCol switches to the weighted variant (shares split by
      // integer edge weight; see PageRank.runWeighted)
      case Some(w) => graft.operators.graph.PageRank.runWeighted(df,
        params.getOrElse("srcCol", "src"), params.getOrElse("dstCol", "dst"),
        w, params.getOrElse("iterations", "5").toInt)
      case None => graft.operators.graph.PageRank.run(df,
        params.getOrElse("srcCol", "src"), params.getOrElse("dstCol", "dst"),
        params.getOrElse("iterations", "5").toInt)
    }
}

/** `run events as Funnel.`` where steps="signup,view,click,purchase"
  * [and userCol="user_id" and tsCol="ts" and typeCol="event_type" and
  * maxSpanSeconds="604800" and mode="users|summary"]` — ordered funnel
  * analysis (see [[graft.operators.temporal.Funnel]]: one combinable
  * min-agg per step, no per-user history). `mode="users"` (default)
  * emits per-user step times + depth; `mode="summary"` the per-step
  * conversion table.
  */
object FunnelET extends NoPathET {
  override def name = "Funnel"
  override def train(ctx: ScriptContext, df: DataFrame, path: String,
                     params: Map[String, String]): DataFrame = {
    import graft.operators.temporal.Funnel
    val steps = params.getOrElse("steps", throw new IllegalArgumentException(
      "Funnel requires steps=\"a,b,c\"")).split(",").map(_.trim)
      .filter(_.nonEmpty).toSeq
    val userCol = params.getOrElse("userCol", "user_id")
    val tsCol = params.getOrElse("tsCol", "ts")
    val typeCol = params.getOrElse("typeCol", "event_type")
    val span = params.getOrElse("maxSpanSeconds", "0").toLong
    params.getOrElse("mode", "users") match {
      case "users" => Funnel.analyze(df, userCol, tsCol, typeCol, steps, span)
      case "summary" => Funnel.summary(df, userCol, tsCol, typeCol, steps, span)
      case other => throw new IllegalArgumentException(
        s"Funnel mode must be users|summary, got '$other'")
    }
  }
}

/** `run hourly as SeasonalDecompose.`` where period="24" [and
  * keyCol="k" and tCol="t" and valCol="v"]` — classical additive
  * decomposition into trend/seasonal/resid over a per-key integer time
  * index (see [[graft.operators.temporal.SeasonalDecompose]]).
  */
object SeasonalDecomposeET extends NoPathET {
  override def name = "SeasonalDecompose"
  override def train(ctx: ScriptContext, df: DataFrame, path: String,
                     params: Map[String, String]): DataFrame =
    graft.operators.temporal.SeasonalDecompose.decompose(df,
      params.getOrElse("keyCol", "k"), params.getOrElse("tCol", "t"),
      params.getOrElse("valCol", "v"),
      params.getOrElse("period", throw new IllegalArgumentException(
        "SeasonalDecompose requires period=...")).toInt)
}

/** `run events as SubseqSearch.`` where query="1,2,3,4" and k="10" [and
  * keyCol="user_id" and tsCol="ts" and valCol="value" and tieCol="event_id"
  * and chunk="4096"]` — z-normalized subsequence similarity search (see
  * [[graft.operators.temporal.SubsequenceSearch]]: overlap-replicated
  * chunking, bounded groups, TakeOrdered global top-k). `mode="windows"
  * and m="8"` emits every window as a z-normalized vector row instead —
  * the bridge into the similarity stack (motif discovery).
  */
object SubseqSearchET extends NoPathET {
  override def name = "SubseqSearch"
  override def train(ctx: ScriptContext, df: DataFrame, path: String,
                     params: Map[String, String]): DataFrame = {
    import graft.operators.temporal.SubsequenceSearch
    val keyCol = params.getOrElse("keyCol", "user_id")
    val tsCol = params.getOrElse("tsCol", "ts")
    val valCol = params.getOrElse("valCol", "value")
    val tieCol = params.get("tieCol")
    val chunk = params.getOrElse("chunk", "4096").toInt
    params.getOrElse("mode", "topk") match {
      case "topk" => SubsequenceSearch.topK(df, keyCol, tsCol, valCol,
        params.getOrElse("query", throw new IllegalArgumentException(
          "SubseqSearch mode=topk requires query=\"v1,v2,...\""))
          .split(",").map(_.trim).filter(_.nonEmpty).map(_.toDouble).toSeq,
        params.getOrElse("k", "10").toInt, tieCol, chunk)
      case "windows" => SubsequenceSearch.windows(df, keyCol, tsCol, valCol,
        params.getOrElse("m", throw new IllegalArgumentException(
          "SubseqSearch mode=windows requires m=...")).toInt, tieCol, chunk)
      case other => throw new IllegalArgumentException(
        s"SubseqSearch mode must be topk|windows, got '$other'")
    }
  }
}

/** `run docs as UnigramTokenizer.`` where mode="train" and vocabSize="64"
  * [and textCol="text" and maxPieceLen="6" and iters="4" and
  * seedCap="100000" and driverDictCap="100000"]` — train a
  * SentencePiece-style unigram-LM vocabulary (see
  * [[graft.operators.text.UnigramTokenizer]]); returns (piece, cnt,
  * cost). `mode="encode" and vocabTable="v"` appends per-doc `n_pieces` /
  * `enc_cost` by broadcast-vocab Viterbi (piece-length bound derived from
  * the vocab; unseen chars cost max+1); `mode="tokenize"` additionally
  * emits the piece sequence and rank ids (`pieces`/`piece_ids` — the
  * SequencePack-consumable output); `mode="nbest" and n="5"` emits the
  * ranked top-n segmentations per word occurrence (the
  * subword-regularization enumeration) — persist the trained vocab and
  * everything downstream of it is SQL-replayable (the s32/s33/s35
  * oracles replay the Viterbi itself as a recursive-CTE shortest path).
  */
object UnigramTokenizerET extends NoPathET {
  override def name = "UnigramTokenizer"
  override def train(ctx: ScriptContext, df: DataFrame, path: String,
                     params: Map[String, String]): DataFrame = {
    import graft.operators.text.UnigramTokenizer
    val textCol = params.getOrElse("textCol", "text")
    params.getOrElse("mode", "train") match {
      case "train" => UnigramTokenizer.train(df, textCol,
        params.getOrElse("vocabSize", "256").toInt,
        params.getOrElse("maxPieceLen", "6").toInt,
        params.getOrElse("iters", "4").toInt,
        params.getOrElse("seedCap", "100000").toInt,
        params.getOrElse("driverDictCap", "100000").toInt)
      case "encode" => UnigramTokenizer.withEncoding(df, textCol,
        ctx.spark.table(params.getOrElse("vocabTable",
          throw new IllegalArgumentException(
            "UnigramTokenizer mode=encode requires vocabTable=..."))))
      case "tokenize" => UnigramTokenizer.withPieces(df, textCol,
        ctx.spark.table(params.getOrElse("vocabTable",
          throw new IllegalArgumentException(
            "UnigramTokenizer mode=tokenize requires vocabTable=..."))))
      case "nbest" => UnigramTokenizer.nbestTable(df,
        params.getOrElse("idCol", "doc_id"), textCol,
        ctx.spark.table(params.getOrElse("vocabTable",
          throw new IllegalArgumentException(
            "UnigramTokenizer mode=nbest requires vocabTable=..."))),
        params.getOrElse("n", "5").toInt)
      case "sample" => UnigramTokenizer.sampledTable(df,
        params.getOrElse("idCol", "doc_id"), textCol,
        ctx.spark.table(params.getOrElse("vocabTable",
          throw new IllegalArgumentException(
            "UnigramTokenizer mode=sample requires vocabTable=..."))),
        params.getOrElse("n", "5").toInt,
        params.getOrElse("alpha", "0.5").toDouble,
        params.getOrElse("seed", "42").toLong)
      case other => throw new IllegalArgumentException(
        s"UnigramTokenizer mode must be train|encode|tokenize|nbest|sample, got '$other'")
    }
  }
}

/** `run docs as C4Rules.`` [where textCol="text" and sep="\n" and
  * minWordsPerLine="5" and minSentences="3" and badPhrases="lorem
  * ipsum,{" and minParallelism="0"]` — the C4 cleaning battery (see
  * [[graft.operators.text.C4Rules]]: line punctuation/word-count
  * keepers + document sentence/blocked-phrase predicates, all per-row
  * codegen'd expressions).
  */
object C4RulesET extends NoPathET {
  override def name = "C4Rules"
  override def train(ctx: ScriptContext, df: DataFrame, path: String,
                     params: Map[String, String]): DataFrame =
    graft.operators.text.C4Rules.battery(df,
      params.getOrElse("textCol", "text"),
      params.getOrElse("sep", "\n"),
      params.getOrElse("minWordsPerLine", "5").toInt,
      params.getOrElse("minSentences", "3").toInt,
      params.get("badPhrases")
        .map(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty))
        .getOrElse(graft.operators.text.C4Rules.BadPhrases),
      params.getOrElse("minParallelism", "0").toInt)
}

/** `run docs as DomainReweight.`` [where domainCol="lang" and
  * textCol="text" and temperature="1.0"]` — DoReMi-lite mixture weights
  * per domain (see [[graft.operators.sampling.DomainReweight]]: one
  * corpus shuffle, vocabulary-sized KL, #domains-row normalization).
  * Chain into CorpusMix/TemperatureMix to materialize the mixture.
  */
object DomainReweightET extends NoPathET {
  override def name = "DomainReweight"
  override def train(ctx: ScriptContext, df: DataFrame, path: String,
                     params: Map[String, String]): DataFrame =
    graft.operators.sampling.DomainReweight.weights(df,
      params.getOrElse("domainCol", "lang"),
      params.getOrElse("textCol", "text"),
      params.getOrElse("temperature", "1.0").toDouble)
}

/** `run docs as BoilerplateClean.`` [where idCol="doc_id" and
  * textCol="text" and sep="\n" and minDocs="10" and minChars="6" and
  * maxBoiler="10000" and minParallelism="0"]` — RefinedWeb/CCNet
  * corpus-frequency boilerplate line removal (see
  * [[graft.operators.text.BoilerplateLines]]: one explode+agg shuffle for
  * the line document frequencies, df-capped set as one array Literal,
  * zero-shuffle per-row cleaning pass). `mode="frequent"` returns the
  * boilerplate set itself (line, n_docs) for persistence/inspection —
  * the frozen-set input of a streaming-ingest cleaning pass.
  */
object BoilerplateCleanET extends NoPathET {
  override def name = "BoilerplateClean"
  override def train(ctx: ScriptContext, df: DataFrame, path: String,
                     params: Map[String, String]): DataFrame = {
    val idCol = params.getOrElse("idCol", "doc_id")
    val textCol = params.getOrElse("textCol", "text")
    val sep = params.getOrElse("sep", "\n")
    val minDocs = params.getOrElse("minDocs", "10").toInt
    val minChars = params.getOrElse("minChars", "6").toInt
    val maxBoiler = params.getOrElse("maxBoiler", "10000").toInt
    import graft.operators.text.BoilerplateLines
    params.getOrElse("mode", "clean") match {
      case "clean" => BoilerplateLines.removeFrequent(df, idCol, textCol, sep,
        minDocs, minChars, maxBoiler,
        params.getOrElse("minParallelism", "0").toInt)
      case "frequent" => BoilerplateLines.frequentLines(df, idCol, textCol, sep,
        minDocs, minChars, maxBoiler)
      // frozen-set cleaning: strip against a PERSISTED frequent-line table
      // (computed on the historical corpus) — the streaming-ingest path:
      // the set resolves once at plan time, so the per-micro-batch work is
      // a pure projection and the input may be a streaming frame
      case "strip" =>
        val tbl = params.getOrElse("frozenTable", throw new IllegalArgumentException(
          "BoilerplateClean mode=strip requires frozenTable=... (a (line,...) table)"))
        // limit BEFORE the collect so a mis-pointed corpus-sized table
        // fails fast with the intended message, not a driver OOM
        val boiler = ctx.spark.table(tbl).select("line")
          .limit(maxBoiler + 1).collect().map(_.getString(0)).toSeq
        require(boiler.size <= maxBoiler,
          s"frozen set exceeds maxBoiler=$maxBoiler lines")
        BoilerplateLines.strip(df, textCol, boiler, sep)
      // RefinedWeb intra-doc repetition correction: first occurrence of
      // each line kept, order preserved — pure per-row expression
      case "dedupDoc" => BoilerplateLines.dedupWithinDoc(df, textCol, sep)
      case other => throw new IllegalArgumentException(
        s"BoilerplateClean mode must be clean|frequent|strip|dedupDoc, got '$other'")
    }
  }
}

/** `run docs as PerplexityBuckets.`` [where idCol="doc_id" and
  * textCol="text" and langCol="lang" and nBuckets="3" and lambda="0.75"
  * and minCount="1"]` — CCNet head/middle/tail perplexity tiers per
  * language under a corpus-fitted bigram LM (see
  * [[graft.operators.text.PerplexityBuckets]]: two-phase histogram
  * cutoffs, no per-language global sort).
  */
object PerplexityBucketsET extends NoPathET {
  override def name = "PerplexityBuckets"
  override def train(ctx: ScriptContext, df: DataFrame, path: String,
                     params: Map[String, String]): DataFrame =
    graft.operators.text.PerplexityBuckets.assign(df,
      params.getOrElse("idCol", "doc_id"),
      params.getOrElse("textCol", "text"),
      params.getOrElse("langCol", "lang"),
      params.getOrElse("nBuckets", "3").toInt,
      params.getOrElse("lambda", "0.75").toDouble,
      params.getOrElse("minCount", "1").toLong)
}

/** `run docs as TemperatureMix.`` [where domainCol="lang" and
  * idCol="doc_id" and alpha="0.3" and targetRows="1000" and seed="42"]`
  * — XLM-R/mT5 alpha-temperature resampling across domains (see
  * [[graft.operators.sampling.TemperatureMix]]: #domain-key count agg,
  * then the deterministic zero-shuffle Bernoulli-copies pass).
  */
object TemperatureMixET extends NoPathET {
  override def name = "TemperatureMix"
  override def train(ctx: ScriptContext, df: DataFrame, path: String,
                     params: Map[String, String]): DataFrame =
    graft.operators.sampling.TemperatureMix.resample(df,
      params.getOrElse("domainCol", "lang"),
      params.getOrElse("idCol", "doc_id"),
      params.getOrElse("alpha", "0.3").toDouble,
      params.getOrElse("targetRows", "1000").toLong,
      params.getOrElse("seed", "42").toLong)
}

/** `run docs as GopherRules.`` [where textCol="text" and mode="annotate|filter"
  * and minWords="50" and maxWords="100000" and minMeanLen="3.0" and
  * maxMeanLen="10.0" and maxSymbolRatio="0.1" and maxDigitRatio="0.2" and
  * minStopHits="2" and minParallelism="0"]` — the Gopher heuristic quality
  * battery (see [[graft.operators.text.QualityRules]]); `annotate` appends
  * the rule columns + `gopher_pass`, `filter` keeps only survivors.
  * `minParallelism` is the local-honesty repartition hatch
  * ([[graft.operators.scale.Parallelism]]) for single-split inputs.
  */
object GopherRulesET extends NoPathET {
  override def name = "GopherRules"
  override def train(ctx: ScriptContext, df: DataFrame, path: String,
                     params: Map[String, String]): DataFrame = {
    val textCol = params.getOrElse("textCol", "text")
    def i(k: String, d: Int) = params.getOrElse(k, d.toString).toInt
    def d(k: String, v: Double) = params.getOrElse(k, v.toString).toDouble
    val minPar = i("minParallelism", 0)
    val args = (i("minWords", 50), i("maxWords", 100000), d("minMeanLen", 3.0),
      d("maxMeanLen", 10.0), d("maxSymbolRatio", 0.1), d("maxDigitRatio", 0.2),
      i("minStopHits", 2))
    import graft.operators.text.QualityRules
    params.getOrElse("mode", "annotate") match {
      case "annotate" => QualityRules.gopher(df, textCol, args._1, args._2,
        args._3, args._4, args._5, args._6, args._7, minPar)
      case "filter" => QualityRules.gopherFilter(
        graft.operators.scale.Parallelism.ensure(df, minPar), textCol,
        args._1, args._2, args._3, args._4, args._5, args._6, args._7)
      // the A1.2 repetition battery (top-n-gram / duplicated-5-gram char mass)
      case "repetition" => QualityRules.repetition(df, textCol,
        d("maxTop2", 0.20), d("maxTop3", 0.18), d("maxTop4", 0.16),
        d("maxDup5", 0.15), minPar)
      case other => throw new IllegalArgumentException(
        s"GopherRules mode must be annotate|filter|repetition, got '$other'")
    }
  }
}

/** `run docs as ShardExport.`/path/out` where rowsPerShard="100000" [and
  * idCol="doc_id" and seed="42" and mode="write|assign"]` — deterministic
  * sharded export (see [[graft.operators.sampling.ShardExport]]): global
  * shuffle-order ranks via a two-phase prefix count, one parquet file per
  * `shard=N/` directory, `_manifest/` table returned. `mode="assign"`
  * skips the write and returns rows with (rank, shard).
  */
object ShardExportET extends ET {
  override def name = "ShardExport"
  override def train(ctx: ScriptContext, df: DataFrame, path: String,
                     params: Map[String, String]): DataFrame = {
    val rows = params.getOrElse("rowsPerShard",
      throw new IllegalArgumentException("ShardExport requires rowsPerShard")).toInt
    val idCol = params.getOrElse("idCol", "doc_id")
    val seed = params.getOrElse("seed", "42").toLong
    params.getOrElse("mode", "write") match {
      case "write" =>
        require(path.nonEmpty, "ShardExport write mode requires a path")
        graft.operators.sampling.ShardExport.write(df, path, idCol, rows, seed)
      case "assign" =>
        graft.operators.sampling.ShardExport.assignShards(df, idCol, rows, seed)
      case other => throw new IllegalArgumentException(
        s"ShardExport mode must be write|assign, got '$other'")
    }
  }
}

/** `run docs as SubstringDedupInPlace.`` [where idCol="doc_id" and
  * textCol="text" and k="50" and action="remove"|"spans"]` — exact
  * substring dedup: trim token spans duplicated anywhere in the corpus,
  * keeping the first occurrence (see
  * [[graft.operators.text.SubstringDedup]]; Lee et al. 2022's
  * exact-substring method as hashed stride-1 windows). `action="spans"`
  * returns the span table instead of rewriting the text.
  */
object SubstringDedupInPlaceET extends NoPathET {
  override def name = "SubstringDedupInPlace"
  override def train(ctx: ScriptContext, df: DataFrame, path: String,
                     params: Map[String, String]): DataFrame = {
    val idCol = params.getOrElse("idCol", "doc_id")
    val textCol = params.getOrElse("textCol", "text")
    val k = params.getOrElse("k", "50").toInt
    params.getOrElse("action", "remove") match {
      case "remove" =>
        graft.operators.text.SubstringDedup.removeSpans(df, idCol, textCol, k)
      case "spans" =>
        graft.operators.text.SubstringDedup.duplicateSpans(df, idCol, textCol, k)
      case other => throw new IllegalArgumentException(
        s"SubstringDedupInPlace action must be remove|spans, got '$other'")
    }
  }
}

/** `run docs as UnigramLm.`` [where idCol="doc_id" and textCol="text" and
  * topV="0"]` — per-document cross-entropy under a corpus-fitted unigram
  * LM (the CCNet-style perplexity-filter signal; see
  * [[graft.operators.text.UnigramLm]]). `topV > 0` caps the vocabulary so
  * the model broadcasts at scale (OOV tokens pool into one UNK mass).
  */
object UnigramLmET extends NoPathET {
  override def name = "UnigramLm"
  override def train(ctx: ScriptContext, df: DataFrame, path: String,
                     params: Map[String, String]): DataFrame =
    graft.operators.text.UnigramLm.crossEntropy(df,
      params.getOrElse("idCol", "doc_id"),
      params.getOrElse("textCol", "text"),
      params.getOrElse("topV", "0").toInt)
}

/** `run docs as BigramLm.`` [where idCol="doc_id" and textCol="text" and
  * lambda="0.75" and minCount="1"]` — per-document cross-entropy under a
  * corpus-fitted Jelinek-Mercer interpolated bigram LM (order-sensitive
  * perplexity signal; see [[graft.operators.text.BigramLm]]). `minCount`
  * prunes hapax bigrams from the model at scale; pruned bigrams back off
  * to the unigram term.
  */
object BigramLmET extends NoPathET {
  override def name = "BigramLm"
  override def train(ctx: ScriptContext, df: DataFrame, path: String,
                     params: Map[String, String]): DataFrame =
    graft.operators.text.BigramLm.crossEntropy(df,
      params.getOrElse("idCol", "doc_id"),
      params.getOrElse("textCol", "text"),
      params.getOrElse("lambda", "0.75").toDouble,
      params.getOrElse("minCount", "1").toLong)
}

/** `train docs as BpeTrain.`path` [where textCol="text" and
  * numMerges="1000"]` — learn BPE merges from the corpus (Sennrich'16;
  * pair statistics on the unique-word dictionary — see
  * [[graft.operators.text.BpeTrain]]). The merge table is returned and,
  * when `path` is non-empty, persisted for later encode stages.
  */
object BpeTrainET extends ET {
  override def name = "BpeTrain"
  /** `byteLevel="true"`: GPT-2-style byte pre-tokenization — the text
    * maps word-by-word through the closed 256-char byte alphabet
    * BEFORE training, and the saved vocab seeds ALL 256 base symbols
    * (not just corpus-observed chars), so encode can never emit -1:
    * no-OOV by construction (see
    * [[graft.operators.text.ByteLevel]]).
    */
  override def train(ctx: ScriptContext, df: DataFrame, path: String,
                     params: Map[String, String]): DataFrame = {
    import ctx.spark.implicits._
    val textCol = params.getOrElse("textCol", "text")
    val byteLevel = params.getOrElse("byteLevel", "false").toBoolean
    val (tdf, tcol) =
      if (byteLevel) (graft.operators.text.ByteLevel
        .withByteText(df, textCol, "__bl__"), "__bl__")
      else (df, textCol)
    val merges = graft.operators.text.BpeTrain.learnMerges(tdf,
      tcol, params.getOrElse("numMerges", "1000").toInt)
    if (path.nonEmpty) {
      merges.write.mode("overwrite").parquet(path + "/data")
      // vocab = alphabet + merge outputs, id-ordered — saved with the
      // model so `predict ... output="ids"` maps symbols without the
      // training corpus; byte-level seeds the FULL 256-symbol alphabet
      val mergeSeq = merges.orderBy("rank").collect()
        .map(r => (r.getAs[String]("left"), r.getAs[String]("right"))).toSeq
      val vocab =
        if (byteLevel)
          (graft.operators.text.ByteLevel.fullAlphabet ++
            mergeSeq.map { case (l, r) => l + r }).zipWithIndex
            .map { case (t, i) => (i.toLong, t) }
        else graft.operators.text.BpeTrain.vocabOf(tdf, tcol, mergeSeq)
      vocab.toDF("id", "token").repartition(1)
        .write.mode("overwrite").parquet(path + "/vocab")
      ctx.spark.createDataFrame(Seq(Tuple1(byteLevel))).toDF("byte_level")
        .repartition(1).write.mode("overwrite").parquet(path + "/meta")
    }
    merges
  }

  /** `predict docs as BpeTrain.`path` [where output="count"|"ids"]` —
    * encode with the merges saved by `train` (rank order): appends
    * `n_bpe_tokens` (default) or the full `bpe_ids` token-id array (OOV
    * symbols → -1). The merge/vocab tables are vocabulary-sized — the
    * k-row collects are the model load, not a data collect.
    */
  override def batchPredict(ctx: ScriptContext, df0: DataFrame, path: String,
                            params: Map[String, String]): DataFrame = {
    require(path.nonEmpty, "predict ... as BpeTrain.`path` needs the trained merge dir")
    val merges = ctx.spark.read.parquet(path + "/data")
      .orderBy("rank").collect()
      .map(r => (r.getAs[String]("left"), r.getAs[String]("right"))).toSeq
    // a byte-level model recorded itself in /meta: apply the same byte
    // pre-tokenization at encode time (absent meta = legacy char model)
    val byteLevel = scala.util.Try(ctx.spark.read.parquet(path + "/meta")
      .collect().head.getBoolean(0)).getOrElse(false)
    val rawTextCol = params.getOrElse("textCol", "text")
    val (df, textCol) =
      if (byteLevel) (graft.operators.text.ByteLevel
        .withByteText(df0, rawTextCol, "__bl__"), "__bl__")
      else (df0, rawTextCol)
    val out = params.getOrElse("output", "count") match {
      case "count" =>
        graft.operators.text.BpeTrain.withBpeTokenCount(df, textCol, merges,
          params.getOrElse("outputCol", "n_bpe_tokens"))
      case "ids" =>
        val vocab = ctx.spark.read.parquet(path + "/vocab")
          .collect().map(r => r.getAs[String]("token") -> r.getAs[Long]("id")).toMap
        graft.operators.text.BpeTrain.withBpeTokenIds(df, textCol, merges, vocab,
          params.getOrElse("outputCol", "bpe_ids"))
      case other => throw new IllegalArgumentException(
        s"BpeTrain predict output must be count|ids, got '$other'")
    }
    if (byteLevel) out.drop("__bl__") else out
  }
}

/** `run batch as IncrementalDedup.`store` [where idCol="doc_id" and
  * textCol="text" and threshold="0.8" and bands="24" and rowsPerBand="4"
  * and ngram="3" and update="true"]` — rolling-ingestion near-dup removal
  * against a persistent MinHash signature store (a vparquet table; see
  * [[graft.operators.dedup.SignatureStore]]). Returns the batch docs that
  * survive both within-batch dedup and the store comparison; with
  * `update="true"` (default) their signatures join the store atomically,
  * so re-submitting a batch yields zero survivors. Every
  * `maintainEvery="16"` commits the store auto-compacts and vacuums to
  * `retainVersions="8"` so posting reads stay bounded over any number of
  * ingest batches (`maintainEvery="0"` disables).
  */
object IncrementalDedupET extends ET {
  override def name = "IncrementalDedup"
  override def train(ctx: ScriptContext, df: DataFrame, path: String,
                     params: Map[String, String]): DataFrame = {
    require(path.nonEmpty, "IncrementalDedup requires the signature-store path")
    graft.operators.dedup.SignatureStore.dedupAgainst(df,
      params.getOrElse("idCol", "doc_id"),
      params.getOrElse("textCol", "text"),
      path,
      params.getOrElse("threshold", "0.8").toDouble,
      params.getOrElse("bands", "24").toInt,
      params.getOrElse("rowsPerBand", "4").toInt,
      params.getOrElse("ngram", "3").toInt,
      params.getOrElse("update", "true").toBoolean,
      params.getOrElse("maintainEvery", "16").toInt,
      params.getOrElse("retainVersions", "8").toInt)
  }
}

/** `run docs as SequencePack.`` [where idCol="doc_id" and seqLen="2048"
  * and (tokenCol="n_tok" | textCol="text")]` — GPT-style concatenate-and-
  * chunk training-sequence layout (see
  * [[graft.operators.text.SequencePack.chunkLayout]]: distributed
  * two-phase prefix sum, no global single-partition sort). With `textCol`
  * the whitespace token count is computed on the fly.
  */
object SequencePackET extends NoPathET {
  override def name = "SequencePack"
  override def train(ctx: ScriptContext, df: DataFrame, path: String,
                     params: Map[String, String]): DataFrame = {
    val idCol = params.getOrElse("idCol", "doc_id")
    val seqLen = params.getOrElse("seqLen", "2048").toInt
    val (frame, tokenCol) = params.get("tokenCol") match {
      case Some(tc) => (df, tc)
      case None =>
        val textCol = params.getOrElse("textCol", "text")
        (df.withColumn("__n_tok__", size(split(col(textCol), " "))), "__n_tok__")
    }
    graft.operators.text.SequencePack.chunkLayout(frame, idCol, tokenCol, seqLen,
      partitions = params.getOrElse("partitions", "0").toInt)
  }
}

/** `run docs as ParagraphDedupInPlace.`` [where idCol="doc_id" and
  * textCol="text" and sep="\n\n"]` — corpus-wide first-occurrence
  * paragraph dedup, rebuilt in place
  * (see [[graft.operators.dedup.TextDedup.dedupParagraphs]]).
  */
object ParagraphDedupInPlaceET extends NoPathET {
  override def name = "ParagraphDedupInPlace"
  override def train(ctx: ScriptContext, df: DataFrame, path: String,
                     params: Map[String, String]): DataFrame =
    TextDedup.dedupParagraphs(df,
      params.getOrElse("idCol", "doc_id"),
      params.getOrElse("textCol", "text"),
      params.getOrElse("sep", "\n\n"))
}

/** `run docs as CorpusMix.`` where weights="en:0.5,zh:2.25" [and
  * domainCol="lang" and idCol="doc_id" and seed="42" and
  * defaultWeight="1.0"]` — deterministic domain re-weighting
  * (see [[graft.operators.sampling.CorpusMix]]: hash-Bernoulli
  * down-sampling + integer-copy up-sampling, no shuffle, reproducible on
  * any partitioning).
  */
object CorpusMixET extends NoPathET {
  override def name = "CorpusMix"
  override def train(ctx: ScriptContext, df: DataFrame, path: String,
                     params: Map[String, String]): DataFrame = {
    // weightsTable="t" reads (domain, weight) rows from a session table —
    // the output end of a computed mixture (DomainReweight/TemperatureMix
    // rates); #domains-bounded collect, same posture as ClusterSample's
    // centroidsTable. Inline weights="d:w,..." otherwise.
    val weights = params.get("weightsTable") match {
      case Some(tbl) =>
        // explicit casts: a weights table built in SQL may type weight as
        // DECIMAL (literals) or domain as non-string — fail on values, not
        // with an opaque ClassCastException; cap the collect (#domains)
        val rows = ctx.spark.table(tbl)
          .select(col("domain").cast("string"), col("weight").cast("double"))
          .limit(100001).collect()
        require(rows.length <= 100000,
          s"CorpusMix weightsTable '$tbl' exceeds 100k domains — not a weights table?")
        // duplicate domain rows would silently collapse via toMap with a
        // collect-order-dependent winner — fail loud instead (the inline
        // weights= syntax cannot even express the ambiguity)
        val dups = rows.groupBy(_.getString(0)).collect {
          case (d, rs) if rs.length > 1 => d
        }
        require(dups.isEmpty,
          s"CorpusMix weightsTable '$tbl' has duplicate domain rows: " +
            dups.toSeq.sorted.take(5).mkString(", "))
        rows.map(r => r.getString(0) -> r.getDouble(1)).toMap
      case None => params.getOrElse("weights",
        throw new IllegalArgumentException(
          "CorpusMix requires weights=\"domain:w,domain:w\" or weightsTable=...")).split(",")
        .map(_.trim).filter(_.nonEmpty).map { kv =>
          val i = kv.lastIndexOf(':')
          require(i > 0 && i < kv.length - 1,
            s"CorpusMix weight '$kv' is not domain:weight")
          kv.substring(0, i) -> kv.substring(i + 1).toDouble
        }.toMap
    }
    graft.operators.sampling.CorpusMix.mix(df,
      params.getOrElse("domainCol", "lang"), weights,
      params.getOrElse("idCol", "doc_id"),
      params.getOrElse("seed", "42").toLong,
      params.getOrElse("defaultWeight", "1.0").toDouble)
  }
}

/** `run docs as CorpusSplit.`` where splits="train:0.8,valid:0.1,test:0.1"
  * [and keyCol="doc_id" and groupCol="cluster" and seed="42" and
  * method="hash|neardup" and textCol="text" and threshold="0.8" and
  * ngram="3" and splitCol="split"]` — deterministic leakage-safe
  * train/valid/test assignment (see
  * [[graft.operators.sampling.CorpusSplit]]: hash draw on the row or
  * group identity; `method="neardup"` groups by MinHash near-dup
  * component so near-duplicates never straddle splits).
  */
object CorpusSplitET extends NoPathET {
  override def name = "CorpusSplit"
  override def train(ctx: ScriptContext, df: DataFrame, path: String,
                     params: Map[String, String]): DataFrame = {
    val splits = params.getOrElse("splits",
      throw new IllegalArgumentException(
        "CorpusSplit requires splits=\"name:w,name:w\"")).split(",")
      .map(_.trim).filter(_.nonEmpty).toSeq.map { kv =>
        val i = kv.lastIndexOf(':')
        require(i > 0 && i < kv.length - 1,
          s"CorpusSplit split '$kv' is not name:weight")
        kv.substring(0, i) -> kv.substring(i + 1).toDouble
      }
    val keyCol = params.getOrElse("keyCol", "doc_id")
    val seed = params.getOrElse("seed", "42").toLong
    val splitCol = params.getOrElse("splitCol", "split")
    params.getOrElse("method", "hash") match {
      case "hash" =>
        graft.operators.sampling.CorpusSplit.split(df, keyCol, splits,
          seed, params.get("groupCol"), splitCol)
      case "neardup" =>
        graft.operators.sampling.CorpusSplit.splitByNearDup(df, keyCol,
          params.getOrElse("textCol", "text"), splits,
          params.getOrElse("threshold", "0.8").toDouble,
          params.getOrElse("ngram", "3").toInt, seed, splitCol)
      case other => throw new IllegalArgumentException(
        s"CorpusSplit method must be hash|neardup, got '$other'")
    }
  }
}

/** `run docs as TokenBudget.`` where tokenCol="n_tokens" and
  * budget="50000000000" [and idCol="doc_id" and seed="42"]` — the
  * whole-document prefix of the shuffled corpus whose cumulative token
  * cost fits the budget (see [[graft.operators.sampling.TokenBudget]]:
  * distributed prefix sum, budget-sized window cost).
  */
object TokenBudgetET extends NoPathET {
  override def name = "TokenBudget"
  override def train(ctx: ScriptContext, df: DataFrame, path: String,
                     params: Map[String, String]): DataFrame = {
    val idCol = params.getOrElse("idCol", "doc_id")
    val tokenCol = params.getOrElse("tokenCol",
      throw new IllegalArgumentException("TokenBudget requires tokenCol"))
    val seed = params.getOrElse("seed", "42").toLong
    params.get("groupCol") match {
      case Some(g) =>
        // budgets="en:20000,zh:8000"; groups not listed get defaultBudget
        // (negative = dropped — a mixture recipe names its components)
        val budgets = params.getOrElse("budgets",
          throw new IllegalArgumentException(
            "TokenBudget with groupCol requires budgets=\"g:B,...\""))
          .split(",").map(_.trim).filter(_.nonEmpty).map { kv =>
            val i = kv.lastIndexOf(':')
            require(i > 0 && i < kv.length - 1,
              s"TokenBudget budget '$kv' is not group:budget")
            kv.substring(0, i) -> kv.substring(i + 1).toLong
          }.toMap
        graft.operators.sampling.TokenBudget.takePerGroup(df, g, idCol,
          tokenCol, budgets,
          params.getOrElse("defaultBudget", "-1").toLong, seed)
      case None =>
        graft.operators.sampling.TokenBudget.take(df, idCol, tokenCol,
          params.getOrElse("budget",
            throw new IllegalArgumentException(
              "TokenBudget requires budget")).toLong, seed)
    }
  }
}

/** `train docs as CorpusStats.`/state/path` where cols="doc_id,lang"
  * [and batchId="2026-08-13"]` — merge this batch into the incremental
  * corpus-statistics store and return the running totals (see
  * [[graft.operators.stats.CorpusStats]]: mergeable HLL sketches in a
  * vparquet state table; `batchId` gives exactly-once semantics).
  */
object CorpusStatsET extends ET {
  override def name = "CorpusStats"
  override def train(ctx: ScriptContext, df: DataFrame, path: String,
                     params: Map[String, String]): DataFrame = {
    require(path.nonEmpty, "CorpusStats requires a state path")
    graft.operators.stats.CorpusStats.update(df,
      params.getOrElse("cols",
        throw new IllegalArgumentException("CorpusStats requires cols"))
        .split(",").map(_.trim).filter(_.nonEmpty).toSeq,
      path, params.get("batchId"),
      params.getOrElse("lgK", "12").toInt)
  }
}

/** `run events as Resample.`` where keyCols="event_type" and tsCol="ts"
  * and interval="3600" [and aggs="count:*,sum:value" and
  * fill="null|zero|ffill" and bucketCol="bucket"]` — fixed-interval
  * downsampling with a dense gap-filled per-key bucket axis (see
  * [[graft.operators.temporal.Resample]]). Agg spec is
  * `fn:col[,fn:col...]` with fn in count/sum/avg/min/max; output column
  * `fn_col` (`count:*` → `n`).
  */
object ResampleET extends NoPathET {
  override def name = "Resample"
  override def train(ctx: ScriptContext, df: DataFrame, path: String,
                     params: Map[String, String]): DataFrame = {
    val keyCols = params.getOrElse("keyCols",
      throw new IllegalArgumentException("Resample requires keyCols"))
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val interval = params.getOrElse("interval",
      throw new IllegalArgumentException(
        "Resample requires interval (seconds)")).toLong
    val aggs = params.getOrElse("aggs", "count:*").split(",")
      .map(_.trim).filter(_.nonEmpty).toSeq.map { spec =>
        spec.split(":") match {
          case Array("count", _) => "n" -> count(lit(1))
          case Array(fn, c) =>
            val in = col(c)
            s"${fn}_$c" -> (fn match {
              case "sum" => sum(in)
              case "avg" => avg(in)
              case "min" => min(in)
              case "max" => max(in)
              case other => throw new IllegalArgumentException(
                s"Resample agg '$other' not in count/sum/avg/min/max")
            })
          case _ => throw new IllegalArgumentException(
            s"Resample agg spec '$spec' is not fn:col")
        }
      }
    graft.operators.temporal.Resample.resample(df, keyCols,
      params.getOrElse("tsCol", "ts"), interval, aggs,
      params.getOrElse("fill", "null"),
      params.getOrElse("bucketCol", "bucket"))
  }
}

/** `run docs as CorpusShuffle.`` [where idCol="doc_id" and seed="42"]` —
  * deterministic global training-order shuffle (see
  * [[graft.operators.sampling.CorpusShuffle]]); re-seed for a fresh
  * epoch permutation.
  */
object CorpusShuffleET extends NoPathET {
  override def name = "CorpusShuffle"
  override def train(ctx: ScriptContext, df: DataFrame, path: String,
                     params: Map[String, String]): DataFrame =
    graft.operators.sampling.CorpusShuffle.shuffle(df,
      params.getOrElse("idCol", "doc_id"),
      params.getOrElse("seed", "42").toLong)
}

/** `run docs as GroupCap.`` where groupCol="lang" and cap="1000" [and
  * idCol="doc_id" and seed="42" and orderCol="score" and order="desc"]` —
  * keep at most `cap` rows per group: by the deterministic identity draw
  * (default), or the cap BEST by `orderCol` when given (see
  * [[graft.operators.sampling.GroupCap]]: verified pre-filter /
  * two-phase top-k keep the exact-window sort skew-proof at 100 TB).
  */
object GroupCapET extends NoPathET {
  override def name = "GroupCap"
  override def train(ctx: ScriptContext, df: DataFrame, path: String,
                     params: Map[String, String]): DataFrame = {
    val groupCol = params.getOrElse("groupCol",
      throw new IllegalArgumentException("GroupCap requires groupCol"))
    val cap = params.getOrElse("cap",
      throw new IllegalArgumentException("GroupCap requires cap")).toInt
    val idCol = params.getOrElse("idCol", "doc_id")
    params.get("orderCol") match {
      case Some(oc) => graft.operators.sampling.GroupCap.capPerGroupBy(
        df, groupCol, cap, oc,
        descending = params.getOrElse("order", "desc") == "desc", idCol)
      case None => graft.operators.sampling.GroupCap.capPerGroup(
        df, groupCol, cap, idCol, params.getOrElse("seed", "42").toLong)
    }
  }
}

/** `run docs as DocChunk.`` where size="512" [and overlap="64" and
  * unit="chars|tokens" and textCol="text" and idCol="chunk_id" and
  * outCol="chunk"]` — sliding-window chunking (see
  * [[graft.operators.text.DocChunk]]): shuffle-free per-row generate;
  * `unit="tokens"` windows over the whitespace-token stream instead of
  * characters.
  */
object DocChunkET extends NoPathET {
  override def name = "DocChunk"
  override def train(ctx: ScriptContext, df: DataFrame, path: String,
                     params: Map[String, String]): DataFrame = {
    val size = params.getOrElse("size",
      throw new IllegalArgumentException("DocChunk requires size=\"N\"")).toInt
    val overlap = params.getOrElse("overlap", "0").toInt
    val textCol = params.getOrElse("textCol", "text")
    val idCol = params.getOrElse("idCol", "chunk_id")
    val outCol = params.getOrElse("outCol", "chunk")
    params.getOrElse("unit", "chars") match {
      case "chars" => graft.operators.text.DocChunk.chunkByChars(
        df, textCol, size, overlap, idCol, outCol)
      case "tokens" => graft.operators.text.DocChunk.chunkByTokens(
        df, textCol, size, overlap, idCol, outCol)
      case "sentences" => graft.operators.text.DocChunk.chunkBySentences(
        df, params.getOrElse("docIdCol", "doc_id"), textCol, size, idCol, outCol)
      case other => throw new IllegalArgumentException(
        s"DocChunk unit must be chars|tokens|sentences, got '$other'")
    }
  }
}

/** `run train as Decontaminate.`` where evalTable="benchmarks" [and
  * mode="clean|flag|fuzzy|bloom" and idCol="doc_id" and textCol="text" and
  * ngram="8" and minOverlap="1" and threshold="0.5" and fpp="0.01"]` —
  * drop (`clean`, default) or list (`flag`) train docs sharing n-gram
  * shingles with the eval/benchmark table; `fuzzy` lists per-(train, eval)
  * pairs whose containment |train ∩ eval| / |eval| reaches `threshold`;
  * `bloom` is `flag` via a broadcast Bloom-filter prefilter + exact
  * confirm join — identical output, for eval suites past exact-broadcast
  * size (see [[graft.operators.dedup.Decontaminate]]; the eval side is
  * broadcast, the corpus never shuffles).
  */
object DecontaminateET extends NoPathET {
  override def name = "Decontaminate"
  override def train(ctx: ScriptContext, df: DataFrame, path: String,
                     params: Map[String, String]): DataFrame = {
    val eval = ctx.spark.table(params.getOrElse("evalTable",
      throw new IllegalArgumentException("Decontaminate requires evalTable")))
    val idCol = params.getOrElse("idCol", "doc_id")
    val textCol = params.getOrElse("textCol", "text")
    val n = params.getOrElse("ngram", "8").toInt
    val minOverlap = params.getOrElse("minOverlap", "1").toInt
    params.getOrElse("mode", "clean") match {
      case "clean" => graft.operators.dedup.Decontaminate.clean(df, eval, idCol, textCol, n, minOverlap)
      case "flag"  => graft.operators.dedup.Decontaminate.overlap(df, eval, idCol, textCol, n, minOverlap)
      case "fuzzy" => graft.operators.dedup.Decontaminate.containment(df, eval, idCol, textCol, n,
        params.getOrElse("threshold", "0.5").toDouble)
      case "bloom" => graft.operators.dedup.Decontaminate.overlapBloom(df, eval, idCol, textCol, n,
        minOverlap, params.getOrElse("fpp", "0.01").toDouble)
      case other => throw new IllegalArgumentException(
        s"Decontaminate mode must be clean|flag|fuzzy|bloom, got '$other'")
    }
  }
}

/** `run raw as ImportanceSelect.`` where targetTable="reference_docs" [and
  * mode="select|score|sample" and k="1000" and idCol="doc_id" and
  * textCol="text" and buckets="8192" and alpha="1.0" and seed="42" and
  * temperature="1.0" and hash="fast|portable"]` — DSIR importance-weighted
  * data selection (see
  * [[graft.operators.sampling.ImportanceSelect]]): score raw docs by
  * hashed-n-gram log importance weight against the target table; `select`
  * keeps the top-k, `sample` Gumbel-resamples k ∝ weight, `score` returns
  * every doc's weight. Scoring is a zero-shuffle map pass.
  */
object ImportanceSelectET extends NoPathET {
  override def name = "ImportanceSelect"
  override def train(ctx: ScriptContext, df: DataFrame, path: String,
                     params: Map[String, String]): DataFrame = {
    val target = ctx.spark.table(params.getOrElse("targetTable",
      throw new IllegalArgumentException("ImportanceSelect requires targetTable")))
    val idCol = params.getOrElse("idCol", "doc_id")
    val textCol = params.getOrElse("textCol", "text")
    val buckets = params.getOrElse("buckets", "8192").toInt
    val alpha = params.getOrElse("alpha", "1.0").toDouble
    val portable = params.getOrElse("hash", "fast") match {
      case "fast" => false
      case "portable" => true
      case other => throw new IllegalArgumentException(
        s"ImportanceSelect hash must be fast|portable, got '$other'")
    }
    def k = params.getOrElse("k",
      throw new IllegalArgumentException("ImportanceSelect select/sample requires k")).toInt
    import graft.operators.sampling.ImportanceSelect
    val minPar = params.getOrElse("minParallelism", "0").toInt
    params.getOrElse("mode", "select") match {
      case "select" => ImportanceSelect.select(df, target, idCol, textCol, k,
        buckets, alpha, portable, minPar)
      case "sample" => ImportanceSelect.gumbelSelect(df, target, idCol, textCol, k,
        params.getOrElse("seed", "42").toLong,
        params.getOrElse("temperature", "1.0").toDouble, buckets, alpha, portable, minPar)
      case "score" =>
        // hoist the hatch ABOVE the fit too (select/sample do this inside
        // the operator): the fit's raw-side explode is the same
        // single-split-bound projection the hatch exists for
        val hatched = graft.operators.scale.Parallelism.ensure(df, minPar)
        ImportanceSelect.score(hatched, idCol, textCol,
          ImportanceSelect.fitLogRatios(target, hatched, textCol, buckets, alpha, portable),
          buckets, portable)
      case other => throw new IllegalArgumentException(
        s"ImportanceSelect mode must be select|score|sample, got '$other'")
    }
  }
}

/** `run embs as ClusterSample.`` where centroidsTable="cents" and m="100"
  * [and mode="central|spread|assign" and idCol="vec_id" and
  * vecCol="embedding" and cidCol="cid" and cvecCol="cv"]` —
  * cluster-balanced diversity sampling (see
  * [[graft.operators.sampling.ClusterSample]]): zero-shuffle
  * nearest-centroid assignment + skew-proof per-cluster quota.
  * `mode="assign"` returns every row with its (cluster, sim) instead of
  * sampling; `mode="centroids"` returns the resolved (cid, cv) centroid
  * set itself (useful for persisting a fitted model's centers).
  */
object ClusterSampleET extends NoPathET {
  override def name = "ClusterSample"
  override def train(ctx: ScriptContext, df: DataFrame, path: String,
                     params: Map[String, String]): DataFrame = {
    // centroid source: a table of (cid, cv), OR a fitted spark.ml KMeans
    // model directory (`train t as KMeans.`p`` earlier in the script) whose
    // clusterCenters become the centroid set — closing the fit→sample loop
    // through the DSL without a hand-built centroid table.
    val cents = params.get("centroidsModel") match {
      case Some(modelPath) =>
        import ctx.spark.implicits._
        org.apache.spark.ml.clustering.KMeansModel.load(ctx.resolvePath(modelPath))
          .clusterCenters.zipWithIndex
          .map { case (c, i) => (i, c.toArray.toSeq) }.toSeq
          .toDF(params.getOrElse("cidCol", "cid"), params.getOrElse("cvecCol", "cv"))
      case None => ctx.spark.table(params.getOrElse("centroidsTable",
        throw new IllegalArgumentException(
          "ClusterSample requires centroidsTable or centroidsModel")))
    }
    val idCol = params.getOrElse("idCol", "vec_id")
    val vecCol = params.getOrElse("vecCol", "embedding")
    val cidCol = params.getOrElse("cidCol", "cid")
    val cvecCol = params.getOrElse("cvecCol", "cv")
    def m = params.getOrElse("m",
      throw new IllegalArgumentException("ClusterSample central/spread requires m")).toInt
    import graft.operators.sampling.ClusterSample
    params.getOrElse("mode", "central") match {
      case "central" => ClusterSample.balanced(df, idCol, vecCol, cents, cidCol, cvecCol, m)
      case "spread"  => ClusterSample.balanced(df, idCol, vecCol, cents, cidCol, cvecCol, m,
        central = false)
      case "assign"  => ClusterSample.assign(df, idCol, vecCol, cents, cidCol, cvecCol)
      // expose the resolved centroid set itself (one row per centroid) —
      // lets a script persist a fitted model's centers as a plain table,
      // which is the oracle boundary for KMeans-fed runs (s28): everything
      // downstream of the saved centroids is SQL-replayable
      case "centroids" => cents
      case other => throw new IllegalArgumentException(
        s"ClusterSample mode must be central|spread|assign|centroids, got '$other'")
    }
  }
}

/** `run docs as RepetitionInPlace.`` [where textCol="text" and ngram="3"
  * and maxRatio="0.2"]` — appends repeated-n-gram stats + `is_repetitive`
  * (see [[graft.operators.text.TextAnalysis.repetitionStats]]).
  */
object RepetitionInPlaceET extends NoPathET {
  override def name = "RepetitionInPlace"
  override def train(ctx: ScriptContext, df: DataFrame, path: String,
                     params: Map[String, String]): DataFrame =
    graft.operators.text.TextAnalysis.repetitionStats(df,
      params.getOrElse("textCol", "text"),
      params.getOrElse("ngram", "3").toInt,
      params.getOrElse("maxRatio", "0.2").toDouble)
}

/** `run docs as PiiScrubInPlace.`` [where textCol="text" and
  * outputCol="text_scrubbed"]` — redacts emails/phones/IPv4s into tokens
  * and appends per-category counts
  * (see [[graft.operators.text.PiiScrub]]).
  */
object PiiScrubInPlaceET extends NoPathET {
  override def name = "PiiScrubInPlace"
  override def train(ctx: ScriptContext, df: DataFrame, path: String,
                     params: Map[String, String]): DataFrame =
    graft.operators.text.PiiScrub.scrub(df,
      params.getOrElse("textCol", "text"),
      params.getOrElse("outputCol", "text_scrubbed"))
}

/** `run docs as LangId.`` [where textCol="text" and outputCol="lang_pred"]`
  * — stopword-profile language identification
  * (see [[graft.operators.text.TextAnalysis.withLangId]]).
  */
object LangIdET extends NoPathET {
  override def name = "LangId"
  override def train(ctx: ScriptContext, df: DataFrame, path: String,
                     params: Map[String, String]): DataFrame =
    graft.operators.text.TextAnalysis.withLangId(df,
      params.getOrElse("textCol", "text"),
      params.getOrElse("outputCol", "lang_pred"))
}

/** `run docs as Dedup.`` where method="exact|fingerprint|minhash|simhash"
  * and idCol="doc_id" and textCol="text" [and threshold="0.8"]` —
  * returns the SURVIVING documents (first id per duplicate group, where a
  * "group" is a CONNECTED COMPONENT of the near-dup pair graph: pairs
  * (1,2)+(2,3) form one group {1,2,3} surviving as 1, even without the
  * (1,3) edge — the greedy drop-every-b_id alternative over-deletes on
  * such chains). `keep="best"` with `scoreCol="..."` keeps each group's
  * highest-scoring member instead of its first id (quality-aware canonical
  * selection; ties break to min id). Scale notes per method are on
  * [[graft.operators.dedup.TextDedup]].
  */
object DedupET extends NoPathET {

  /** Keep the min id of each connected component of `pairs` (a_id, b_id),
    * plus every row in no pair (see
    * [[graft.operators.dedup.Components.labels]]).
    */
  private[graft] def keepComponentMin(df: DataFrame, idCol: String,
                                      pairs: DataFrame): DataFrame = {
    val losers = graft.operators.dedup.Components.labels(pairs)
      .filter(col("label") =!= col("id")).select(col("id").as(idCol))
    df.join(losers, Seq(idCol), "left_anti")
  }

  /** Keep the highest-`scoreCol` member of each connected component of
    * `pairs` (ties broken by min id), plus every row in no pair — the
    * quality-aware canonical selection of RefinedWeb/FineWeb-style
    * pipelines: inside a near-dup cluster, keep the best document, not an
    * arbitrary one. The argmax window runs over pair-graph members only
    * (the duplicate minority at 100 TB), never the whole corpus, and the
    * corpus-side survivor filter stays one anti-join, exactly like
    * [[keepComponentMin]].
    */
  private[graft] def keepComponentBest(df: DataFrame, idCol: String,
                                       scoreCol: String,
                                       pairs: DataFrame): DataFrame = {
    val labels = graft.operators.dedup.Components.labels(pairs)
    val scored = labels.join(
      df.select(col(idCol).as("id"), col(scoreCol).as("__score__")), Seq("id"))
    val losers = scored
      .withColumn("__rk__", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("label"))
          .orderBy(col("__score__").desc, col("id"))))
      .filter(col("__rk__") > 1).select(col("id").as(idCol))
    df.join(losers, Seq(idCol), "left_anti")
  }

  /** Dispatch on `keep`: "min" → [[keepComponentMin]], "best" →
    * [[keepComponentBest]] (requires `scoreCol`).
    */
  private def keepSurvivors(df: DataFrame, idCol: String,
                            params: Map[String, String])
                           (pairs: DataFrame): DataFrame =
    params.getOrElse("keep", "min") match {
      case "min"  => keepComponentMin(df, idCol, pairs)
      case "best" => keepComponentBest(df, idCol,
        params.getOrElse("scoreCol", throw new IllegalArgumentException(
          """keep="best" needs scoreCol""")), pairs)
      case other => throw new IllegalArgumentException(
        s"Dedup keep must be min|best, got '$other'")
    }
  override def name = "Dedup"
  override def train(ctx: ScriptContext, df: DataFrame, path: String,
                     params: Map[String, String]): DataFrame = {
    val idCol = params.getOrElse("idCol", "doc_id")
    val textCol = params.getOrElse("textCol", "text")
    // hash-equality dedup with the same keep semantics: the window key is
    // the content hash itself (no component computation needed)
    def hashKeep(h: org.apache.spark.sql.Column): DataFrame = {
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("__h__"))
      val ranked = params.getOrElse("keep", "min") match {
        case "min"  => df.withColumn("__h__", h)
          .withColumn("__rk__", row_number().over(w.orderBy(col(idCol))))
        case "best" => df.withColumn("__h__", h)
          .withColumn("__rk__", row_number().over(w.orderBy(
            col(params.getOrElse("scoreCol", throw new IllegalArgumentException(
              """keep="best" needs scoreCol"""))).desc, col(idCol))))
        case other => throw new IllegalArgumentException(
          s"Dedup keep must be min|best, got '$other'")
      }
      ranked.filter(col("__rk__") === 1).drop("__h__", "__rk__")
    }
    params.getOrElse("method", "exact") match {
      case "exact" =>
        hashKeep(md5(col(textCol)))
      case "fingerprint" =>
        hashKeep(md5(regexp_replace(lower(col(textCol)), "[^a-z0-9]", "")))
      case "minhash" =>
        val threshold = params.getOrElse("threshold", "0.8").toDouble
        val n = params.getOrElse("ngram", "3").toInt
        // cache the shingles for the pair computation: the banded self-join
        // and the exact-verify join each read them TWICE, and behind a
        // non-trivial upstream plan (e.g. a LangId stage) every re-read
        // re-runs that plan. Components.labels materializes the pair graph
        // eagerly, so by the time keepComponentMin returns, the surviving
        // lazy plan references only df + the labels — unpersist is safe.
        val sh = TextDedup.shingles(df.select(col(idCol), col(textCol)), idCol, textCol, n)
          .cache()
        try keepSurvivors(df, idCol, params)(TextDedup.minHashSelfJoin(sh, threshold))
        finally sh.unpersist()
      case "simhash" =>
        val maxHamming = params.getOrElse("maxHamming", "3").toInt
        keepSurvivors(df, idCol, params)(
          TextDedup.simHashSelfJoin(df.select(col(idCol), col(textCol)),
            idCol, textCol, maxHamming))
      case "containment" =>
        // asymmetric near-dup: a doc mostly CONTAINED in another is a
        // duplicate even when Jaccard is tiny (quote/subset trap); pair
        // on max-containment, then the usual component survivorship
        // (keep="best" with scoreCol = a length column elects the
        // superset document)
        val threshold = params.getOrElse("threshold", "0.9").toDouble
        val n = params.getOrElse("ngram", "3").toInt
        val sh = TextDedup.shingles(df.select(col(idCol), col(textCol)), idCol, textCol, n)
          .cache()
        try keepSurvivors(df, idCol, params)(
          TextDedup.containmentSelfJoin(sh, threshold,
              maxDocFreq = params.getOrElse("maxDocFreq", "500").toInt)
            .select(col("a_id"), col("b_id")))
        finally sh.unpersist()
      case "embedding" =>
        // SemDeDup-style semantic dedup: exact radius-bound IVF-blocked
        // cosine self-join above `threshold`, then keep one doc per
        // connected component — the embedding-space analog of `minhash`
        val threshold = params.getOrElse("threshold", "0.9").toDouble
        val vecCol = params.getOrElse("vecCol", "embedding")
        // centroids="path" persists/reuses the IVF cell centers so a
        // pipeline that dedups repeatedly (or a 100 TB corpus split into
        // runs) pays the clustering sample-fit once, not per call
        keepSurvivors(df, idCol, params)(
          CosineSimilarity.ivfSelfJoin(df, idCol, vecCol, threshold,
            nlist = params.getOrElse("nlist", "16").toInt,
            centroidsPath = params.get("centroids").orElse(params.get("centroidsPath")),
            fit = params.getOrElse("fit", "auto"))
            .select(col("a_id"), col("b_id")))
      case other => throw new IllegalArgumentException(
        s"Dedup method must be exact|fingerprint|minhash|simhash|containment|embedding, got '$other'")
    }
  }
}

/** `run embs as SimilarityJoin.`` where idCol="vec_id" and vecCol="embedding"
  * and threshold="0.8" [and method="lsh|exact"]` — near-duplicate pairs
  * above a cosine threshold. `lsh` is the 100 TB path (banded
  * random-hyperplane signatures); `exact` is the all-pairs baseline.
  */
object SimilarityJoinET extends NoPathET {
  override def name = "SimilarityJoin"
  override def train(ctx: ScriptContext, df: DataFrame, path: String,
                     params: Map[String, String]): DataFrame = {
    val idCol = params.getOrElse("idCol", "vec_id")
    val vecCol = params.getOrElse("vecCol", "embedding")
    val threshold = params.getOrElse("threshold", "0.8").toDouble
    params.getOrElse("method", "lsh") match {
      case "lsh" => CosineSimilarity.lshSelfJoin(df, idCol, vecCol, threshold,
        missProb = params.getOrElse("missProb", "1e-5").toDouble,
        rowsPerBand = params.getOrElse("rowsPerBand", "8").toInt,
        forceBanding = params.getOrElse("forceBanding", "false").toBoolean)
      case "exact" => CosineSimilarity.exactSelfJoin(df, idCol, vecCol, threshold)
      case "ivf" => CosineSimilarity.ivfSelfJoin(df, idCol, vecCol, threshold,
        nlist = params.getOrElse("nlist", "16").toInt,
        centroidsPath = params.get("centroidsPath"),
        fit = params.getOrElse("fit", "auto"))
      // SemDeDup posture: within-cell pairs only — linear at nlist ∝ n,
      // bounded recall (see CosineSimilarity.cellSelfJoin). fit=
      // driver|distributed|auto picks the centroid-fit strategy (auto:
      // distributed spark.ml KMeans past 64 cells — the nlist ∝ corpus
      // scale path)
      case "cells" => CosineSimilarity.cellSelfJoin(df, idCol, vecCol, threshold,
        nlist = params.getOrElse("nlist", "16").toInt,
        centroidsPath = params.get("centroidsPath"),
        fit = params.getOrElse("fit", "auto"))
      case other => throw new IllegalArgumentException(
        s"SimilarityJoin method must be lsh|exact|ivf|cells, got '$other'")
    }
  }
}

/** `run embs as AnnTopK.`` where queryTable="q" and k="5" ...` — brute-force
  * cosine top-k of a broadcast query set against the corpus table.
  */
object AnnTopKET extends NoPathET {
  override def name = "AnnTopK"
  override def train(ctx: ScriptContext, df: DataFrame, path: String,
                     params: Map[String, String]): DataFrame = {
    val idCol = params.getOrElse("idCol", "vec_id")
    val vecCol = params.getOrElse("vecCol", "embedding")
    val queries = ctx.spark.table(params.getOrElse("queryTable",
      throw new IllegalArgumentException("AnnTopK requires queryTable")))
    val k = params.getOrElse("k", "10").toInt
    val qId = params.getOrElse("qIdCol", "qid")
    val qVec = params.getOrElse("qVecCol", "qv")
    params.getOrElse("method", "brute") match {
      case "brute" => CosineSimilarity.annTopK(df, queries, idCol, vecCol, qId, qVec, k)
      case "ivf" => CosineSimilarity.ivfTopK(df, queries, idCol, vecCol, qId, qVec, k,
        nlist = params.getOrElse("nlist", "64").toInt,
        nprobe = params.getOrElse("nprobe", "8").toInt,
        centroidsPath = params.get("centroidsPath"))
      case "pq" =>
        // product-quantized scan + exact re-rank (see ProductQuantization):
        // the 100 TB memory path — m bytes per corpus vector
        import graft.operators.similarity.ProductQuantization
        val model = ProductQuantization.fitOrLoad(df, vecCol,
          m = params.getOrElse("m", "8").toInt,
          k = params.getOrElse("pqK", "256").toInt,
          modelPath = params.get("modelPath"))
        ProductQuantization.topK(df, queries, idCol, vecCol, qId, qVec, k, model,
          rerank = params.getOrElse("rerank", "64").toInt)
      case "sign" =>
        // 1-bit sign sketch + exact re-rank (see SignHash): the smallest
        // index memory on the quantization ladder; dims sizes the sketch
        // (ceil(dims/32) words — wider embeddings pack fully)
        graft.operators.similarity.SignHash.topK(df, queries, idCol, vecCol,
          qId, qVec, k, rerank = params.getOrElse("rerank", "32").toInt,
          dims = params.getOrElse("dims", "64").toInt)
      case other => throw new IllegalArgumentException(
        s"AnnTopK method must be brute|ivf|pq|sign, got '$other'")
    }
  }
}

/** `run bins as BinaryMetaInPlace.`` [where binaryCol="content" and
  * embed="64"]` — attach the multimodal metadata struct (format sniff +
  * REAL image header decode: true width/height for png/jpeg/bmp/gif,
  * null for media with no JDK codec); `embed=dim` also attaches the
  * `embedding` column — a real tiny-image descriptor for decodable
  * images, the documented synthetic byte fallback otherwise, flagged
  * per-row by `embedding_synthetic` — bridging binary media into the
  * Dedup/AnnTopK/SimilarityJoin stack.
  */
object BinaryMetaInPlaceET extends NoPathET {
  override def name = "BinaryMetaInPlace"
  override def train(ctx: ScriptContext, df: DataFrame, path: String,
                     params: Map[String, String]): DataFrame = {
    graft.operators.multimodal.Multimodal.register(ctx.spark)
    val binaryCol = params.getOrElse("binaryCol", "content")
    val withMeta = graft.operators.multimodal.Multimodal
      .withImageMeta(df, binaryCol)
    params.get("embed").map(_.toInt) match {
      // embedBatch="64" routes through the batch-shaped featurizer (the
      // mapInPandas execution shape a real encoder needs); values are
      // identical to the scalar path by construction
      case Some(dim) if params.contains("embedBatch") =>
        graft.operators.multimodal.Multimodal.withEmbeddingBatched(
          withMeta, binaryCol, dim, params("embedBatch").toInt)
      case Some(dim) => graft.operators.multimodal.Multimodal
        .withEmbedding(withMeta, binaryCol, dim)
      case None => withMeta
    }
  }
}

/** `run imgs as ImageDedup.`` [where idCol="path" and binaryCol="content"
  * and maxHamming="6" and method="dhash|ahash" and mode="pairs|hashes"
  * and maxChunkFreq="0" and hashCol="img_hash"]` — perceptual-hash image
  * near-dedup over REAL JDK decode (see
  * [[graft.operators.multimodal.ImageDedup]]): dHash/aHash per image,
  * pigeonhole-banded Hamming equi-join, exact verify. `mode="hashes"`
  * emits the (id, img_hash) stamp — the persisted oracle boundary p124
  * replays from; `mode="pairs_from_hashes"` re-runs only the join half on
  * an already-hashed table (idCol/hashCol name its columns);
  * `mode="screen"` / `mode="screen_from_hashes"` run the feed-vs-catalog
  * shape (the input is the feed, `catalogTable` names the persisted
  * stamp, catalogIdCol/catalogHashCol its columns) — work linear in the
  * feed, the catalog-side maxChunkFreq cap owns the skew guard.
  */
object ImageDedupET extends NoPathET {
  override def name = "ImageDedup"
  override def train(ctx: ScriptContext, df: DataFrame, path: String,
                     params: Map[String, String]): DataFrame = {
    val idCol = params.getOrElse("idCol", "path")
    val binaryCol = params.getOrElse("binaryCol", "content")
    val maxHamming = params.getOrElse("maxHamming", "6").toInt
    val method = params.getOrElse("method", "dhash")
    val maxChunkFreq = params.getOrElse("maxChunkFreq", "0").toLong
    // two-chunk banding for corpus-scale joins (see ImageDedup scaladoc)
    val pairBands = params.getOrElse("pairBands", "false").toBoolean
    params.getOrElse("mode", "pairs") match {
      case "pairs" => graft.operators.multimodal.ImageDedup.selfJoin(
        df, idCol, binaryCol, maxHamming, method, maxChunkFreq, pairBands)
      case "hashes" => graft.operators.multimodal.ImageDedup.hashes(
        df, idCol, binaryCol, method)
      case "pairs_from_hashes" =>
        graft.operators.multimodal.ImageDedup.selfJoinFromHashes(
          df, idCol, params.getOrElse("hashCol", "img_hash"),
          maxHamming, maxChunkFreq, pairBands)
      // feed-vs-catalog screen (the production dedup shape): the input is
      // the FEED (binary for "screen", already-hashed for
      // "screen_from_hashes"), catalogTable names the persisted stamp
      case m @ ("screen" | "screen_from_hashes") =>
        val cat = ctx.spark.table(params.getOrElse("catalogTable",
          throw new IllegalArgumentException(
            "ImageDedup screen modes require catalogTable")))
        val feedHashed =
          if (m == "screen")
            graft.operators.multimodal.ImageDedup.hashes(df, idCol, binaryCol, method)
          else df.select(col(idCol).as("id"),
            col(params.getOrElse("hashCol", "img_hash")).as("img_hash"))
        graft.operators.multimodal.ImageDedup.joinAgainst(
          feedHashed, "id", "img_hash",
          cat, params.getOrElse("catalogIdCol", "id"),
          params.getOrElse("catalogHashCol", "img_hash"),
          maxHamming, maxChunkFreq)
      case other => throw new IllegalArgumentException(
        s"ImageDedup mode must be pairs|hashes|pairs_from_hashes|screen|" +
          s"screen_from_hashes, got '$other'")
    }
  }
}

/** `run clips as AudioFeatures.`` [where binaryCol="content" and
  * hash="true"]` — REAL WAV/PCM decode on the bare JDK (see
  * [[graft.operators.multimodal.AudioCodec]]): sample_rate / channels /
  * bits / n_frames / duration_ms from the RIFF header, exact-integer
  * rms / peak / zero_crossings from the PCM, and (hash="true") the
  * 64-bit energy-envelope fingerprint `audio_hash` that feeds the same
  * banded Hamming dedup as images. Non-WAV rows keep their columns null.
  */
object AudioFeaturesET extends NoPathET {
  override def name = "AudioFeatures"
  override def train(ctx: ScriptContext, df: DataFrame, path: String,
                     params: Map[String, String]): DataFrame = {
    graft.operators.multimodal.Multimodal.register(ctx.spark)
    val b = params.getOrElse("binaryCol", "content")
    val base = df
      .withColumn("audio_meta", org.apache.spark.sql.functions.expr(s"mm_wav_meta($b)"))
      .withColumn("audio_features",
        org.apache.spark.sql.functions.expr(s"mm_audio_features($b)"))
    if (params.getOrElse("hash", "false").toBoolean)
      base.withColumn("audio_hash",
        org.apache.spark.sql.functions.expr(s"mm_audio_hash($b)"))
    else base
  }
}

/** `run clips as VideoDedup.`` [where idCol="path" and
  * binaryCol="content" and maxFrames="16" and maxHamming="6" and
  * minOverlap="0.5" and maxChunkFreq="0" and mode="pairs|frame_hashes|
  * pairs_from_hashes"]` — video near-dup from REAL frame decode
  * (MJPEG-AVI / animated GIF, see
  * [[graft.operators.multimodal.VideoCodec]]): up to maxFrames evenly
  * sampled frames per clip, a dHash per frame, banded Hamming FRAME join,
  * bidirectional-containment score per video pair
  * ([[graft.operators.multimodal.VideoDedup]]). `mode="frame_hashes"`
  * emits the (id, frame_idx, frame_hash) stamp — the persisted oracle
  * boundary p132 replays from; `mode="pairs_from_hashes"` re-runs only
  * the join+score half on an already-hashed table;
  * `mode="screen_from_hashes"` runs the feed-vs-catalog ingest screen
  * (input = feed hash table, `catalogTable` names the persisted corpus
  * stamp — see [[graft.operators.multimodal.VideoScreen]]);
  * `pairBands="true"` switches the self-join modes to two-chunk
  * banding for corpus scale.
  */
object VideoDedupET extends NoPathET {
  override def name = "VideoDedup"
  override def train(ctx: ScriptContext, df: DataFrame, path: String,
                     params: Map[String, String]): DataFrame = {
    val idCol = params.getOrElse("idCol", "path")
    val binaryCol = params.getOrElse("binaryCol", "content")
    val maxFrames = params.getOrElse("maxFrames", "16").toInt
    val maxHamming = params.getOrElse("maxHamming", "6").toInt
    val minOverlap = params.getOrElse("minOverlap", "0.5").toDouble
    val maxChunkFreq = params.getOrElse("maxChunkFreq", "0").toLong
    val pairBands = params.getOrElse("pairBands", "false").toBoolean
    params.getOrElse("mode", "pairs") match {
      case "pairs" => graft.operators.multimodal.VideoDedup.selfJoin(
        df, idCol, binaryCol, maxFrames, maxHamming, minOverlap, maxChunkFreq,
        pairBands)
      case "frame_hashes" => graft.operators.multimodal.VideoDedup.frameHashes(
        df, idCol, binaryCol, maxFrames)
      case "pairs_from_hashes" =>
        graft.operators.multimodal.VideoDedup.selfJoinFromHashes(
          df, idCol, params.getOrElse("idxCol", "frame_idx"),
          params.getOrElse("hashCol", "frame_hash"),
          maxHamming, minOverlap, maxChunkFreq, pairBands)
      // feed-vs-catalog video screen: input is the FEED frame-hash table,
      // catalogTable names the persisted corpus stamp
      case "screen_from_hashes" =>
        val cat = ctx.spark.table(params.getOrElse("catalogTable",
          throw new IllegalArgumentException(
            "VideoDedup screen_from_hashes requires catalogTable")))
        graft.operators.multimodal.VideoScreen.screenFromHashes(
          df, idCol, params.getOrElse("idxCol", "frame_idx"),
          params.getOrElse("hashCol", "frame_hash"),
          cat, params.getOrElse("catalogIdCol", "id"),
          params.getOrElse("catalogIdxCol", "frame_idx"),
          params.getOrElse("catalogHashCol", "frame_hash"),
          maxHamming, minOverlap, maxChunkFreq)
      case other => throw new IllegalArgumentException(
        s"VideoDedup mode must be pairs|frame_hashes|pairs_from_hashes|" +
          s"screen_from_hashes, got '$other'")
    }
  }
}

/** `run clips as VideoScenes.`` [where idCol="path" and
  * binaryCol="content" and maxFrames="16" and cutThreshold="16" and
  * mode="detect|from_hashes"]` — shot-cut detection from perceptual
  * frame-hash deltas (see [[graft.operators.multimodal.VideoScenes]]):
  * a frame whose dHash jumps more than cutThreshold Hamming bits from
  * the previous sampled frame opens a new scene; one entity-keyed window
  * pass. `mode="from_hashes"` replays on an already-hashed
  * (idCol, idxCol, hashCol) stamp.
  */
object VideoScenesET extends NoPathET {
  override def name = "VideoScenes"
  override def train(ctx: ScriptContext, df: DataFrame, path: String,
                     params: Map[String, String]): DataFrame = {
    val cutThreshold = params.getOrElse("cutThreshold", "16").toInt
    params.getOrElse("mode", "detect") match {
      case "detect" => graft.operators.multimodal.VideoScenes.detect(
        df, params.getOrElse("idCol", "path"),
        params.getOrElse("binaryCol", "content"),
        maxFrames = params.getOrElse("maxFrames", "16").toInt,
        cutThreshold = cutThreshold)
      case "from_hashes" => graft.operators.multimodal.VideoScenes.fromHashes(
        df, params.getOrElse("idCol", "id"),
        params.getOrElse("idxCol", "frame_idx"),
        params.getOrElse("hashCol", "frame_hash"), cutThreshold)
      case other => throw new IllegalArgumentException(
        s"VideoScenes mode must be detect|from_hashes, got '$other'")
    }
  }
}

/** `run dirty as FuzzyLinkage.`` where rightTable="clean" and
  * leftIdCol="id" and leftStrCol="name" [and rightIdCol/rightStrCol,
  * maxDist="2", q="3", maxGramFreq="0"]` — q-gram-blocked exact
  * edit-distance record linkage (see [[graft.operators.text
  * .EditLinkage]]). Self-linkage: point rightTable at the input's own
  * view name and filter `l_id < r_id` downstream; pass capBoth="true"
  * there so a maxGramFreq cap guards BOTH growing sides (feed-vs-catalog
  * keeps the right-only cap: linear work in the feed, no recall decay
  * with feed growth).
  */
object FuzzyLinkageET extends NoPathET {
  override def name = "FuzzyLinkage"
  override def train(ctx: ScriptContext, df: DataFrame, path: String,
                     params: Map[String, String]): DataFrame = {
    val right = ctx.spark.table(params.getOrElse("rightTable",
      throw new IllegalArgumentException("FuzzyLinkage requires rightTable")))
    val lId = params.getOrElse("leftIdCol", "id")
    val lStr = params.getOrElse("leftStrCol", "name")
    val rId = params.getOrElse("rightIdCol", lId)
    val rStr = params.getOrElse("rightStrCol", lStr)
    val q = params.getOrElse("q", "3").toInt
    val cap = params.getOrElse("maxGramFreq", "0").toLong
    val capBoth = params.getOrElse("capBoth", "false").toBoolean
    params.getOrElse("mode", "edit") match {
      case "edit" => graft.operators.text.EditLinkage.fuzzyJoin(
        df, lId, lStr, right, rId, rStr,
        maxDist = params.getOrElse("maxDist", "2").toInt,
        q = q, maxGramFreq = cap, capBoth = capBoth)
      // best Jaro-Winkler match per left record (mode="jw")
      case "jw" => graft.operators.text.EditLinkage.jwBestMatch(
        df, lId, lStr, right, rId, rStr,
        minSim = params.getOrElse("minSim", "0.9").toDouble,
        q = q, bandSlack = params.getOrElse("bandSlack", "8").toInt,
        maxGramFreq = cap, capBoth = capBoth)
      case other => throw new IllegalArgumentException(
        s"FuzzyLinkage mode must be edit|jw, got '$other'")
    }
  }
}

/** `run edges as KCore.`` where srcCol="a" and dstCol="b" and k="3"
  * [and maxIter="30" and localFinishEdges="200000"]` — k-core membership
  * + within-core degrees by synchronous peeling (see
  * [[graft.operators.graph.KCore]]); localFinishEdges="0" forces pure
  * distributed peeling with no driver tail-finish.
  */
object KCoreET extends NoPathET {
  override def name = "KCore"
  override def train(ctx: ScriptContext, df: DataFrame, path: String,
                     params: Map[String, String]): DataFrame =
    graft.operators.graph.KCore.run(df,
      params.getOrElse("srcCol", "a"), params.getOrElse("dstCol", "b"),
      k = params.getOrElse("k", "2").toInt,
      maxIter = params.getOrElse("maxIter", "30").toInt,
      localFinishEdges = params.getOrElse("localFinishEdges", "200000").toLong)
}

/** `run edges as HarmonicCentrality.`` where srcCol="a" and dstCol="b"
  * and seedTable="seeds" and seedCol="node" and maxHops="4"
  * [and undirected="true"]` — sampled harmonic centrality in exact
  * integer fixed-point (see
  * [[graft.operators.graph.Bfs.harmonicCentrality]]).
  */
object HarmonicCentralityET extends NoPathET {
  override def name = "HarmonicCentrality"
  override def train(ctx: ScriptContext, df: DataFrame, path: String,
                     params: Map[String, String]): DataFrame = {
    val seeds = ctx.spark.table(params.getOrElse("seedTable",
      throw new IllegalArgumentException("HarmonicCentrality requires seedTable")))
    graft.operators.graph.Bfs.harmonicCentrality(df,
      params.getOrElse("srcCol", "a"), params.getOrElse("dstCol", "b"),
      seeds, params.getOrElse("seedCol", "node"),
      maxHops = params.getOrElse("maxHops", "6").toInt,
      undirected = params.getOrElse("undirected", "false").toBoolean)
  }
}

/** `run edges as Coreness.`` where srcCol="a" and dstCol="b" and
  * maxK="8" [and maxIterPerLevel="50" and localFinishEdges="200000"]` —
  * full k-core decomposition clamped at maxK, or run-to-empty true core
  * numbers with maxK="0" (see [[graft.operators.graph.KCore.coreness]]);
  * localFinishEdges="0" forces pure distributed peeling.
  */
/** `run edges as NeighborhoodFunction.`` [where srcCol="a" and dstCol="b"
  * and maxHops="6" and lgK="12" and undirected="false" and
  * mode="nf|centrality"]` — HyperBall-lite per-node neighborhood
  * function / geometric centralities over HLL sketches (see
  * [[graft.operators.graph.NeighborhoodFunction]]): the all-node
  * closeness/harmonic regime with node-sized state. `mode="nf"` emits
  * the (node, hop, nf_est) stamp — the persisted oracle boundary p127
  * replays centralities from.
  */
object NeighborhoodFunctionET extends NoPathET {
  override def name = "NeighborhoodFunction"
  override def train(ctx: ScriptContext, df: DataFrame, path: String,
                     params: Map[String, String]): DataFrame = {
    val nf = graft.operators.graph.NeighborhoodFunction.run(df,
      params.getOrElse("srcCol", "a"), params.getOrElse("dstCol", "b"),
      maxHops = params.getOrElse("maxHops", "6").toInt,
      lgK = params.getOrElse("lgK", "12").toInt,
      undirected = params.getOrElse("undirected", "false").toBoolean)
    params.getOrElse("mode", "centrality") match {
      case "nf" => nf
      case "centrality" => graft.operators.graph.NeighborhoodFunction.centrality(nf)
      case other => throw new IllegalArgumentException(
        s"NeighborhoodFunction mode must be nf|centrality, got '$other'")
    }
  }
}

object CorenessET extends NoPathET {
  override def name = "Coreness"
  override def train(ctx: ScriptContext, df: DataFrame, path: String,
                     params: Map[String, String]): DataFrame =
    graft.operators.graph.KCore.coreness(df,
      params.getOrElse("srcCol", "a"), params.getOrElse("dstCol", "b"),
      maxK = params.getOrElse("maxK", "8").toInt,
      maxIterPerLevel = params.getOrElse("maxIterPerLevel", "50").toInt,
      localFinishEdges = params.getOrElse("localFinishEdges", "200000").toLong)
}

/** `run edges as BfsHops.`` where srcCol="a" and dstCol="b" and
  * seedTable="seeds" and seedCol="node" and maxHops="4"
  * [and undirected="true"]` — multi-source BFS hop distances (see
  * [[graft.operators.graph.Bfs]]).
  */
object BfsHopsET extends NoPathET {
  override def name = "BfsHops"
  override def train(ctx: ScriptContext, df: DataFrame, path: String,
                     params: Map[String, String]): DataFrame = {
    val seeds = ctx.spark.table(params.getOrElse("seedTable",
      throw new IllegalArgumentException("BfsHops requires seedTable")))
    graft.operators.graph.Bfs.hopDistance(df,
      params.getOrElse("srcCol", "a"), params.getOrElse("dstCol", "b"),
      seeds, params.getOrElse("seedCol", "node"),
      maxHops = params.getOrElse("maxHops", "6").toInt,
      undirected = params.getOrElse("undirected", "false").toBoolean)
  }
}

/** `run edges as TrustRank.`` where srcCol="src" and dstCol="dst" and
  * seedTable="trusted" and seedCol="node" [and iterations="5"]` —
  * personalized PageRank from a trusted seed set in exact fixed-point
  * (see [[graft.operators.graph.TrustRank]]).
  */
object TrustRankET extends NoPathET {
  override def name = "TrustRank"
  override def train(ctx: ScriptContext, df: DataFrame, path: String,
                     params: Map[String, String]): DataFrame = {
    val seeds = ctx.spark.table(params.getOrElse("seedTable",
      throw new IllegalArgumentException("TrustRank requires seedTable")))
    graft.operators.graph.TrustRank.run(df,
      params.getOrElse("srcCol", "src"), params.getOrElse("dstCol", "dst"),
      seeds, params.getOrElse("seedCol", "node"),
      iterations = params.getOrElse("iterations", "5").toInt)
  }
}

/** `run edges as Sssp.`` where srcCol="a" and dstCol="b" and
  * weightCol="w" and seedTable="seeds" and seedCol="node"
  * [and maxIter="30" and undirected="false"]` — multi-source weighted
  * shortest paths in exact integer arithmetic (see
  * [[graft.operators.graph.Sssp]]).
  */
object SsspET extends NoPathET {
  override def name = "Sssp"
  override def train(ctx: ScriptContext, df: DataFrame, path: String,
                     params: Map[String, String]): DataFrame = {
    val seeds = ctx.spark.table(params.getOrElse("seedTable",
      throw new IllegalArgumentException("Sssp requires seedTable")))
    graft.operators.graph.Sssp.run(df,
      params.getOrElse("srcCol", "a"), params.getOrElse("dstCol", "b"),
      params.getOrElse("weightCol", "w"),
      seeds, params.getOrElse("seedCol", "node"),
      maxIter = params.getOrElse("maxIter", "30").toInt,
      undirected = params.getOrElse("undirected", "false").toBoolean)
  }
}

/** `run memberships as CooccurEdges.`` where basketCol="bk" and
  * itemCol="i" [and minCount="1" and maxBasketSize="0" and pmi="false"]`
  * — weighted co-occurrence edges with a deterministic hot-basket
  * truncation cap; pmi="true" appends pointwise mutual information
  * (see [[graft.operators.graph.CooccurEdges]]).
  */
object CooccurEdgesET extends NoPathET {
  override def name = "CooccurEdges"
  override def train(ctx: ScriptContext, df: DataFrame, path: String,
                     params: Map[String, String]): DataFrame = {
    val bk = params.getOrElse("basketCol", "bk")
    val i = params.getOrElse("itemCol", "i")
    val minCount = params.getOrElse("minCount", "1").toLong
    val cap = params.getOrElse("maxBasketSize", "0").toInt
    if (params.getOrElse("pmi", "false").toBoolean)
      graft.operators.graph.CooccurEdges.edgesWithPmi(df, bk, i, minCount, cap)
    else
      graft.operators.graph.CooccurEdges.edges(df, bk, i, minCount, cap)
  }
}

/** `run registry as EntityResolve.`` where idCol="id" and strCol="name"
  * and maxDist="2" [and q="3" and maxGramFreq="0"]` — fuzzy self-linkage
  * -> connected components -> min-id golden record (see
  * [[graft.operators.text.EntityResolve]]).
  *
  * `survivorship="best"` elects the golden record by quality instead:
  * requires `scoreCol`; optional `merge="field:strategy,..."`
  * (longest|majority|latest|max|min) builds field-level merges
  * (`latest` needs `recencyCol`). With `entityCol` set, the input is
  * treated as ALREADY labeled and only the election/merge runs — the
  * re-scoring iteration path that skips the expensive matching stage.
  */
object EntityResolveET extends NoPathET {
  override def name = "EntityResolve"
  override def train(ctx: ScriptContext, df: DataFrame, path: String,
                     params: Map[String, String]): DataFrame = {
    val idCol = params.getOrElse("idCol", "id")
    val strCol = params.getOrElse("strCol", "name")
    val maxDist = params.getOrElse("maxDist", "2").toInt
    val q = params.getOrElse("q", "3").toInt
    val cap = params.getOrElse("maxGramFreq", "0").toLong
    params.getOrElse("survivorship", "min") match {
      case "min" =>
        graft.operators.text.EntityResolve.resolve(df, idCol, strCol,
          maxDist = maxDist, q = q, maxGramFreq = cap)
      case "best" =>
        val merges = params.get("merge").toSeq.flatMap(_.split(',')).map { kv =>
          kv.split(':') match {
            case Array(f, strat) => (f.trim, strat.trim)
            case _ => throw new IllegalArgumentException(
              s"merge entries must be field:strategy, got '$kv'")
          }
        }
        val score = params.getOrElse("scoreCol", throw new IllegalArgumentException(
          """survivorship="best" needs scoreCol"""))
        params.get("entityCol") match {
          case Some(ent) =>
            graft.operators.text.EntityResolve.electGolden(df, idCol, strCol,
              score, ent, mergeFields = merges,
              recencyCol = params.getOrElse("recencyCol", ""))
          case None =>
            graft.operators.text.EntityResolve.resolveBest(df, idCol, strCol,
              score, maxDist = maxDist, q = q, maxGramFreq = cap,
              mergeFields = merges,
              recencyCol = params.getOrElse("recencyCol", ""))
        }
      case other => throw new IllegalArgumentException(
        s"survivorship must be min|best, got '$other'")
    }
  }
}

/** `run docs as Blocklist.`` where termTable="banned" [and idCol="doc_id"
  * and textCol="text" and termCol="term" and maxFrac="0.05"]` —
  * table-driven banned-term screen (see
  * [[graft.operators.text.QualityRules.blocklist]]).
  */
object BlocklistET extends NoPathET {
  override def name = "Blocklist"
  override def train(ctx: ScriptContext, df: DataFrame, path: String,
                     params: Map[String, String]): DataFrame = {
    val terms = ctx.spark.table(params.getOrElse("termTable",
      throw new IllegalArgumentException("Blocklist requires termTable")))
    graft.operators.text.QualityRules.blocklist(df,
      params.getOrElse("idCol", "doc_id"), params.getOrElse("textCol", "text"),
      terms, params.getOrElse("termCol", "term"),
      maxFrac = params.getOrElse("maxFrac", "0.05").toDouble)
  }
}

/** `run left as AsOfJoin.`` where rightTable="quotes" and keyCols="k" and
  * leftTime="t" and rightTime="t" and payload="px,qty"
  * [and direction="backward|forward|nearest" and tolerance="INTERVAL 1 DAY"]`
  * — as-of join with pandas merge_asof's parameter set (see
  * [[graft.operators.temporal.AsOfJoin]]).
  */
object AsOfJoinET extends NoPathET {
  override def name = "AsOfJoin"
  override def train(ctx: ScriptContext, df: DataFrame, path: String,
                     params: Map[String, String]): DataFrame = {
    val right = ctx.spark.table(params.getOrElse("rightTable",
      throw new IllegalArgumentException("AsOfJoin requires rightTable")))
    graft.operators.temporal.AsOfJoin.join(df, right,
      params.getOrElse("keyCols",
        throw new IllegalArgumentException("AsOfJoin requires keyCols"))
        .split(",").map(_.trim).toSeq,
      params.getOrElse("leftTime", "ts"), params.getOrElse("rightTime", "ts"),
      params.getOrElse("payload",
        throw new IllegalArgumentException("AsOfJoin requires payload"))
        .split(",").map(_.trim).toSeq,
      direction = params.getOrElse("direction", "backward"),
      tolerance = params.get("tolerance"))
  }
}

/** `run embs as RandomProjection.`` where vecCol="embedding" and
  * inDim="64" and outDim="16" [and outCol="proj" and seed="7"]` —
  * deterministic Achlioptas ±1/√k JL reduction (see
  * [[graft.operators.similarity.RandomProjection]]).
  */
object RandomProjectionET extends NoPathET {
  override def name = "RandomProjection"
  override def train(ctx: ScriptContext, df: DataFrame, path: String,
                     params: Map[String, String]): DataFrame =
    graft.operators.similarity.RandomProjection.project(df,
      params.getOrElse("vecCol", "embedding"),
      params.getOrElse("outCol", "proj"),
      inDim = params.getOrElse("inDim",
        throw new IllegalArgumentException("RandomProjection requires inDim")).toInt,
      outDim = params.getOrElse("outDim",
        throw new IllegalArgumentException("RandomProjection requires outDim")).toInt,
      seed = params.getOrElse("seed", "7").toLong)
}
