package graft.operators.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column handling over opaque `binary`
  * columns (builder-prompt north star; the reference's closest surface is
  * `binaryFile`/`unStructured` ingestion, MLSQLBinaryFile.scala /
  * MLSQLUnStructured.scala).
  *
  * Real parts: binaryFile ingestion (Spark's `binaryFile` source), format
  * sniffing from magic bytes, content hashing, byte-level frame sampling —
  * all per-row, partition-parallel, no driver collects, schema'd as a typed
  * metadata struct.
  *
  * STUB parts (this container has no image/audio codecs): pixel decode is a
  * DETERMINISTIC FAKE — `decodeImageMeta` fabricates width/height from the
  * content hash. Swap `fakeDims` for a real codec (e.g. javax.imageio /
  * ffmpeg via mapPartitions) in production; every other column is real.
  */
object Multimodal {

  /** Magic-byte container sniffing — real logic, no codec needed. */
  def sniffFormat(bytes: Array[Byte]): String = {
    def at(i: Int): Int = if (i < bytes.length) bytes(i) & 0xff else -1
    if (at(0) == 0x89 && at(1) == 'P' && at(2) == 'N' && at(3) == 'G') "png"
    else if (at(0) == 0xff && at(1) == 0xd8 && at(2) == 0xff) "jpeg"
    else if (at(0) == 'G' && at(1) == 'I' && at(2) == 'F' && at(3) == '8') "gif"
    else if (at(0) == 'B' && at(1) == 'M') "bmp"
    else if (at(0) == 'R' && at(1) == 'I' && at(2) == 'F' && at(3) == 'F' &&
      at(8) == 'W' && at(9) == 'A' && at(10) == 'V' && at(11) == 'E') "wav"
    else if (at(4) == 'f' && at(5) == 't' && at(6) == 'y' && at(7) == 'p') "mp4"
    else if (at(0) == 'I' && at(1) == 'D' && at(2) == '3') "mp3"
    else "unknown"
  }

  /** STUB pixel decode: deterministic fake dimensions from a content hash
    * (stands in for a real codec; see object scaladoc).
    */
  private def fakeDims(bytes: Array[Byte]): (Int, Int) = {
    var h = 1125899906842597L
    var i = 0
    while (i < math.min(bytes.length, 256)) { h = 31 * h + bytes(i); i += 1 }
    val w = 64 + math.floorMod(h, 1920L).toInt
    val ht = 64 + math.floorMod(h >> 17, 1080L).toInt
    (w, ht)
  }

  def register(spark: SparkSession): Unit = {
    if (spark.conf.getOption("spark.graft.multimodal.registered").contains("true")) return
    spark.udf.register("mm_sniff_format", (b: Array[Byte]) => sniffFormat(b))
    spark.udf.register("mm_decode_image_meta", (b: Array[Byte]) => {
      val (w, h) = fakeDims(b) // STUB decode — see scaladoc
      (sniffFormat(b), w, h, b.length)
    })
    // byte-level frame sampling: n evenly spaced fixed-size slices (real
    // partitioning/batching shape; a real impl would seek keyframes)
    spark.udf.register("mm_frame_sample", (b: Array[Byte], n: Int, frameSize: Int) => {
      val total = b.length
      if (total == 0 || n <= 0) Seq.empty[Array[Byte]]
      else (0 until n).map { i =>
        val off = math.min((total.toLong * i / n).toInt, math.max(total - 1, 0))
        b.slice(off, math.min(off + frameSize, total))
      }
    })
    spark.udf.register("mm_content_hash", (b: Array[Byte]) =>
      java.security.MessageDigest.getInstance("MD5").digest(b)
        .map("%02x".format(_)).mkString)
    // STUB featurizer: deterministic pseudo-embedding (content-hash-seeded
    // xorshift, L2-normalized) so multimodal -> embedding -> ANN pipelines
    // compose end-to-end. Identical bytes embed identically (exact-dup
    // property is REAL); the vector VALUES are fake — swap in a real
    // vision/audio encoder in production. The contract that matters at
    // scale (per-row, fixed dim, Array[Float] schema CosineSimilarity
    // consumes) is exercised for real.
    spark.udf.register("mm_embed", (b: Array[Byte], dim: Int) => stubEmbed(b, dim))
    spark.conf.set("spark.graft.multimodal.registered", "true")
  }

  /** The STUB embedding function itself — shared by the `mm_embed` UDF and
    * the batched featurizer so both paths produce identical vectors.
    */
  private[graft] def stubEmbed(b: Array[Byte], dim: Int): Array[Float] = {
    var h = 1125899906842597L
    var i = 0
    while (i < math.min(b.length, 1024)) { h = 31 * h + b(i); i += 1 }
    var s = h | 1L
    val out = new Array[Float](dim)
    var norm = 0.0
    var j = 0
    while (j < dim) {
      s ^= s << 13; s ^= s >>> 7; s ^= s << 17
      val v = (s.toDouble / Long.MaxValue).toFloat
      out(j) = v
      norm += v.toDouble * v
      j += 1
    }
    val inv = (1.0 / math.sqrt(norm)).toFloat
    out.map(_ * inv)
  }

  /** Attach a STUB `embedding` column (see `mm_embed` notes): the bridge
    * from binary media into the [[graft.operators.similarity]] stack.
    */
  def withEmbedding(df: DataFrame, binaryCol: String = "content",
                    dim: Int = 64): DataFrame =
    df.withColumn("embedding", expr(s"mm_embed($binaryCol, $dim)"))

  /** BATCH-shaped featurizer — the `mapInPandas`/`mapInArrow` execution
    * shape a real encoder needs (model weights loaded once per partition,
    * inference amortized over `batchSize` rows), expressed Scala-side as
    * `mapPartitions` + grouped iterators. The per-batch setup hook is
    * where a real codec/encoder session goes; the stub embeds each row
    * with the SAME function as `mm_embed`, so the batched and scalar
    * paths are value-identical (spec-pinned) and everything downstream
    * (schema `Array[Float]`, CosineSimilarity, ANN) is exercised for
    * real. Iterator-lazy: never materializes more than one batch.
    */
  def withEmbeddingBatched(df: DataFrame, binaryCol: String = "content",
                           dim: Int = 64, batchSize: Int = 64): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    require(batchSize > 0, s"batchSize must be positive, got $batchSize")
    // replace any pre-existing embedding column instead of schema.add-ing
    // a duplicate field — matching the scalar path's withColumn semantics
    // (the re-embed case; a duplicate would be ambiguous downstream)
    val base = if (df.columns.contains("embedding")) df.drop("embedding") else df
    val schema = base.schema.add("embedding", ArrayType(FloatType, containsNull = false))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = base.schema.fieldIndex(binaryCol)
    base.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // >>> real impl: open codec / encoder session ONCE here, run one
        // batched inference over `batch`, close. Stub: per-row embed.
        batch.iterator.map { r =>
          Row.fromSeq(r.toSeq :+ stubEmbed(r.getAs[Array[Byte]](idx), dim).toSeq)
        }
      }
    }(enc)
  }

  /** Attach a typed metadata struct to a binary column: format (sniffed),
    * width/height (STUB decode), size, content hash. Pure per-row work.
    */
  def withImageMeta(df: DataFrame, binaryCol: String = "content"): DataFrame =
    df.withColumn("media_meta", expr(
      s"""named_struct(
         | 'format', mm_sniff_format($binaryCol),
         | 'width', mm_decode_image_meta($binaryCol)._2,
         | 'height', mm_decode_image_meta($binaryCol)._3,
         | 'size_bytes', length($binaryCol),
         | 'content_hash', mm_content_hash($binaryCol))""".stripMargin))
}
