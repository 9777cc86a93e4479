package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the hot loops of the similarity
  * operators ([[graft.operators.similarity]]): a whole-array dot product /
  * cosine evaluated in one codegen'd pass instead of per-element
  * higher-order-function lambdas (the round-1 p8 bottleneck — 3 interpreted
  * `aggregate`/`zip_with` reductions per candidate pair).
  *
  * These are engine extensions in the sense of the reference's custom
  * expressions (reference: streamingpro-spark-3.0.0-adaptor/src/main/java/
  * org/apache/spark/sql/WowScalaUDF.scala — the reference also drops to a
  * custom expression when the public surface is too slow/limited).
  *
  * All operate on `array<double>` (inputs are implicitly cast, so
  * `array<float>` embedding columns work directly). Null array → null
  * result; element nulls are not expected in embedding data.
  */
object VecExpressions {

  /** Register every expression with a session-extensions injector (called
    * from [[graft.GraftSession]]). Using `injectFunction` keeps us on the
    * public `SparkSessionExtensions` API.
    */
  def inject(ext: SparkSessionExtensions): Unit = {
    def info(name: String, usage: String) =
      new ExpressionInfo(classOf[ArrCosine].getName, null, name, usage, "")
    ext.injectFunction((FunctionIdentifier("arr_dot"),
      info("arr_dot", "arr_dot(a, b) - dot product of two double arrays"),
      (cs: Seq[Expression]) => ArrDot(cs(0), cs(1))))
    ext.injectFunction((FunctionIdentifier("arr_cosine"),
      info("arr_cosine", "arr_cosine(a, b) - cosine similarity of two double arrays"),
      (cs: Seq[Expression]) => ArrCosine(cs(0), cs(1))))
    ext.injectFunction((FunctionIdentifier("arr_norm"),
      info("arr_norm", "arr_norm(a) - L2 norm of a double array"),
      (cs: Seq[Expression]) => ArrNorm(cs(0))))
    ext.injectFunction((FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(tokens) - 64-bit SimHash of an array of strings"),
      (cs: Seq[Expression]) => SimHash64(cs(0))))
    ext.injectFunction((FunctionIdentifier("minhash_sig"),
      info("minhash_sig", "minhash_sig(tokens, k) - k-element MinHash signature of an array of strings"),
      (cs: Seq[Expression]) => MinHashSig(cs(0), cs(1))))
    ext.injectFunction((FunctionIdentifier("winnow_fingerprints"),
      info("winnow_fingerprints", "winnow_fingerprints(text, k, w) - winnowing document fingerprints"),
      (cs: Seq[Expression]) => WinnowFingerprints(cs(0), cs(1), cs(2))))
    ext.injectFunction((FunctionIdentifier("word_shingles"),
      info("word_shingles", "word_shingles(text, n) - distinct word n-gram shingles"),
      (cs: Seq[Expression]) => WordShingles(cs(0), cs(1))))
    ext.injectFunction((FunctionIdentifier("word_window_hashes"),
      info("word_window_hashes", "word_window_hashes(text, k) - md5 of every stride-1 k-word window"),
      (cs: Seq[Expression]) => WordWindowHashes(cs(0), cs(1))))
    ext.injectFunction((FunctionIdentifier("ngram_top_mass"),
      info("ngram_top_mass", "ngram_top_mass(words, n) - char mass of the most frequent word n-gram"),
      (cs: Seq[Expression]) => NgramTopMass(cs(0), cs(1))))
    ext.injectFunction((FunctionIdentifier("ngram_dup_mass"),
      info("ngram_dup_mass", "ngram_dup_mass(words, n) - summed char mass of duplicated word n-grams"),
      (cs: Seq[Expression]) => NgramDupMass(cs(0), cs(1))))
    ext.injectFunction((FunctionIdentifier("nfc_normalize"),
      info("nfc_normalize", "nfc_normalize(str) - Unicode NFC canonical composition (same name/semantics as DuckDB's)"),
      (cs: Seq[Expression]) => NfcNormalize(cs(0))))
  }

  /** Callers cast inputs to array<double> explicitly; reject anything else
    * at analysis time so getDouble never reads a float-width slot.
    */
  private[functions] def requireDoubleArrays(name: String, exprs: Expression*): TypeCheckResult = {
    val bad = exprs.find(e => e.dataType match {
      case ArrayType(DoubleType, _) => false
      case _ => true
    })
    bad match {
      case Some(e) => TypeCheckResult.TypeCheckFailure(
        s"$name requires array<double> inputs, got ${e.dataType}")
      case None => TypeCheckResult.TypeCheckSuccess
    }
  }
}

/** Dot product over two `array<double>` columns, single codegen'd loop. */
case class ArrDot(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {
  override def checkInputDataTypes(): TypeCheckResult = VecExpressions.requireDoubleArrays(prettyName, left, right)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "arr_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0; var i = 0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    acc
  }

  // locals get freshNames: the same expression twice in one codegen stage
  // (common once `sim` feeds both a projection and an aggregate) must not
  // redeclare `i`/`n` — Janino rejects it and the WHOLE stage silently
  // falls back to interpreted eval
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
      int $n = Math.min($a.numElements(), $b.numElements());
      double $acc = 0.0;
      for (int $i = 0; $i < $n; $i++) { $acc += $a.getDouble($i) * $b.getDouble($i); }
      ${ev.value} = $acc;
    """})

  override protected def withNewChildrenInternal(l: Expression, r: Expression): ArrDot =
    copy(left = l, right = r)
}

/** Cosine similarity over two `array<double>` columns: dot and both norms
  * accumulated in ONE pass (vs three separate HOF reductions).
  */
case class ArrCosine(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {
  override def checkInputDataTypes(): TypeCheckResult = VecExpressions.requireDoubleArrays(prettyName, left, right)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "arr_cosine"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val xv = x.getDouble(i); val yv = y.getDouble(i)
      dot += xv * yv; na += xv * xv; nb += yv * yv; i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  // freshName'd locals — see ArrDot.doGenCode for why
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb"); val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
      int $n = Math.min($a.numElements(), $b.numElements());
      double $dot = 0.0, $na = 0.0, $nb = 0.0;
      for (int $i = 0; $i < $n; $i++) {
        double $xv = $a.getDouble($i); double $yv = $b.getDouble($i);
        $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
      }
      ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
    """})

  override protected def withNewChildrenInternal(l: Expression, r: Expression): ArrCosine =
    copy(left = l, right = r)
}

/** L2 norm of an `array<double>` column. */
case class ArrNorm(child: Expression)
    extends UnaryExpression with Serializable {
  override def checkInputDataTypes(): TypeCheckResult = VecExpressions.requireDoubleArrays(prettyName, child)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "arr_norm"

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var acc = 0.0; var i = 0
    val n = x.numElements()
    while (i < n) { val v = x.getDouble(i); acc += v * v; i += 1 }
    math.sqrt(acc)
  }

  // freshName'd locals — see ArrDot.doGenCode for why
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val acc = ctx.freshName("acc"); val v = ctx.freshName("v")
      s"""
      int $n = $a.numElements();
      double $acc = 0.0;
      for (int $i = 0; $i < $n; $i++) { double $v = $a.getDouble($i); $acc += $v * $v; }
      ${ev.value} = java.lang.Math.sqrt($acc);
    """})

  override protected def withNewChildInternal(c: Expression): ArrNorm = copy(child = c)
}

/** 64-bit SimHash over an `array<string>` token column: each token is
  * xxhash64'd (seed 42, Spark's default), each signature bit is the sign of
  * the per-bit +1/−1 vote sum. Per-row (not per-pair) work, so interpreted
  * eval is fine — no codegen needed.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback with Serializable {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires array<string>, got $other")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val h = XxHash64Function.hash(s, StringType, 42L)
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) { if (votes(j) > 0) sig |= (1L << j); j += 1 }
    sig
  }

  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(child = c)
}

/** k-element MinHash signature over an `array<string>` token set using the
  * standard double-hashing family g_i(s) = h1(s) + i·h2(s) (Kirsch &
  * Mitzenmacher): TWO xxhash64 evaluations per token instead of k — the
  * difference between 2·|tokens| and k·|tokens| hash calls per row, which
  * made the HOF formulation the corpus-dedup bottleneck. Per-row work, no
  * shuffle; interpreted eval is fine (one tight loop per row).
  */
case class MinHashSig(left: Expression, right: Expression)
    extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback with Serializable {
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), IntegerType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires (array<string>, int), got ($l, $r)")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(tokens: Any, k: Any): Any = {
    val arr = tokens.asInstanceOf[ArrayData]
    val numHashes = k.asInstanceOf[Int]
    val sig = Array.fill(numHashes)(Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val h1 = XxHash64Function.hash(s, StringType, 42L)
        val h2 = XxHash64Function.hash(s, StringType, 77L) | 1L // odd -> full-period
        var j = 0
        var g = h1
        while (j < numHashes) {
          if (g < sig(j)) sig(j) = g
          g += h2
          j += 1
        }
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(sig)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): MinHashSig =
    copy(left = l, right = r)
}

/** Distinct word n-gram shingles of a space-separated text, in one native
  * pass (split + sliding-window join + HashSet dedupe). Semantics match
  * `array_distinct(transform(sequence(0, size(w)-n), i -> concat_ws(' ',
  * w[i], ...)))` over `split(text, ' ')` — including empty tokens from
  * consecutive spaces — but without materializing the token array or
  * running 2 interpreted lambdas per shingle (the shingling step is shared
  * by every text-dedup operator, so it is the corpus-wide hot loop).
  * Output preserves first-occurrence order, like array_distinct.
  */
case class WordShingles(left: Expression, right: Expression)
    extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback with Serializable {
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (StringType, IntegerType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"word_shingles requires (string, int), got ($l, $r)")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override protected def nullSafeEval(textAny: Any, nAny: Any): Any = {
    val s = textAny.asInstanceOf[UTF8String].toString
    val n = nAny.asInstanceOf[Int]
    val words = s.split(" ", -1) // keep empty tokens: matches split(text, ' ')
    if (words.length < n)
      return org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(Array.empty[AnyRef])
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    val last = words.length - n
    val sb = new java.lang.StringBuilder
    while (i <= last) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[AnyRef](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): WordShingles =
    copy(left = l, right = r)
}

/** Per-position k-word window fingerprints of a text, in one native pass:
  * md5 hex of the space-joined tokens of every stride-1 window over the
  * whitespace-split (empties dropped) token stream. Semantics match
  * `transform(sequence(0, size(w)-k), i -> md5(array_join(slice(w, i+1,
  * k), ' ')))` over `filter(split(text, '\s+'), x -> length(x) > 0)`,
  * but without allocating a slice array + joined string + expression-tree
  * walk per window — this is [[graft.operators.text.SubstringDedup]]'s
  * corpus-wide hot loop (every token position of every document). Docs
  * shorter than k yield an empty array.
  */
case class WordWindowHashes(left: Expression, right: Expression)
    extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback with Serializable {
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (StringType, IntegerType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"word_window_hashes requires (string, int), got ($l, $r)")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_window_hashes"

  private val hexDigits = "0123456789abcdef".toCharArray

  override protected def nullSafeEval(textAny: Any, kAny: Any): Any = {
    val s = textAny.asInstanceOf[UTF8String].toString
    val k = kAny.asInstanceOf[Int]
    val words = s.split("\\s+").filter(_.nonEmpty)
    if (k <= 0 || words.length < k)
      return org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(Array.empty[AnyRef])
    val md = java.security.MessageDigest.getInstance("MD5")
    val out = new Array[AnyRef](words.length - k + 1)
    val space = " ".getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val wordBytes = words.map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var i = 0
    while (i < out.length) {
      md.reset()
      var j = 0
      while (j < k) {
        if (j > 0) md.update(space)
        md.update(wordBytes(i + j))
        j += 1
      }
      val digest = md.digest()
      val hex = new Array[Char](32)
      var b = 0
      while (b < 16) {
        hex(2 * b) = hexDigits((digest(b) >> 4) & 0xf)
        hex(2 * b + 1) = hexDigits(digest(b) & 0xf)
        b += 1
      }
      out(i) = UTF8String.fromString(new String(hex))
      i += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): WordWindowHashes =
    copy(left = l, right = r)
}

/** Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
  * "Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD'03):
  * Rabin-Karp rolling hash over every k-char gram, then the minimum hash of
  * each w-length window (rightmost occurrence on ties) — guaranteeing any
  * shared substring of length ≥ w+k−1 yields a shared fingerprint. Returns
  * the distinct fingerprints sorted. Per-row work, no shuffle; downstream
  * dedup is an inverted-index/banded join over the fingerprint array.
  */
case class WinnowFingerprints(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback with Serializable {
  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (StringType, IntegerType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"winnow_fingerprints requires (string, int, int), got ($a, $b, $c)")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fingerprints"

  override protected def nullSafeEval(textAny: Any, kAny: Any, wAny: Any): Any = {
    val s = textAny.asInstanceOf[UTF8String].toString
    val k = kAny.asInstanceOf[Int]
    val w = wAny.asInstanceOf[Int]
    require(k >= 1 && w >= 1, "winnow_fingerprints: k and w must be >= 1")
    val n = s.length - k + 1
    if (n <= 0) return org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(Array.empty[Long])
    // Rabin-Karp: h(i) = Σ s(i+j)·B^(k-1-j) mod M (computed in Long space)
    val B = 1000003L
    var pow = 1L
    var j = 1
    while (j < k) { pow *= B; j += 1 }
    val hashes = new Array[Long](n)
    var h = 0L
    var i = 0
    while (i < k) { h = h * B + s.charAt(i); i += 1 }
    hashes(0) = h
    i = 1
    while (i < n) {
      h = (h - s.charAt(i - 1) * pow) * B + s.charAt(i + k - 1)
      hashes(i) = h
      i += 1
    }
    val out = scala.collection.mutable.SortedSet[Long]()
    var start = 0
    val lastStart = math.max(n - w, 0)
    while (start <= lastStart) {
      val end = math.min(start + w, n)
      var minIdx = start
      var idx = start + 1
      while (idx < end) {
        if (hashes(idx) <= hashes(minIdx)) minIdx = idx // rightmost min
        idx += 1
      }
      out += hashes(minIdx)
      start += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out.toArray)
  }

  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): WinnowFingerprints =
    copy(first = f, second = s, third = t)
}

/** Shared one-pass n-gram statistics for the Gopher A1.2 repetition
  * expressions: ONE hash-map build over the stride-1 word n-grams of a
  * document, keyed by the space-joined gram, valued by (occurrence count,
  * char mass of one occurrence). Char mass excludes the n−1 joining
  * spaces — i.e. `length(gram) - (n-1)` of the joined string — matching
  * the HOF formulation these expressions replaced (which was O(distinct ×
  * n-grams) per row in interpreted lambdas; this is O(n-grams)).
  */
private[functions] object NgramMass {
  /** gram → Array(count, charMassOfOneOccurrence). Null words are treated
    * as empty strings (the callers feed `filter(split(text,' '), x -> x <>
    * '')`, which never yields nulls).
    */
  /** One UTF8String→String/char-count conversion of the word array,
    * shared by every n the caller needs (the battery runs n=2..5 over
    * the same prepared arrays).
    */
  def prep(arr: ArrayData): (Array[String], Array[Long]) = {
    val g = arr.numElements()
    val strs = new Array[String](g)
    val chars = new Array[Long](g)
    var i = 0
    while (i < g) {
      val w = if (arr.isNullAt(i)) UTF8String.EMPTY_UTF8 else arr.getUTF8String(i)
      chars(i) = w.numChars().toLong // code points, = Spark/DuckDB LENGTH()
      strs(i) = w.toString
      i += 1
    }
    (strs, chars)
  }

  def countsFrom(strs: Array[String], chars: Array[Long],
                 n: Int): java.util.HashMap[String, Array[Long]] = {
    val g = strs.length
    val m = new java.util.HashMap[String, Array[Long]]()
    if (n <= 0 || g < n) return m
    val sb = new java.lang.StringBuilder
    val last = g - n
    var i = 0
    while (i <= last) {
      sb.setLength(0)
      var mass = 0L
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(strs(i + j))
        mass += chars(i + j)
        j += 1
      }
      val key = sb.toString
      val prev = m.get(key)
      if (prev == null) m.put(key, Array(1L, mass)) else prev(0) += 1L
      i += 1
    }
    m
  }

  def counts(arr: ArrayData, n: Int): java.util.HashMap[String, Array[Long]] = {
    val (strs, chars) = prep(arr)
    countsFrom(strs, chars, n)
  }

  /** Max-count gram's total char mass (ties on count broken by larger
    * count × mass) — the Gopher top-n-gram statistic.
    */
  def topMass(m: java.util.HashMap[String, Array[Long]]): Long = {
    var bestCnt = 0L
    var bestTotal = 0L
    val it = m.values().iterator()
    while (it.hasNext) {
      val v = it.next()
      val cnt = v(0)
      val total = cnt * v(1)
      if (cnt > bestCnt || (cnt == bestCnt && total > bestTotal)) {
        bestCnt = cnt; bestTotal = total
      }
    }
    bestTotal
  }

  /** Σ count × mass over grams occurring ≥ 2 times — the Gopher
    * dup-n-gram statistic.
    */
  def dupMass(m: java.util.HashMap[String, Array[Long]]): Long = {
    var acc = 0L
    val it = m.values().iterator()
    while (it.hasNext) {
      val v = it.next()
      if (v(0) >= 2L) acc += v(0) * v(1)
    }
    acc
  }
}

/** Char mass claimed by the most frequent word n-gram of a document
  * (Gopher A1.2's top-n-gram statistic): max occurrence count wins; among
  * grams tied on count, the larger `count × charMass` wins. Returns 0 when
  * the document has fewer than n words. Semantics match the former
  * two-aligned-HOF-passes formulation in
  * [[graft.operators.text.QualityRules.repetition]] exactly (including the
  * space-excluded char mass), but in ONE O(n-grams) hash pass per row
  * instead of O(distinct × n-grams) interpreted lambda evaluations.
  */
case class NgramTopMass(left: Expression, right: Expression)
    extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback with Serializable {
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), IntegerType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"ngram_top_mass requires (array<string>, int), got ($l, $r)")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "ngram_top_mass"

  override protected def nullSafeEval(wordsAny: Any, nAny: Any): Any =
    NgramMass.topMass(
      NgramMass.counts(wordsAny.asInstanceOf[ArrayData], nAny.asInstanceOf[Int]))

  override protected def withNewChildrenInternal(l: Expression, r: Expression): NgramTopMass =
    copy(left = l, right = r)
}

/** Summed char mass of DUPLICATED word n-grams (Gopher A1.2's dup-n-gram
  * statistic): Σ over distinct grams occurring ≥ 2 times of `count ×
  * charMass` (spaces excluded, overlaps allowed — callers cap the fraction
  * at 1.0). Same one-hash-pass cost profile as [[NgramTopMass]].
  */
case class NgramDupMass(left: Expression, right: Expression)
    extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback with Serializable {
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), IntegerType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"ngram_dup_mass requires (array<string>, int), got ($l, $r)")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "ngram_dup_mass"

  override protected def nullSafeEval(wordsAny: Any, nAny: Any): Any =
    NgramMass.dupMass(
      NgramMass.counts(wordsAny.asInstanceOf[ArrayData], nAny.asInstanceOf[Int]))

  override protected def withNewChildrenInternal(l: Expression, r: Expression): NgramDupMass =
    copy(left = l, right = r)
}

/** Unicode NFC canonical composition of a string column — the first step
  * of any text-normalization pipeline (decomposed "e"+U+0301 sequences
  * from different crawls must compare equal before any dedup/quality
  * pass). Named and behaving like DuckDB's `nfc_normalize`, so oracles
  * replay it verbatim. Per-row, no shuffle; codegen emits one static
  * `java.text.Normalizer` call. The common all-ASCII row short-circuits
  * inside `Normalizer.normalize` itself (quick-check pass), so the cost
  * at 100 TB is one scan over the bytes.
  */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with Serializable {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize requires string, got $other")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(s: Any): Any =
    UTF8String.fromString(java.text.Normalizer.normalize(
      s.asInstanceOf[UTF8String].toString, java.text.Normalizer.Form.NFC))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
        java.text.Normalizer.normalize($c.toString(),
          java.text.Normalizer.Form.NFC));
    """)

  override protected def withNewChildInternal(c: Expression): NfcNormalize =
    copy(child = c)
}
