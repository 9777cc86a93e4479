package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.operators.text.UnigramTokenizer

class UnigramTokenizerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Brute-force reference: enumerate every segmentation, pick min cost,
    * ties by fewer pieces (the metrics the oracle compares).
    */
  private def bruteBest(w: String, costs: Map[String, Double],
                        maxLen: Int): (Double, Int) = {
    def segs(s: String): Seq[Seq[String]] =
      if (s.isEmpty) Seq(Seq.empty)
      else for {
        k <- 1 to math.min(maxLen, s.length)
        head = s.substring(0, k)
        if costs.contains(head)
        rest <- segs(s.substring(k))
      } yield head +: rest
    val all = segs(w)
    assert(all.nonEmpty, s"brute force: '$w' unsegmentable")
    all.map(p => (p.foldLeft(0.0)((a, x) => a + costs(x)), p.length))
      .minBy { case (c, np) => (c, np) }
  }

  test("viterbi matches brute-force min cost and piece count on random vocabs") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 50) {
      val alphabet = "abc"
      val w = (1 to (3 + rnd.nextInt(6))).map(_ => alphabet(rnd.nextInt(3))).mkString
      // random vocab: all chars + some random substrings, random costs
      val pieces = (alphabet.map(_.toString) ++
        (1 to 6).map { _ =>
          val i = rnd.nextInt(w.length); val j = i + 1 + rnd.nextInt(math.min(3, w.length - i))
          w.substring(i, j)
        }).distinct
      val costs = pieces.map(p => p -> (0.5 + rnd.nextDouble() * 3)).toMap
      val got = UnigramTokenizer.viterbi(w, costs, 4)
      val gotCost = got.foldLeft(0.0)((a, x) => a + costs(x))
      val (wantCost, wantNp) = bruteBest(w, costs, 4)
      assert(gotCost == wantCost && got.length == wantNp,
        s"trial $trial '$w': got ($gotCost, ${got.length}) want ($wantCost, $wantNp)")
      assert(got.mkString == w, "segmentation must reassemble the word")
    }
  }

  test("viterbi path is the reverse-lexicographic min among optimal segmentations") {
    // the property the s33 oracle's ORDER BY (cost, np, reversed path)
    // selection replays — pinned against brute-force enumeration
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 80) {
      val alphabet = "ab" // tiny alphabet maximizes tie frequency
      val w = (1 to (3 + rnd.nextInt(6))).map(_ => alphabet(rnd.nextInt(2))).mkString
      val pieces = (alphabet.map(_.toString) ++
        (1 to 5).map { _ =>
          val i = rnd.nextInt(w.length); val j = i + 1 + rnd.nextInt(math.min(3, w.length - i))
          w.substring(i, j)
        }).distinct
      // coarse costs (multiples of 0.5) force frequent exact ties
      val costs = pieces.map(p => p -> (0.5 * (1 + rnd.nextInt(4)))).toMap
      def segs(s: String): Seq[List[String]] =
        if (s.isEmpty) Seq(Nil)
        else for {
          k <- 1 to math.min(4, s.length)
          head = s.substring(0, k)
          if costs.contains(head)
          rest <- segs(s.substring(k))
        } yield head :: rest
      implicit val seqOrd: Ordering[Seq[String]] =
        Ordering.Implicits.seqOrdering[Seq, String]
      val want = segs(w).minBy(p =>
        (p.foldLeft(0.0)((a, x) => a + costs(x)), p.length, p.reverse: Seq[String]))(
        Ordering.Tuple3(Ordering.Double.TotalOrdering, Ordering.Int, seqOrd))
      val got = UnigramTokenizer.viterbi(w, costs, 4)
      assert(got == want, s"trial $trial '$w': got $got want $want costs=$costs")
    }
  }

  test("viterbiNBest matches brute-force enumeration under (cost, np, rev-path) order") {
    val rnd = new scala.util.Random(21)
    for (trial <- 1 to 60) {
      val alphabet = "ab"
      val w = (1 to (3 + rnd.nextInt(5))).map(_ => alphabet(rnd.nextInt(2))).mkString
      val pieces = (alphabet.map(_.toString) ++
        (1 to 5).map { _ =>
          val i = rnd.nextInt(w.length); val j = i + 1 + rnd.nextInt(math.min(3, w.length - i))
          w.substring(i, j)
        }).distinct
      val costs = pieces.map(p => p -> (0.5 * (1 + rnd.nextInt(4)))).toMap
      def segs(s: String): Seq[List[String]] =
        if (s.isEmpty) Seq(Nil)
        else for {
          kk <- 1 to math.min(4, s.length)
          head = s.substring(0, kk)
          if costs.contains(head)
          rest <- segs(s.substring(kk))
        } yield head :: rest
      implicit val seqOrd: Ordering[Seq[String]] =
        Ordering.Implicits.seqOrdering[Seq, String]
      val want = segs(w)
        .map(p => (p.foldLeft(0.0)((a, x) => a + costs(x)), p))
        .sortBy { case (c, p) => (c, p.length, p.reverse: Seq[String]) }(
          Ordering.Tuple3(Ordering.Double.TotalOrdering, Ordering.Int, seqOrd))
        .take(3)
        .map { case (c, p) => (c, p: Seq[String]) }
      val got = UnigramTokenizer.viterbiNBest(w, costs, 4, 3)
      assert(got == want, s"trial $trial '$w': got $got want $want costs=$costs")
      // rank 1 is exactly the single-best viterbi path
      assert(got.head._2 == UnigramTokenizer.viterbi(w, costs, 4))
    }
  }

  test("nbestTable emits ranked rows per word occurrence") {
    import spark.implicits._
    val docs = Seq((1L, "abab aa"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val vocab = UnigramTokenizer.train(docs.where($"text".isNotNull), "text",
      vocabSize = 10, maxPieceLen = 3, iters = 3)
    val costs = vocab.collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    val out = UnigramTokenizer.nbestTable(docs, "doc_id", "text", vocab, 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getInt(3), r.getSeq[String](4), r.getLong(5), r.getDouble(6)))
    assert(out.forall(_._1 == 1L), "null text contributes no rows")
    assert(out.map(t => (t._2, t._3)).distinct.sorted.toSeq ==
      Seq((1, "abab"), (2, "aa")))
    for (((wpos, word), rows) <- out.groupBy(t => (t._2, t._3))) {
      val want = UnigramTokenizer.viterbiNBest(word, costs, 3, 3,
        oovCost = Some(costs.values.max + 1.0))
      val got = rows.sortBy(_._4).toSeq
        .map(t => (math.rint(t._7 * 1e6) / 1e6, t._5))
      assert(got == want.map { case (c, p) => (math.rint(c * 1e6) / 1e6, p) },
        s"word $word at $wpos")
      assert(rows.map(_._4).sorted.toSeq == (1 to rows.length), "ranks 1-based dense")
      assert(rows.forall(t => t._6 == t._5.length.toLong))
    }
  }

  test("sampledTable draws deterministically from the n-best by seeded inverse-CDF") {
    import spark.implicits._
    val docs = Seq((1L, "aaaa aaaa aaaa aaaa"), (2L, "aaaa aaaa aaaa aaaa"))
      .toDF("doc_id", "text")
    val vocab = UnigramTokenizer.train(docs, "text", vocabSize = 8,
      maxPieceLen = 3, iters = 3)
    def run(alpha: Double, seed: Long) =
      UnigramTokenizer.sampledTable(docs, "doc_id", "text", vocab, 3, alpha, seed)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(3),
          r.getSeq[String](4))).sortBy(t => (t._1, t._2)).toSeq
    // deterministic: same seed twice -> identical; rows reassemble the word
    val a = run(0.0, 7L)
    assert(a == run(0.0, 7L))
    assert(a.forall(_._4.mkString("") == "aaaa"))
    // alpha=0 is uniform over the n-best: with 8 occurrences and 3 ranks,
    // some draw must leave rank 1 (P[all rank1] = (1/3)^8)
    assert(a.map(_._3).distinct.length > 1, a.mkString(";"))
    // sampled rank always carries that rank's n-best segmentation
    val costs = vocab.collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    val nb = UnigramTokenizer.viterbiNBest("aaaa", costs, 3, 3,
      oovCost = Some(costs.values.max + 1.0))
    assert(a.forall(t => t._4 == nb(t._3 - 1)._2))
    // huge alpha concentrates on the Viterbi path (rank 1 everywhere)
    assert(run(50.0, 7L).forall(_._3 == 1))
    // different seeds give a different draw pattern somewhere
    assert((1 to 20).exists(s => run(0.0, s.toLong) != a))
  }

  test("roundHalfUp9 matches DuckDB ROUND at forced midpoints (half-away, not half-even)") {
    // exp(-alpha*cost)*1e9 can land on an exact .5 midpoint; DuckDB's
    // ROUND(x, 9) is half-away-from-zero there while math.rint is
    // half-to-even — the two engines would rank the candidates
    // differently and the bit-exact s37 draw replay would break.
    // 2.5e-9 * 1e9 == 2.5 exactly in IEEE doubles (checked below), so
    // these are genuine midpoints, not near-misses.
    for ((w, up) <- Seq(0.5e-9 -> 1.0, 2.5e-9 -> 3.0, 3.5e-9 -> 4.0,
                        1234567.5e-9 -> 1234568.0)) {
      assert(w * 1e9 == math.floor(w * 1e9) + 0.5, s"$w must be a true midpoint")
      assert(UnigramTokenizer.roundHalfUp9(w) * 1e9 == up,
        s"roundHalfUp9($w) must round UP like DuckDB ROUND")
    }
    // rint would disagree on the even-neighbor midpoints — the exact bug
    assert(math.rint(2.5) == 2.0 && math.rint(0.5) == 0.0,
      "sanity: rint is half-even, which is why it was wrong here")
    // off-midpoint values agree with plain rounding
    for (x <- Seq(0.0, 1.0, 0.123456789123, 3.7e-10, 0.999999999499))
      assert(UnigramTokenizer.roundHalfUp9(x) == math.rint(x * 1e9) / 1e9 ||
        x * 1e9 == math.floor(x * 1e9) + 0.5)
  }

  test("withPieces emits the viterbi path, rank ids, and the withEncoding metrics") {
    import spark.implicits._
    val docs = Seq((1L, "abab ba aa"), (2L, "aa bb ab"), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val vocab = UnigramTokenizer.train(docs.where($"text".isNotNull), "text",
      vocabSize = 10, maxPieceLen = 3, iters = 3)
    val costs = vocab.collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    val ids = UnigramTokenizer.vocabIds(vocab)
    // ids are the (cnt desc, piece asc) rank — dense 0..|V|-1
    assert(ids.values.toSeq.sorted == ids.values.toSeq.indices.map(_.toLong))
    val out = UnigramTokenizer.withPieces(docs, "text", vocab)
      .select("doc_id", "pieces", "piece_ids", "n_pieces", "enc_cost").collect()
      .map(r => r.getLong(0) -> r).toMap
    for ((id, text) <- Seq((1L, "abab ba aa"), (2L, "aa bb ab"))) {
      val wantPieces = text.split(" ").filter(_.nonEmpty).toSeq
        .flatMap(w => UnigramTokenizer.viterbi(w, costs, 3))
      val r = out(id)
      assert(r.getSeq[String](1) == wantPieces, s"doc $id pieces")
      assert(r.getSeq[Long](2) == wantPieces.map(ids), s"doc $id ids")
      assert(r.getLong(3) == wantPieces.length.toLong)
      val c = wantPieces.foldLeft(0.0)((a, x) => a + costs(x))
      assert(r.getDouble(4) == math.rint(c * 1e6) / 1e6)
    }
    assert(out(3L).isNullAt(1) && out(3L).isNullAt(3)) // null text -> nulls
    // OOV piece maps to id -1
    val oov = UnigramTokenizer.withPieces(
      Seq((9L, "aXa")).toDF("doc_id", "text"), "text", vocab)
      .select("piece_ids").head().getSeq[Long](0)
    assert(oov.contains(-1L), oov)
  }

  test("training concentrates probability on frequent long pieces") {
    import spark.implicits._
    val docs = Seq.fill(50)((1L, "abab abab baba")).zipWithIndex
      .map { case ((_, t), i) => (i.toLong, t) }.toDF("doc_id", "text")
    val vocab = UnigramTokenizer.train(docs, "text", vocabSize = 8,
      maxPieceLen = 4, iters = 4)
    val pieces = vocab.select("piece").collect().map(_.getString(0)).toSet
    // the 4-char words themselves should be vocabulary pieces
    assert(pieces.contains("abab") && pieces.contains("baba"), pieces)
    // single chars never pruned
    assert(pieces.contains("a") && pieces.contains("b"))
    // and encoding the training words uses ONE piece each
    val costs = vocab.collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(UnigramTokenizer.viterbi("abab", costs, 4) == Seq("abab"))
  }

  test("train is deterministic and respects vocabSize") {
    import spark.implicits._
    val docs = Seq((1L, "the cat sat on the mat"), (2L, "the cats sat"))
      .toDF("doc_id", "text")
    def run() = UnigramTokenizer.train(docs, "text", vocabSize = 20,
        maxPieceLen = 4, iters = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    val (a, b) = (run(), run())
    assert(a == b)
    val chars = a.map(_._1).filter(_.length == 1).toSet
    assert(a.size <= math.max(20, chars.size))
  }

  test("withEncoding matches a driver-side viterbi of every word") {
    import spark.implicits._
    val docs = Seq((1L, "abab ba"), (2L, "aa bb ab")).toDF("doc_id", "text")
    val vocab = UnigramTokenizer.train(docs, "text", vocabSize = 10,
      maxPieceLen = 3, iters = 3)
    val costs = vocab.collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    val got = UnigramTokenizer.withEncoding(docs, "text", vocab)
      .select("doc_id", "n_pieces", "enc_cost").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    for ((id, text) <- Seq((1L, "abab ba"), (2L, "aa bb ab"))) {
      val ws = text.split(" ")
      val np = ws.map(w => UnigramTokenizer.viterbi(w, costs, 3).length.toLong).sum
      val c = ws.map(w => UnigramTokenizer.viterbi(w, costs, 3)
        .foldLeft(0.0)((a, x) => a + costs(x))).sum
      assert(got(id) == ((np, math.rint(c * 1e6) / 1e6)), s"doc $id")
    }
  }

  test("unsegmentable word (unseen character) fails loudly in strict mode") {
    val err = intercept[IllegalArgumentException](
      UnigramTokenizer.viterbi("xyz", Map("a" -> 1.0), 4))
    assert(err.getMessage.contains("cannot segment"))
  }

  test("encode survives OOV characters and null text (one bad doc must not kill the job)") {
    import spark.implicits._
    val train = Seq((1L, "abab abab")).toDF("doc_id", "text")
    val vocab = UnigramTokenizer.train(train, "text", vocabSize = 6,
      maxPieceLen = 4, iters = 2)
    val docs = Seq((1L, "abab"), (2L, "abXab"), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = UnigramTokenizer.withEncoding(docs, "text", vocab)
      .select("doc_id", "n_pieces", "n_oov").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) (-1L, -1L) else (r.getLong(1), r.getLong(2)))).toMap
    assert(out(1L)._1 >= 1L && out(1L)._2 == 0L)
    assert(out(2L)._1 >= 2L && out(2L)._2 == 1L) // the X is ONE OOV piece
    assert(out(3L) == ((-1L, -1L))) // null text -> null outputs, row kept
  }

  test("nbestTable and the encode pass plan with no exchange (pure per-row work)") {
    import spark.implicits._
    val docs = Seq((1L, "abab aa")).toDF("doc_id", "text")
    val vocab = UnigramTokenizer.train(docs, "text", vocabSize = 8,
      maxPieceLen = 3, iters = 2)
    // the encode passes are pure per-row plans (the audited zero-shuffle
    // shape; the r20 auto-hatch that injected a round-robin exchange here
    // was reverted in r21 — it crashed streaming frames and regressed the
    // warm bench on exactly these paths)
    for (frame <- Seq(
        UnigramTokenizer.withEncoding(docs, "text", vocab),
        UnigramTokenizer.withPieces(docs, "text", vocab),
        UnigramTokenizer.nbestTable(docs, "doc_id", "text", vocab, 3))) {
      val p = frame.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"), p)
    }
  }

  test("distributed trainer is bit-identical to the driver path (forced low cap)") {
    import spark.implicits._
    // realistic-ish corpus: repeated words with overlapping subwords, so
    // the seed prune, the EM recount AND the char floor all exercise
    val docs = Seq(
      (1L, "the cat sat on the mat"), (2L, "the cats sat on the mats"),
      (3L, "a cat and a rat ran"), (4L, "the rats and the cats ran"),
      (5L, "matting and catting and ratting"), (6L, "on and on and on"))
      .toDF("doc_id", "text")
    def collectVocab(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    for ((vs, mpl, it, sc) <- Seq((24, 4, 3, 100000), (16, 3, 2, 30), (12, 5, 0, 100000))) {
      // driverDictCap=0 disables the fast path entirely -> distributed rounds
      val dist = collectVocab(UnigramTokenizer.train(docs, "text", vocabSize = vs,
        maxPieceLen = mpl, iters = it, seedCap = sc, driverDictCap = 0))
      val drv = collectVocab(UnigramTokenizer.train(docs, "text", vocabSize = vs,
        maxPieceLen = mpl, iters = it, seedCap = sc))
      assert(dist == drv, s"(vocabSize=$vs maxPieceLen=$mpl iters=$it seedCap=$sc)")
    }
  }

  test("distributed trainer matches the driver path on the real sf corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def collectVocab(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    val dist = collectVocab(UnigramTokenizer.train(docs, "text", vocabSize = 64,
      maxPieceLen = 4, iters = 2, seedCap = 2000, driverDictCap = 0))
    val drv = collectVocab(UnigramTokenizer.train(docs, "text", vocabSize = 64,
      maxPieceLen = 4, iters = 2, seedCap = 2000))
    assert(dist == drv)
  }

  test("iters=0 still prunes the seed vocabulary to vocabSize") {
    import spark.implicits._
    val docs = Seq((1L, "the cat sat on the mat and the rat sat too"))
      .toDF("doc_id", "text")
    val vocab = UnigramTokenizer.train(docs, "text", vocabSize = 12,
      maxPieceLen = 4, iters = 0)
    val pieces = vocab.collect().map(_.getString(0))
    val chars = pieces.filter(_.length == 1).toSet
    assert(pieces.length <= math.max(12, chars.size), pieces.mkString(","))
  }
}
