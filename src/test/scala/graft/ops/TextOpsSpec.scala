package graft.ops

import graft.pipeline.SparkTestBase
import org.apache.spark.sql.functions._

/** Hand-case semantics for the span-level duplication stats (their
  * cross-engine check is the q69 DuckDB oracle over gram STRINGS; these
  * cases pin the interval-union arithmetic on known overlaps). */
class TextOpsSpec extends SparkTestBase {
  import spark.implicits._

  private def stats(docs: Seq[(Long, String)], k: Int) =
    TextOps.dupSpanStats(docs.toDF("doc_id", "text"), k = k)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap

  test("dupSpanStats merges overlapping duplicated grams into one covered span") {
    val out = stats(Seq(
      1L -> "a b c d e f",     // grams abc, bcd shared with doc 2
      2L -> "x x a b c d y",
      3L -> "z z z z"          // nothing shared
    ), k = 3)
    // doc 1: hits at pos 0,1 -> union [0,3] = 4 tokens of 6
    assert(out(1L) == ((6L, 2L, 4L, 0.666667)), s"got ${out(1L)}")
    // doc 2: hits at pos 2,3 -> union [2,5] = 4 tokens of 7
    assert(out(2L) == ((7L, 2L, 4L, 0.571429)), s"got ${out(2L)}")
    assert(out(3L) == ((4L, 0L, 0L, 0.0)), s"got ${out(3L)}")
  }

  test("dupSpanStats sums disjoint duplicated spans without bridging the gap") {
    val out = stats(Seq(
      4L -> "p q r s z t u v w",  // shares pqr (pos 0) and tuv (pos 5)
      5L -> "p q r y y y t u v"
    ), k = 3)
    // doc 4: [0,2] U [5,7] = 6 tokens of 9; the s/z gap stays uncovered
    assert(out(4L) == ((9L, 2L, 6L, 0.666667)), s"got ${out(4L)}")
    assert(out(5L) == ((9L, 2L, 6L, 0.666667)), s"got ${out(5L)}")
  }

  test("dupSpanStats ignores repeats WITHIN one document (cross-doc only)") {
    val out = stats(Seq(
      6L -> "m n o m n o m n o",  // heavy self-repetition, no other doc
      7L -> "unrelated words entirely here"
    ), k = 3)
    assert(out(6L) == ((9L, 0L, 0L, 0.0)), s"got ${out(6L)}")
  }

  test("decontaminate counts distinct eval-shared grams per train doc") {
    val docs = Seq(
      (0L, "a b c d e f"),        // EVAL doc: grams abc bcd cde def
      (1L, "a b c d x y z"),      // train: shares abc, bcd -> 2 of 5
      (2L, "q r s t u"),          // train: clean -> 0 of 3
      (3L, "a b c a b c"),        // train: grams abc, bca, cab, abc(dup) ->
                                  // DISTINCT grams 3, shared {abc} -> 1 of 3
      (4L, "x y")                 // train: too short for any 3-gram
    ).toDF("doc_id", "text")
    val out = TextOps.decontaminate(docs, col("doc_id") === 0L, k = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))).toMap
    assert(!out.contains(0L), "eval docs are excluded from the report")
    assert(out(1L) == ((5L, 2L, 0.4, true)), s"got ${out(1L)}")
    assert(out(2L) == ((3L, 0L, 0.0, false)), s"got ${out(2L)}")
    assert(out(3L) == ((3L, 1L, 0.333333, true)),
      s"within-doc gram dups collapse before counting: got ${out(3L)}")
    assert(out(4L) == ((0L, 0L, 0.0, false)),
      s"sub-k docs report zero grams, not NULL: got ${out(4L)}")
  }

  test("lmScore matches the hand-computed add-α bigram cross-entropy") {
    val docs = Seq(
      (1L, "a b a"),   // bigrams: (a b), (b a)
      (2L, "a b"),     // bigram: (a b)
      (3L, "c"),       // 1 token: no bigrams
      (4L, " ")        // no tokens at all
    ).toDF("doc_id", "text")
    // corpus model: uni a=3 b=2 c=1, V=3; bi "a b"=2, "b a"=1; α=0.5
    val pAB = (2 + 0.5) / (3 + 0.5 * 3)
    val pBA = (1 + 0.5) / (2 + 0.5 * 3)
    def r6(v: Double) = BigDecimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // Spark's log() codegen is StrictMath.log (the psiDrift precedent);
    // exp() is Math.exp
    val x1 = -(0.0 + StrictMath.log(pAB) + StrictMath.log(pBA)) / 2
    val x2 = -(0.0 + StrictMath.log(pAB)) / 1
    val out = TextOps.lmScore(docs)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Double]),
          Option(r.get(3)).map(_.asInstanceOf[Double])))).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L), "every doc surfaces")
    assert(out(1L) == ((2L, Some(r6(x1)), Some(r6(math.exp(x1))))),
      s"got ${out(1L)}")
    assert(out(2L) == ((1L, Some(r6(x2)), Some(r6(math.exp(x2))))),
      s"got ${out(2L)}")
    assert(out(3L) == ((0L, None, None)), s"got ${out(3L)}")
    assert(out(4L) == ((0L, None, None)), s"got ${out(4L)}")
    // the repeated bigram is CHEAPER than the rare one: the filter ranks
    // boilerplate as more probable, the CCNet premise
    assert(x2 < x1, "doc of only the frequent bigram scores lower xent")
  }

  test("keywordTfidf ranks rare repeated terms first, deterministic ties") {
    val docs = Seq(
      1L -> "apple apple banana common common common",
      2L -> "banana cherry common",
      3L -> "common date date").toDF("doc_id", "text")
    val out = TextOps.keywordTfidf(docs, k = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1)) ->
        ((r.getString(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    // score replicated in the engine's exact op order (StrictMath.log)
    def sc(tf: Long, df: Long): Double =
      tf.toDouble * (StrictMath.log((3.0 + 1.0) / (df.toDouble + 1.0)) + 1.0)
    assert(out.size == 6, "k=2 rows per doc")
    // doc 1: apple tf=2 df=1 beats common tf=3 df=3
    assert(out((1L, 1)) == (("apple", 2L, 1L, sc(2, 1))))
    assert(sc(2, 1) > sc(3, 3), "rare repeated term outranks boilerplate")
    assert(out((1L, 2)) == (("common", 3L, 3L, sc(3, 3))))
    // doc 2: banana and cherry tie at tf=1 — banana df=2 scores lower than
    // cherry df=1; rank is by score first
    assert(out((2L, 1)) == (("cherry", 1L, 1L, sc(1, 1))))
    assert(out((2L, 2)) == (("banana", 1L, 2L, sc(1, 2))))
    assert(out((3L, 1)) == (("date", 2L, 1L, sc(2, 1))))
  }

  test("zipfFit recovers slope -1 on an exact 1/r power-law corpus") {
    // freq_r = 12/r for ranks 1..4 → ln f = ln 12 − ln r EXACTLY linear:
    // exponent 1, intercept ln 12, r² 1 (up to double round-off)
    val text = Seq("a" -> 12, "b" -> 6, "c" -> 4, "d" -> 3)
      .flatMap { case (t, n) => Seq.fill(n)(t) }.mkString(" ")
    // second group: a single token — zero x-variance, NULL fit
    val docs = Seq("en" -> text, "de" -> "einzig")
      .toDF("lang", "text")
    val out = TextOps.zipfFit(docs, col("lang"), topN = 1000)
      .collect().map(r => r.getString(0) -> r).toMap
    val en = out("en")
    assert(en.getLong(1) == 4L && en.getLong(2) == 4L)
    assert(math.abs(en.getDouble(3) - 1.0) < 1e-9, s"exponent ${en.getDouble(3)}")
    assert(math.abs(en.getDouble(4) - StrictMath.log(12.0)) < 1e-9)
    assert(math.abs(en.getDouble(5) - 1.0) < 1e-9, s"r2 ${en.getDouble(5)}")
    val de = out("de")
    assert(de.getLong(1) == 1L && de.getLong(2) == 1L)
    assert(de.isNullAt(3) && de.isNullAt(4) && de.isNullAt(5),
      "single-rank group has zero x-variance: NULL fit")
  }

  test("heapsFit recovers beta 0.5 on an exact V = sqrt(N) growth corpus") {
    // chunk = doc_id (shift 0); cum (N, V) at power-of-2 ranks 1, 2, 4 are
    // (4,2), (16,4), (64,8): ln V = 0.5 ln N exactly → beta ½, ln_k 0, r² 1
    val docs = Seq(
      0L -> "a a b b",                                    // +4 toks, +2 new
      1L -> ("c d " + Seq.fill(10)("a").mkString(" ")),   // +12, +2
      2L -> ("e f " + Seq.fill(22)("a").mkString(" ")),   // +24, +2 (rank 3)
      3L -> ("g h " + Seq.fill(22)("a").mkString(" "))    // +24, +2
    ).map { case (id, t) => ("en", id, t) }.toDF("lang", "doc_id", "text")
    val out = TextOps.heapsFit(docs, col("lang"), col("doc_id"),
      chunkShift = 0).collect().head
    assert(out.getLong(1) == 3L, "checkpoints at ranks 1, 2, 4")
    assert(out.getLong(2) == 64L && out.getLong(3) == 8L)
    assert(math.abs(out.getDouble(4) - 0.5) < 1e-9, s"beta ${out.getDouble(4)}")
    assert(math.abs(out.getDouble(5)) < 1e-9, s"ln_k ${out.getDouble(5)}")
    assert(math.abs(out.getDouble(6) - 1.0) < 1e-9, s"r2 ${out.getDouble(6)}")
  }

  test("heapsFit merges docs sharing a chunk before ranking") {
    val docs = Seq(0L -> "a b", 1L -> "c a", 2L -> "d e", 3L -> "a a")
      .map { case (id, t) => ("en", id, t) }.toDF("lang", "doc_id", "text")
    // shift 1: chunks {0,1}->0, {2,3}->1 — both ranks are powers of 2
    val out = TextOps.heapsFit(docs, col("lang"), col("doc_id"),
      chunkShift = 1).collect().head
    assert(out.getLong(1) == 2L, "two chunks, both checkpointed")
    assert(out.getLong(2) == 8L && out.getLong(3) == 5L)
    // two points define the line exactly: r² = 1
    assert(math.abs(out.getDouble(6) - 1.0) < 1e-12)
  }

  test("sourceDivergence matches hand-computed KL/JS/TV with eps fill") {
    // corpus: a×3, b×1 → q = (0.75, 0.25); X = "a a a" → p = (1, eps);
    // Y = "b" → p = (eps, 1)
    val docs = Seq("X" -> "a a a", "Y" -> "b").toDF("source", "text")
    val out = TextOps.sourceDivergence(docs, col("source"), topN = 10)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    val eps = 1e-4
    def ln(x: Double) = StrictMath.log(x)
    def kl(p: Seq[Double], q: Seq[Double]) =
      p.zip(q).map { case (a, b) => a * ln(a / b) }.foldLeft(0.0)(_ + _)
    def js(p: Seq[Double], q: Seq[Double]) =
      p.zip(q).map { case (a, b) =>
        val m = (a + b) / 2.0
        (a * ln(a / m) + b * ln(b / m)) / 2.0
      }.foldLeft(0.0)(_ + _)
    def tv(p: Seq[Double], q: Seq[Double]) =
      p.zip(q).map { case (a, b) => math.abs(a - b) }.foldLeft(0.0)(_ + _) / 2.0
    val qd = Seq(0.75, 0.25)
    val pX = Seq(1.0, eps); val pY = Seq(eps, 1.0)
    assert(out("X") == ((3L, kl(pX, qd), js(pX, qd), tv(pX, qd))),
      s"X got ${out("X")}")
    assert(out("Y") == ((1L, kl(pY, qd), js(pY, qd), tv(pY, qd))),
      s"Y got ${out("Y")}")
  }

  test("zipfFit caps the fit at topN but reports the full vocab size") {
    val text = Seq("a" -> 9, "b" -> 5, "c" -> 3, "d" -> 2, "e" -> 1)
      .flatMap { case (t, n) => Seq.fill(n)(t) }.mkString(" ")
    val docs = Seq("en" -> text).toDF("lang", "text")
    val out = TextOps.zipfFit(docs, col("lang"), topN = 3).collect().head
    assert(out.getLong(1) == 3L, "n_ranks capped at topN")
    assert(out.getLong(2) == 5L, "vocab_size is the full vocabulary")
  }

  test("invertedIndex: df/cf counts, ascending capped postings, minDf gate") {
    val docs = Seq(
      (1L, "a b a"),  // a twice here (cf counts repeats, df doesn't)
      (2L, "a c"),
      (3L, "c a"),
      (4L, "b")       // b: df=2 exactly at the gate
    ).toDF("doc_id", "text")
    val out = TextOps.invertedIndex(docs, minDf = 2L, postingCap = 2)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out("a") == ((3L, 4L, "1,2")), s"a got ${out("a")}")
    assert(out("b") == ((2L, 2L, "1,4")), s"b got ${out("b")}")
    assert(out("c") == ((2L, 2L, "2,3")), s"c got ${out("c")}")
    assert(out.size == 3, "no sub-minDf tokens survive")
  }

  test("pmiCollocations matches the hand-computed ln chain and ranking") {
    // corpus: "p q" x4 (perfectly associated) + "p r" x2 + "s t" x2
    val docs = (Seq.fill(4)("p q") ++ Seq.fill(2)("p r") ++ Seq.fill(2)("s t"))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val out = TextOps.pmiCollocations(docs, minCount = 2L, topN = 10)
      .collect()
      .map(r => (r.getString(1), r.getString(2)) ->
        ((r.getInt(0), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getDouble(6)))).toMap
    def ln(x: Double) = StrictMath.log(x)
    val (nu, nb) = (16.0, 8.0)
    def pmi(cxy: Double, cx: Double, cy: Double) =
      ln(cxy) - ln(nb) - ln(cx) + ln(nu) - ln(cy) + ln(nu)
    // s t: 2/8 joint vs (2/16)(2/16) -> pmi = ln(8); p q: ln(8/3); p r: ln(8/3)
    assert(out(("s", "t")) == ((1, 2L, 2L, 2L, pmi(2, 2, 2))),
      s"st got ${out(("s", "t"))}")
    assert(out(("p", "q")) == ((2, 4L, 6L, 4L, pmi(4, 6, 4))),
      s"pq got ${out(("p", "q"))}")
    assert(out(("p", "r")) == ((3, 2L, 6L, 2L, pmi(2, 6, 2))),
      s"pr got ${out(("p", "r"))}")
    assert(out.size == 3, "sub-minCount pairs dropped")
  }

  test("labelEval: confusion cells and p/r/f1 with absent-class NULLs") {
    val rows = Seq(
      ("a", "a"), ("a", "b"), ("a", "d"), ("b", "b"), ("c", "b")
    ).toDF("gold", "pred")
    val out = TextOps.labelEval(rows, col("gold"), col("pred"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), Option(r.get(6)).map(_.asInstanceOf[Double]),
          Option(r.get(7)).map(_.asInstanceOf[Double]),
          Option(r.get(8)).map(_.asInstanceOf[Double])))).toMap
    // a: support 3, predicted once, tp 1 -> p=1, r=1/3, f1=1/2
    assert(out("a") == ((3L, 1L, 1L, 0L, 2L, Some(1.0), Some(1.0 / 3.0),
      Some(2.0 * 1.0 * (1.0 / 3.0) / (1.0 + 1.0 / 3.0)))), s"a=${out("a")}")
    // b: support 1, predicted 3x, tp 1 -> p=1/3, r=1
    assert(out("b")._1 == 1L && out("b")._2 == 3L && out("b")._3 == 1L &&
      out("b")._6 == Some(1.0 / 3.0) && out("b")._7 == Some(1.0))
    // c: never predicted -> precision/f1 NULL, recall 0
    assert(out("c") == ((1L, 0L, 0L, 0L, 1L, None, Some(0.0), None)))
    // d: never a gold label -> recall/f1 NULL
    assert(out("d") == ((0L, 1L, 0L, 1L, 0L, Some(0.0), None, None)))
    assert(out.size == 4, "classes = gold UNION predicted")
  }

  test("knBigramLm: full-table continuation stats despite the output gate") {
    // bigrams: (a b) x3, (c b) x1, (a d) x1 -> with minCount=2 only (a b)
    // is EMITTED, but its statistics must still see the filtered-out rows:
    // c(a.) = 4, N1+(a.) = 2, N1+(.b) = 2, types = 3
    val docs = Seq(
      (1L, "a b"), (2L, "a b"), (3L, "a b"), (4L, "c b"), (5L, "a d")
    ).toDF("doc_id", "text")
    val out = TextOps.knBigramLm(docs, discount = 0.75, minCount = 2L)
      .collect()
    assert(out.length == 1, "only (a b) clears minCount")
    val r = out.head
    assert((r.getString(0), r.getString(1)) == (("a", "b")))
    assert((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)) ==
      ((3L, 4L, 2L, 2L)), "stats computed over the unfiltered bigram table")
    val expected = math.max(3.0 - 0.75, 0.0) / 4.0 +
      ((0.75 * 2.0) / 4.0) * (2.0 / 3.0)
    assert(r.getDouble(6) == expected, s"p_kn got ${r.getDouble(6)}")
  }
}
