package graft.kernel

/** Window classifiers for CLaP's cross-validated state prediction.
  *
  * The reference delegates this slot to external aeon classifiers
  * (`/root/reference/claspy/clap.py:189-209`); the CLaP/state-detection
  * logic itself never looks inside them. We provide:
  *   - [[NN1Classifier]]: a deterministic 1-nearest-neighbour classifier,
  *     implemented identically (operation-for-operation) in
  *     tools/gen_golden.py's aeon stub, so the ENTIRE merge loop is
  *     bit-comparable against the actual reference code under golden tests.
  *   - [[RocketClassifier]]: a from-scratch ROCKET-style classifier (random
  *     convolution kernels + ridge — Dempster et al. 2020, public method),
  *     the production default like the reference's `classifier="rocket"`.
  */
trait WindowClassifier extends Serializable {
  /** Fit on (xTrain, yTrain), predict labels for xTest. A fresh model per
    * call — mirrors the reference's per-fold `clf.fit(...).predict(...)`. */
  def fitPredict(xTrain: Array[Array[Double]], yTrain: Array[Int],
      xTest: Array[Array[Double]]): Array[Int]
  def name: String
}

/** Deterministic exact 1-NN on the flattened window vectors. Distance is the
  * squared Euclidean sum accumulated left-to-right over features (same FP
  * order as the numpy stub's per-feature `acc += d*d`), argmin takes the
  * FIRST minimum — so predictions are bit-identical across both sides. */
object NN1Classifier extends WindowClassifier {
  val name = "nn1"
  def fitPredict(xTrain: Array[Array[Double]], yTrain: Array[Int],
      xTest: Array[Array[Double]]): Array[Int] = {
    val out = new Array[Int](xTest.length)
    var q = 0
    while (q < xTest.length) {
      val row = xTest(q)
      var best = Double.PositiveInfinity
      var bestI = 0
      var i = 0
      while (i < xTrain.length) {
        val tr = xTrain(i)
        var s = 0.0
        var j = 0
        while (j < tr.length) { val d = tr(j) - row(j); s += d * d; j += 1 }
        if (s < best) { best = s; bestI = i }
        i += 1
      }
      out(q) = yTrain(bestI)
      q += 1
    }
    out
  }
}

/** ROCKET-style classifier: `nKernels` random 1-D convolution kernels
  * (length {7,9,11}, N(0,1) mean-centred weights, U(-1,1) bias, dyadic
  * dilation, 50% padding), two features per kernel (PPV = fraction of
  * positive activations, and max activation), ridge regression one-vs-rest
  * on standardized features. Deterministic for a fixed seed. */
final class RocketClassifier(nKernels: Int = 200, lambda: Double = 1.0,
    seed: Long = 2357L) extends WindowClassifier {
  val name = "rocket"

  private final case class Kernel(weights: Array[Double], bias: Double,
      dilation: Int, padding: Int)

  private def makeKernels(inputLen: Int): Array[Kernel] = {
    val rng = new java.util.Random(seed)
    Array.fill(nKernels) {
      val lens = Array(7, 9, 11).filter(_ <= math.max(2, inputLen))
      val l = if (lens.isEmpty) math.max(2, inputLen) else lens(rng.nextInt(lens.length))
      val w = Array.fill(l)(rng.nextGaussian())
      val mean = w.sum / l
      var i = 0
      while (i < l) { w(i) -= mean; i += 1 }
      val bias = rng.nextDouble() * 2.0 - 1.0
      val maxExp = math.max(0.0, math.log((inputLen - 1).toDouble / (l - 1)) / math.log(2.0))
      val dilation = math.pow(2.0, rng.nextDouble() * maxExp).toInt.max(1)
      val padding = if (rng.nextBoolean()) ((l - 1) * dilation) / 2 else 0
      Kernel(w, bias, dilation, padding)
    }
  }

  private def features(x: Array[Double], ks: Array[Kernel]): Array[Double] = {
    val out = new Array[Double](2 * ks.length)
    var ki = 0
    while (ki < ks.length) {
      val k = ks(ki)
      val l = k.weights.length
      val span = (l - 1) * k.dilation
      val start = -k.padding
      val end = x.length - 1 - span + k.padding
      var pos = 0; var cnt = 0; var mx = Double.NegativeInfinity
      var s = start
      while (s <= end) {
        var acc = k.bias
        var j = 0
        while (j < l) {
          val idx = s + j * k.dilation
          if (idx >= 0 && idx < x.length) acc += k.weights(j) * x(idx)
          j += 1
        }
        if (acc > 0) pos += 1
        if (acc > mx) mx = acc
        cnt += 1
        s += 1
      }
      out(2 * ki) = if (cnt > 0) pos.toDouble / cnt else 0.0
      out(2 * ki + 1) = if (cnt > 0) mx else 0.0
      ki += 1
    }
    out
  }

  def fitPredict(xTrain: Array[Array[Double]], yTrain: Array[Int],
      xTest: Array[Array[Double]]): Array[Int] = {
    if (xTrain.isEmpty || xTest.isEmpty) return new Array[Int](xTest.length)
    val classes = yTrain.distinct.sorted
    if (classes.length == 1) return Array.fill(xTest.length)(classes(0))
    val ks = makeKernels(xTrain(0).length)
    RidgeHead.fitPredict(xTrain.map(features(_, ks)), yTrain,
      xTest.map(features(_, ks)), lambda, classes)
  }
}

/** Shared one-vs-rest ridge classification head: standardize features by
  * train-set stats, solve (F^T F + lambda I) W = F^T Y with Y one-hot in
  * {-1, 1}, argmax the scores. Deterministic, allocation-bounded. */
private[kernel] object RidgeHead {

  /** Solve (A + lambda I) w = b for each rhs column by Gaussian elimination
    * with partial pivoting. A is symmetric positive semidefinite (F^T F). */
  private def ridgeSolve(a: Array[Array[Double]], b: Array[Array[Double]]): Array[Array[Double]] = {
    val n = a.length
    val m = b(0).length
    val aug = Array.tabulate(n)(i => a(i) ++ b(i))
    var col = 0
    while (col < n) {
      var piv = col
      var i = col + 1
      while (i < n) { if (math.abs(aug(i)(col)) > math.abs(aug(piv)(col))) piv = i; i += 1 }
      val t = aug(col); aug(col) = aug(piv); aug(piv) = t
      val d = aug(col)(col)
      if (math.abs(d) > 1e-12) {
        i = 0
        while (i < n) {
          if (i != col && aug(i)(col) != 0.0) {
            val f = aug(i)(col) / d
            var j = col
            while (j < n + m) { aug(i)(j) -= f * aug(col)(j); j += 1 }
          }
          i += 1
        }
      }
      col += 1
    }
    Array.tabulate(n) { i =>
      val d = aug(i)(i)
      Array.tabulate(m)(j => if (math.abs(d) > 1e-12) aug(i)(n + j) / d else 0.0)
    }
  }

  def fitPredict(fTrain: Array[Array[Double]], yTrain: Array[Int],
      fTest: Array[Array[Double]], lambda: Double, classes: Array[Int]): Array[Int] = {
    val nf = fTrain(0).length
    // standardize by train-set stats
    val mu = new Array[Double](nf)
    val sd = new Array[Double](nf)
    var j = 0
    while (j < nf) {
      var s = 0.0; var i = 0
      while (i < fTrain.length) { s += fTrain(i)(j); i += 1 }
      mu(j) = s / fTrain.length
      var v = 0.0; i = 0
      while (i < fTrain.length) { val d = fTrain(i)(j) - mu(j); v += d * d; i += 1 }
      sd(j) = math.sqrt(v / fTrain.length).max(1e-8)
      j += 1
    }
    def std(rows: Array[Array[Double]]): Array[Array[Double]] =
      rows.map(r => Array.tabulate(nf)(j => (r(j) - mu(j)) / sd(j)))
    val ft = std(fTrain)
    val fe = std(fTest)
    // ridge one-vs-rest: (F^T F + lambda I) W = F^T Y,  Y one-hot in {-1, 1}
    val gram = Array.ofDim[Double](nf, nf)
    var i = 0
    while (i < ft.length) {
      val r = ft(i)
      var a = 0
      while (a < nf) {
        val ra = r(a)
        if (ra != 0.0) {
          var b = a
          while (b < nf) { gram(a)(b) += ra * r(b); b += 1 }
        }
        a += 1
      }
      i += 1
    }
    var a = 0
    while (a < nf) {
      gram(a)(a) += lambda
      var b = 0
      while (b < a) { gram(a)(b) = gram(b)(a); b += 1 }
      a += 1
    }
    val rhs = Array.ofDim[Double](nf, classes.length)
    i = 0
    while (i < ft.length) {
      val r = ft(i)
      val ci = java.util.Arrays.binarySearch(classes, yTrain(i))
      var f = 0
      while (f < nf) {
        var c = 0
        while (c < classes.length) {
          rhs(f)(c) += r(f) * (if (c == ci) 1.0 else -1.0)
          c += 1
        }
        f += 1
      }
      i += 1
    }
    val w = ridgeSolve(gram, rhs)
    fe.map { r =>
      var bestC = 0; var bestS = Double.NegativeInfinity
      var c = 0
      while (c < classes.length) {
        var s = 0.0
        var f = 0
        while (f < nf) { s += r(f) * w(f)(c); f += 1 }
        if (s > bestS) { bestS = s; bestC = c }
        c += 1
      }
      classes(bestC)
    }
  }
}

/** QUANT-style interval-quantile classifier, written from scratch from the
  * public method (Dempster, Schmidt & Webb 2023, "QUANT: A Minimalist
  * Interval Method for Time Series Classification"): features are evenly
  * spaced quantiles over dyadic intervals of the window and of its first and
  * second differences. The classification head is the shared deterministic
  * ridge one-vs-rest (the paper uses extra-trees; ridge keeps this
  * dependency-free and seed-stable). No code counterpart in the reference —
  * claspy dispatches aeon's QUANTClassifier by name (clap.py:189-209). */
final class QuantClassifier(depth: Int = 4, div: Int = 4, lambda: Double = 1.0)
    extends WindowClassifier {
  val name = "quant"

  private def diff(x: Array[Double]): Array[Double] = {
    if (x.length <= 1) return Array.empty
    val out = new Array[Double](x.length - 1)
    var i = 0
    while (i < out.length) { out(i) = x(i + 1) - x(i); i += 1 }
    out
  }

  private def features(x: Array[Double]): Array[Double] = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[Double]
    var rep = x
    var r = 0
    while (r < 3) {
      val len = rep.length
      if (len > 0) {
        var d = 0
        while (d <= depth && (1 << d) <= len) {
          val nInt = 1 << d
          var i = 0
          while (i < nInt) {
            val start = (i.toLong * len / nInt).toInt
            val end = ((i + 1).toLong * len / nInt).toInt
            if (end > start) {
              val seg = java.util.Arrays.copyOfRange(rep, start, end)
              java.util.Arrays.sort(seg)
              val m = math.max(1, (seg.length + div - 1) / div)
              var j = 0
              while (j < m) {
                // linear-interpolated quantile at p = (j+1)/(m+1)
                val h = (seg.length - 1).toDouble * (j + 1) / (m + 1)
                val lo = h.toInt
                val hi = math.min(lo + 1, seg.length - 1)
                buf += seg(lo) + (h - lo) * (seg(hi) - seg(lo))
                j += 1
              }
            }
            i += 1
          }
          d += 1
        }
      }
      rep = diff(rep)
      r += 1
    }
    buf.toArray
  }

  def fitPredict(xTrain: Array[Array[Double]], yTrain: Array[Int],
      xTest: Array[Array[Double]]): Array[Int] = {
    if (xTrain.isEmpty || xTest.isEmpty) return new Array[Int](xTest.length)
    val classes = yTrain.distinct.sorted
    if (classes.length == 1) return Array.fill(xTest.length)(classes(0))
    RidgeHead.fitPredict(xTrain.map(features), yTrain, xTest.map(features), lambda, classes)
  }
}

/** Dictionary (bag-of-SFA-words) classifier, from scratch from the public
  * SAX/BOSS method (Lin et al. 2007 SAX; Schäfer 2015 BOSS — the family
  * behind aeon's WEASEL slot in clap.py:189-209): z-normalize sliding
  * sub-windows, PAA them into `wordLen` segment means, quantize each by the
  * standard-normal quartile breakpoints into `alphabet` symbols, and count
  * word histograms as features for the shared ridge head. Two sub-window
  * lengths give a multi-resolution bag. Deterministic (no RNG). */
final class BossClassifier(subLens: Array[Int] = Array(8, 16), wordLen: Int = 4,
    lambda: Double = 1.0) extends WindowClassifier {
  val name = "boss"
  private val alphabet = 4
  private val breaks = Array(-0.6744897501960817, 0.0, 0.6744897501960817)
  private val nWords = {
    var p = 1; var i = 0
    while (i < wordLen) { p *= alphabet; i += 1 }
    p
  }

  private def features(x: Array[Double]): Array[Double] = {
    val out = new Array[Double](subLens.length * nWords)
    var li = 0
    while (li < subLens.length) {
      val L = math.min(subLens(li), x.length)
      if (L >= wordLen) {
        val base = li * nWords
        var s = 0
        while (s + L <= x.length) {
          // z-norm the sub-window
          var mu = 0.0; var j = 0
          while (j < L) { mu += x(s + j); j += 1 }
          mu /= L
          var v = 0.0; j = 0
          while (j < L) { val d = x(s + j) - mu; v += d * d; j += 1 }
          val sd = math.sqrt(v / L).max(1e-12)
          // PAA into wordLen segment means, quantize by gaussian quartiles
          var word = 0
          var seg = 0
          while (seg < wordLen) {
            val a = s + seg * L / wordLen
            val b = s + (seg + 1) * L / wordLen
            var m = 0.0; j = a
            while (j < b) { m += x(j); j += 1 }
            m = ((m / math.max(b - a, 1)) - mu) / sd
            var sym = 0
            while (sym < breaks.length && m > breaks(sym)) sym += 1
            word = word * alphabet + sym
            seg += 1
          }
          out(base + word) += 1.0
          s += 1
        }
      }
      li += 1
    }
    out
  }

  def fitPredict(xTrain: Array[Array[Double]], yTrain: Array[Int],
      xTest: Array[Array[Double]]): Array[Int] = {
    if (xTrain.isEmpty || xTest.isEmpty) return new Array[Int](xTest.length)
    val classes = yTrain.distinct.sorted
    if (classes.length == 1) return Array.fill(xTest.length)(classes(0))
    RidgeHead.fitPredict(xTrain.map(features), yTrain, xTest.map(features), lambda, classes)
  }
}

object WindowClassifier {
  /** Dispatch mirroring `map`-style string config (clap.py:189-209). "dummy"
    * aliases the deterministic 1-NN: the golden harness substitutes the same
    * 1-NN for the external aeon classifier on the Python side, so this name
    * is the exact-parity path; "rocket" is the production default; "quant"
    * (interval-quantile) and "boss" (dictionary) are the alternatives. */
  def byName(name: String): WindowClassifier = name match {
    case "nn1" | "dummy" => NN1Classifier
    case "rocket" => new RocketClassifier()
    case "quant" => new QuantClassifier()
    case "boss" => new BossClassifier()
    case other => throw new IllegalArgumentException(
      s"The classifier $other is not supported. Implementations include: nn1, dummy, rocket, quant, boss")
  }
}
