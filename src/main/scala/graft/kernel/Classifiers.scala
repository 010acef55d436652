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

/** WEASEL-style word-frequency classifier, from scratch from the public
  * method (Schäfer & Leser 2017, "Fast and Accurate Time Series
  * Classification with WEASEL"): sliding sub-windows at several lengths are
  * Fourier-transformed, the first complex DFT coefficients are quantized
  * into an SFA word per window, and word-frequency histograms feed the
  * shared ridge head. Simplifications vs the paper (which targets long
  * series): fixed Gaussian-quantile bins instead of per-coefficient MCB
  * training, no bigrams, no chi-squared selection — the windows CLaP feeds
  * are ~10 points, where the full machinery is overkill. Deterministic.
  * Fills the `weasel` slot of clap.py:195-197. */
final class WeaselClassifier(subLens: Array[Int] = Array(4, 6, 8),
    nCoefs: Int = 2, lambda: Double = 1.0) extends WindowClassifier {
  val name = "weasel"
  private val alphabet = 4
  private val breaks = Array(-0.6744897501960817, 0.0, 0.6744897501960817)
  private val symbolsPerWord = nCoefs * 2 // real + imag per kept coefficient
  private val nWords = {
    var p = 1; var i = 0
    while (i < symbolsPerWord) { p *= alphabet; i += 1 }
    p
  }

  private def features(x: Array[Double]): Array[Double] = {
    val out = new Array[Double](subLens.length * nWords)
    var li = 0
    while (li < subLens.length) {
      val L = math.min(subLens(li), x.length)
      if (L >= 2) {
        val base = li * nWords
        var s = 0
        while (s + L <= x.length) {
          // z-norm the sub-window so the fixed bins are calibrated
          var mu = 0.0; var j = 0
          while (j < L) { mu += x(s + j); j += 1 }
          mu /= L
          var v = 0.0; j = 0
          while (j < L) { val d = x(s + j) - mu; v += d * d; j += 1 }
          val sd = math.sqrt(v / L).max(1e-12)
          // first nCoefs non-DC DFT coefficients of the z-normed window
          var word = 0
          var k = 1
          while (k <= nCoefs) {
            var re = 0.0; var im = 0.0
            j = 0
            while (j < L) {
              val z = (x(s + j) - mu) / sd
              val ang = -2.0 * math.Pi * k * j / L
              re += z * math.cos(ang)
              im += z * math.sin(ang)
              j += 1
            }
            // scale to unit-ish variance before binning
            val norm = math.sqrt(L / 2.0)
            for (c <- Array(re / norm, im / norm)) {
              var sym = 0
              while (sym < breaks.length && c > breaks(sym)) sym += 1
              word = word * alphabet + sym
            }
            k += 1
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

/** RDST-style random dilated shapelet classifier, from scratch from the
  * public method (Guillaume, Vrain & Elloumi 2022, "Random Dilated Shapelet
  * Transform"): shapelets are sampled from the TRAINING windows (fixed seed
  * + train-set-size-derived stream, so a fresh draw per fold like the
  * paper's fit), each contributing three features per test window — min
  * z-normalized distance, argmin position, and occurrence count under a
  * threshold — into the shared ridge head. Fills the `rdst` slot of
  * clap.py:199-201. */
final class RdstClassifier(nShapelets: Int = 100, lambda: Double = 1.0,
    seed: Long = 4217L) extends WindowClassifier {
  val name = "rdst"

  private final case class Shapelet(vals: Array[Double], dilation: Int, threshold: Double)

  /** z-normalized values of `x[start, start + len*dil)` at stride `dil`. */
  private def slice(x: Array[Double], start: Int, len: Int, dil: Int): Array[Double] = {
    val out = new Array[Double](len)
    var i = 0
    while (i < len) { out(i) = x(start + i * dil); i += 1 }
    var mu = 0.0; i = 0
    while (i < len) { mu += out(i); i += 1 }
    mu /= len
    var v = 0.0; i = 0
    while (i < len) { val d = out(i) - mu; v += d * d; i += 1 }
    val sd = math.sqrt(v / len).max(1e-12)
    i = 0
    while (i < len) { out(i) = (out(i) - mu) / sd; i += 1 }
    out
  }

  /** (minDist, argminPos, occurrences under threshold) of shapelet in x. */
  private def transform(x: Array[Double], sh: Shapelet): (Double, Double, Double) = {
    val len = sh.vals.length
    val span = (len - 1) * sh.dilation + 1
    if (span > x.length) return (0.0, 0.0, 0.0)
    val nPos = x.length - span + 1
    var best = Double.PositiveInfinity
    var bestP = 0
    var occ = 0.0
    var p = 0
    while (p < nPos) {
      val w = slice(x, p, len, sh.dilation)
      var d = 0.0; var i = 0
      while (i < len) { val t = w(i) - sh.vals(i); d += t * t; i += 1 }
      if (d < best) { best = d; bestP = p }
      if (d < sh.threshold) occ += 1.0
      p += 1
    }
    (best, bestP.toDouble / math.max(nPos - 1, 1), occ)
  }

  def fitPredict(xTrain: Array[Array[Double]], yTrain: Array[Int],
      xTest: Array[Array[Double]]): Array[Int] = {
    if (xTrain.isEmpty || xTest.isEmpty) return new Array[Int](xTest.length)
    val classes = yTrain.distinct.sorted
    if (classes.length == 1) return Array.fill(xTest.length)(classes(0))
    val wlen = xTrain(0).length
    val rng = new java.util.Random(seed + xTrain.length * 31 + wlen)
    // windows shorter than 3 would leave the filter empty (nextInt(0)
    // throws) — fall back to a degenerate shapelet no longer than the
    // window itself (wlen=1 must yield length 1, not 2), like
    // RocketClassifier's short-input guard
    val lens0 = Array(3, 5, 7).filter(_ <= wlen)
    val lens = if (lens0.isEmpty) Array(math.min(3, math.max(1, wlen))) else lens0
    val shapelets = Array.fill(nShapelets) {
      val len = lens(rng.nextInt(lens.length))
      val maxDil = math.max((wlen - 1) / math.max(len - 1, 1), 1)
      val dil = 1 + rng.nextInt(math.min(maxDil, 2))
      val span = (len - 1) * dil + 1
      val src = xTrain(rng.nextInt(xTrain.length))
      val start = rng.nextInt(math.max(src.length - span + 1, 1))
      val vals = slice(src, start, len, dil)
      // occurrence threshold calibrated on one other random train window
      val other = xTrain(rng.nextInt(xTrain.length))
      val probe = transform(other, Shapelet(vals, dil, Double.PositiveInfinity))._1
      Shapelet(vals, dil, math.max(probe, 1e-6))
    }
    def feats(x: Array[Double]): Array[Double] = {
      val out = new Array[Double](shapelets.length * 3)
      var i = 0
      while (i < shapelets.length) {
        val (d, p, o) = transform(x, shapelets(i))
        out(i * 3) = d; out(i * 3 + 1) = p; out(i * 3 + 2) = o
        i += 1
      }
      out
    }
    RidgeHead.fitPredict(xTrain.map(feats), yTrain, xTest.map(feats), lambda, classes)
  }
}

/** FreshPRINCE-style summary-feature classifier, from scratch from the
  * public method (Middlehurst & Bagnall 2022, "The FreshPRINCE: A Simple
  * Transformation-Based Pipeline"): a tsfresh-like panel of statistical
  * features per window (moments, quantiles, trend slope, mean-crossings,
  * autocorrelations, strike lengths, binned entropy, energy) into the
  * shared ridge head (the paper uses rotation forest; ridge keeps it
  * dependency-free and deterministic). Fills the `freshprince` slot of
  * clap.py:203-205. */
final class FreshPrinceClassifier(lambda: Double = 1.0) extends WindowClassifier {
  val name = "freshprince"

  private def features(x: Array[Double]): Array[Double] = {
    val n = x.length
    val buf = new scala.collection.mutable.ArrayBuffer[Double](32)
    var mu = 0.0; var i = 0
    while (i < n) { mu += x(i); i += 1 }
    mu /= n
    var m2 = 0.0; var m3 = 0.0; var m4 = 0.0
    i = 0
    while (i < n) {
      val d = x(i) - mu; val d2 = d * d
      m2 += d2; m3 += d2 * d; m4 += d2 * d2
      i += 1
    }
    val variance = m2 / n
    val sd = math.sqrt(variance).max(1e-12)
    buf += mu += sd
    buf += m3 / n / (sd * sd * sd)                  // skewness
    buf += m4 / n / (variance * variance).max(1e-24) // kurtosis
    val sorted = x.clone(); java.util.Arrays.sort(sorted)
    buf += sorted(0) += sorted(n - 1)
    for (q <- Array(0.1, 0.25, 0.5, 0.75, 0.9)) {
      val h = (n - 1) * q
      val lo = h.toInt; val hi = math.min(lo + 1, n - 1)
      buf += sorted(lo) + (h - lo) * (sorted(hi) - sorted(lo))
    }
    // linear trend slope over index
    val tMean = (n - 1) / 2.0
    var sxy = 0.0; var sxx = 0.0
    i = 0
    while (i < n) { sxy += (i - tMean) * (x(i) - mu); sxx += (i - tMean) * (i - tMean); i += 1 }
    buf += (if (sxx > 0) sxy / sxx else 0.0)
    // mean abs change + mean-crossings
    var mac = 0.0; var crossings = 0.0
    i = 1
    while (i < n) {
      mac += math.abs(x(i) - x(i - 1))
      if ((x(i) - mu) * (x(i - 1) - mu) < 0) crossings += 1
      i += 1
    }
    buf += mac / math.max(n - 1, 1) += crossings
    // autocorrelation at small lags
    for (lag <- Array(1, 2, 3, 5)) {
      var s = 0.0
      if (lag < n) {
        i = lag
        while (i < n) { s += (x(i) - mu) * (x(i - lag) - mu); i += 1 }
        s /= m2.max(1e-24)
      }
      buf += s
    }
    // count above mean + longest strike above mean + energy
    var above = 0.0; var strike = 0; var maxStrike = 0
    i = 0
    while (i < n) {
      if (x(i) > mu) { above += 1; strike += 1; if (strike > maxStrike) maxStrike = strike }
      else strike = 0
      i += 1
    }
    buf += above += maxStrike.toDouble
    var energy = 0.0
    i = 0
    while (i < n) { energy += x(i) * x(i); i += 1 }
    buf += energy
    // binned entropy (8 equal-width bins over [min, max])
    val lo = sorted(0); val range = (sorted(n - 1) - lo).max(1e-12)
    val bins = new Array[Int](8)
    i = 0
    while (i < n) {
      bins(math.min(((x(i) - lo) / range * 8).toInt, 7)) += 1
      i += 1
    }
    var ent = 0.0
    for (b <- bins) if (b > 0) { val p = b.toDouble / n; ent -= p * math.log(p) }
    buf += ent
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

/** Hydra-style competing-kernel dictionary classifier, from scratch from the
  * public method (Dempster, Schmidt & Webb 2023, "Hydra: Competing
  * convolutional kernels for fast and accurate time series classification"):
  * groups of random N(0,1) kernels compete at every timestep — the winner's
  * count (hard) and winning activation (soft) are accumulated per kernel,
  * per dilation — and the count vectors feed the shared ridge head. Fills
  * the `mrhydra` slot of clap.py:191-193 (MultiRocketHydra's Hydra half;
  * the Rocket half is [[RocketClassifier]]). Deterministic for a fixed seed. */
final class HydraClassifier(nGroups: Int = 16, groupSize: Int = 8,
    kernelLen: Int = 5, lambda: Double = 1.0, seed: Long = 7919L)
    extends WindowClassifier {
  val name = "mrhydra"

  private def makeKernels(rng: java.util.Random): Array[Array[Array[Double]]] =
    Array.fill(nGroups, groupSize) {
      val w = Array.fill(kernelLen)(rng.nextGaussian())
      var mu = 0.0; var i = 0
      while (i < kernelLen) { mu += w(i); i += 1 }
      mu /= kernelLen
      i = 0
      while (i < kernelLen) { w(i) -= mu; i += 1 }
      w
    }

  def fitPredict(xTrain: Array[Array[Double]], yTrain: Array[Int],
      xTest: Array[Array[Double]]): Array[Int] = {
    if (xTrain.isEmpty || xTest.isEmpty) return new Array[Int](xTest.length)
    val classes = yTrain.distinct.sorted
    if (classes.length == 1) return Array.fill(xTest.length)(classes(0))
    val wlen = xTrain(0).length
    val kLen = math.min(kernelLen, wlen)
    val rng = new java.util.Random(seed)
    val kernels = makeKernels(rng)
    val dilations = Array(1, 2).filter(d => (kLen - 1) * d + 1 <= wlen)
    val nf = nGroups * groupSize * dilations.length * 2
    def feats(x: Array[Double]): Array[Double] = {
      val out = new Array[Double](nf)
      var di = 0
      while (di < dilations.length) {
        val dil = dilations(di)
        val span = (kLen - 1) * dil + 1
        val nPos = x.length - span + 1
        var g = 0
        while (g < nGroups) {
          val base = (di * nGroups + g) * groupSize * 2
          var p = 0
          while (p < nPos) {
            var bestK = 0; var bestA = Double.NegativeInfinity
            var k = 0
            while (k < groupSize) {
              val w = kernels(g)(k)
              var a = 0.0; var i = 0
              while (i < kLen) { a += w(i) * x(p + i * dil); i += 1 }
              if (a > bestA) { bestA = a; bestK = k }
              k += 1
            }
            out(base + bestK * 2) += 1.0        // hard count of wins
            out(base + bestK * 2 + 1) += bestA  // soft sum of winning activations
            p += 1
          }
          g += 1
        }
        di += 1
      }
      out
    }
    RidgeHead.fitPredict(xTrain.map(feats), yTrain, xTest.map(feats), lambda, classes)
  }
}

/** Proximity-forest-style elastic-distance tree ensemble, from scratch from
  * the public method (Lucas et al. 2019, "Proximity Forest: an effective and
  * scalable distance-based classifier"): each tree node draws one random
  * exemplar per class and a random distance measure (squared Euclidean,
  * constrained DTW, or derivative DTW), routes series to the nearest
  * exemplar's branch, and recurses until purity; the forest votes. Fills
  * the `proximityforest` slot of clap.py:201-203. Deterministic for a fixed
  * seed. Tree count is modest — CLaP calls fitPredict once per CV fold. */
final class ProximityForestClassifier(nTrees: Int = 5, maxDepth: Int = 8,
    seed: Long = 6131L) extends WindowClassifier {
  val name = "proximityforest"

  private def sqEuclid(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  /** Sakoe-Chiba-banded DTW on the raw values (band = 20% of length). */
  private def dtw(a: Array[Double], b: Array[Double]): Double = {
    val n = a.length; val m = b.length
    val band = math.max(math.max(n, m) / 5, 1)
    val prev = Array.fill(m + 1)(Double.PositiveInfinity)
    val cur = new Array[Double](m + 1)
    prev(0) = 0.0
    var i = 1
    while (i <= n) {
      java.util.Arrays.fill(cur, Double.PositiveInfinity)
      var j = math.max(1, i - band)
      val jEnd = math.min(m, i + band)
      while (j <= jEnd) {
        val d = a(i - 1) - b(j - 1)
        val best = math.min(prev(j), math.min(prev(j - 1), cur(j - 1)))
        cur(j) = d * d + best
        j += 1
      }
      System.arraycopy(cur, 0, prev, 0, m + 1)
      i += 1
    }
    prev(m)
  }

  private def derive(x: Array[Double]): Array[Double] = {
    // Keogh derivative: ((x[i]-x[i-1]) + (x[i+1]-x[i-1])/2) / 2
    if (x.length < 3) return x.clone()
    val out = new Array[Double](x.length - 2)
    var i = 1
    while (i < x.length - 1) {
      out(i - 1) = ((x(i) - x(i - 1)) + (x(i + 1) - x(i - 1)) / 2.0) / 2.0
      i += 1
    }
    out
  }

  private def dist(measure: Int, a: Array[Double], b: Array[Double]): Double =
    measure match {
      case 0 => sqEuclid(a, b)
      case 1 => dtw(a, b)
      case _ => dtw(derive(a), derive(b))
    }

  private final class Node {
    var label: Int = -1 // leaf label, or -1 for internal
    var measure: Int = 0
    var exemplars: Array[Array[Double]] = _
    var children: Array[Node] = _
  }

  private def build(idx: Array[Int], x: Array[Array[Double]], y: Array[Int],
      depth: Int, rng: java.util.Random): Node = {
    val node = new Node
    val first = y(idx(0))
    var pure = true
    var i = 1
    while (i < idx.length && pure) { if (y(idx(i)) != first) pure = false; i += 1 }
    if (pure || depth >= maxDepth || idx.length < 2) {
      // leaf: majority label (first-seen tie-break for determinism)
      val counts = scala.collection.mutable.LinkedHashMap.empty[Int, Int]
      for (j <- idx) counts(y(j)) = counts.getOrElse(y(j), 0) + 1
      node.label = counts.maxBy(_._2)._1
      return node
    }
    node.measure = rng.nextInt(3)
    // one random exemplar per class present at this node
    val byClass = scala.collection.mutable.LinkedHashMap.empty[Int, scala.collection.mutable.ArrayBuffer[Int]]
    for (j <- idx) byClass.getOrElseUpdate(y(j), scala.collection.mutable.ArrayBuffer.empty) += j
    val exIdx = byClass.valuesIterator.map(c => c(rng.nextInt(c.length))).toArray
    node.exemplars = exIdx.map(x(_))
    val parts = Array.fill(exIdx.length)(scala.collection.mutable.ArrayBuffer.empty[Int])
    for (j <- idx) {
      var bestE = 0; var bestD = Double.PositiveInfinity
      var e = 0
      while (e < node.exemplars.length) {
        val d = dist(node.measure, x(j), node.exemplars(e))
        if (d < bestD) { bestD = d; bestE = e }
        e += 1
      }
      parts(bestE) += j
    }
    if (parts.count(_.nonEmpty) < 2) {
      // split failed to separate: fall back to a majority leaf
      val counts = scala.collection.mutable.LinkedHashMap.empty[Int, Int]
      for (j <- idx) counts(y(j)) = counts.getOrElse(y(j), 0) + 1
      node.label = counts.maxBy(_._2)._1
      return node
    }
    node.children = parts.map { p =>
      if (p.isEmpty) {
        val leaf = new Node; leaf.label = first; leaf
      } else build(p.toArray, x, y, depth + 1, rng)
    }
    node
  }

  private def predictOne(node: Node, x: Array[Double]): Int = {
    var cur = node
    while (cur.label < 0) {
      var bestE = 0; var bestD = Double.PositiveInfinity
      var e = 0
      while (e < cur.exemplars.length) {
        val d = dist(cur.measure, x, cur.exemplars(e))
        if (d < bestD) { bestD = d; bestE = e }
        e += 1
      }
      cur = cur.children(bestE)
    }
    cur.label
  }

  def fitPredict(xTrain: Array[Array[Double]], yTrain: Array[Int],
      xTest: Array[Array[Double]]): Array[Int] = {
    if (xTrain.isEmpty || xTest.isEmpty) return new Array[Int](xTest.length)
    val classes = yTrain.distinct.sorted
    if (classes.length == 1) return Array.fill(xTest.length)(classes(0))
    val rng = new java.util.Random(seed + xTrain.length * 31 + xTrain(0).length)
    val trees = Array.fill(nTrees)(
      build(Array.range(0, xTrain.length), xTrain, yTrain, 0, rng))
    xTest.map { row =>
      val votes = scala.collection.mutable.LinkedHashMap.empty[Int, Int]
      for (t <- trees) {
        val p = predictOne(t, row)
        votes(p) = votes.getOrElse(p, 0) + 1
      }
      // majority vote; ties broken by smallest class label for determinism
      val maxV = votes.valuesIterator.max
      votes.collect { case (c, v) if v == maxV => c }.min
    }
  }
}

object WindowClassifier {
  /** Dispatch mirroring `map`-style string config (clap.py:189-209). "dummy"
    * aliases the deterministic 1-NN: the golden harness substitutes the same
    * 1-NN for the external aeon classifier on the Python side, so this name
    * is the exact-parity path; "rocket" is the production default; the rest
    * fill the reference's aeon slots with from-scratch implementations of
    * the same public methods (quant = interval quantiles, boss = SAX
    * dictionary, weasel = SFA word frequencies, rdst = random dilated
    * shapelets, freshprince = tsfresh-style summary features, mrhydra =
    * competing convolution kernels). Unsupported names throw, matching the
    * reference's ValueError (clap.py:209). */
  def byName(name: String): WindowClassifier = name match {
    case "nn1" | "dummy" => NN1Classifier
    case "rocket" => new RocketClassifier()
    case "quant" => new QuantClassifier()
    case "boss" => new BossClassifier()
    case "weasel" => new WeaselClassifier()
    case "rdst" => new RdstClassifier()
    case "freshprince" => new FreshPrinceClassifier()
    case "mrhydra" => new HydraClassifier()
    case "proximityforest" => new ProximityForestClassifier()
    case "inception" =>
      // The reference's 9th grid slot (clap.py:206-208) lazily imports an
      // InceptionTime deep CNN from an external deep-learning package. A
      // from-scratch GPU-less CNN training loop is deliberately out of
      // scope for this engine (SURVEY §7): the slot is a RECORDED exclusion,
      // not a gap — mirroring the reference, which also fails at use time
      // when its optional dependency is absent.
      throw new UnsupportedOperationException(
        "The 'inception' classifier (InceptionTime deep CNN) is " +
          "intentionally not implemented: the reference fills this slot by " +
          "lazily importing an external deep-learning framework, and a " +
          "from-scratch neural-network training stack is out of scope for " +
          "this engine. Use one of the 8 implemented grid classifiers: " +
          "nn1, rocket, quant, boss, weasel, rdst, freshprince, mrhydra " +
          "(or proximityforest).")
    case other => throw new IllegalArgumentException(
      s"The classifier $other is not supported. Implementations include: " +
        "nn1, dummy, rocket, quant, boss, weasel, rdst, freshprince, " +
        "mrhydra, proximityforest")
  }
}
