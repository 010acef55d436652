package graft.kernel

/** Window-size learning methods.
  *
  * Semantics follow `/root/reference/claspy/window_size.py`:
  * suss (:51-128 — min-max normalisation, exponential + binary search over the
  * normalised SuSS score with threshold .89, returning 2*lbound; _suss_score
  * :12-48 drops the first `window_size` rolling rows, replicating the pandas
  * `[window_size:]` slice which also discards the first *valid* window),
  * dominant_fourier_frequency (:131-175) and highest_autocorrelation
  * (:178-216 — FFT-free direct autocovariance, same values as statsmodels
  * `acf(fft=True)`, plus a scipy-style plateau-aware local-maxima finder).
  */
object WindowSize {

  def byName(name: String): Array[Double] => Int = name match {
    case "suss" => ts => suss(ts)
    case "fft" => ts => dominantFourierFrequency(ts)
    case "acf" => ts => highestAutocorrelation(ts)
    case other => throw new IllegalArgumentException(
      s"$other is not a valid window size method. Implementations include: suss, fft, acf")
  }

  /** SuSS score for one window size over a [0,1]-normalised series.
    * Positions w..n-1 (pandas rolling + `[w:]` slice), window = [i-w+1, i]. */
  private def sussScore(ts: Array[Double], w: Int, tsMean: Double, tsStd: Double, tsMinMax: Double): Double = {
    val n = ts.length
    if (w >= n) return Double.NaN // pandas slice [w:] would be empty -> np.mean(empty)=NaN
    var total = 0.0
    var cnt = 0
    var i = w
    while (i < n) {
      // window [i-w+1, i]
      var sum = 0.0; var mn = Double.PositiveInfinity; var mx = Double.NegativeInfinity
      var j = i - w + 1
      while (j <= i) {
        val v = ts(j)
        sum += v
        if (v < mn) mn = v
        if (v > mx) mx = v
        j += 1
      }
      val mean = sum / w
      var sq = 0.0
      j = i - w + 1
      while (j <= i) { val e = ts(j) - mean; sq += e * e; j += 1 }
      val std = math.sqrt(sq / w) // ddof=0
      val dm = mean - tsMean
      val ds = std - tsStd
      val dr = (mx - mn) - tsMinMax
      total += math.sqrt(dm * dm + ds * ds + dr * dr) / math.sqrt(w.toDouble)
      cnt += 1
      i += 1
    }
    if (cnt == 0) Double.NaN else total / cnt
  }

  /** window_size.py:51-128. */
  def suss(tsIn: Array[Double], lboundIn: Int = 10, threshold: Double = 0.89): Int = {
    val n = tsIn.length
    if (n < lboundIn) return n
    var mn = Double.PositiveInfinity; var mx = Double.NegativeInfinity
    var i = 0
    while (i < n) { val v = tsIn(i); if (v < mn) mn = v; if (v > mx) mx = v; i += 1 }
    if (mn == mx) return lboundIn
    val ts = new Array[Double](n)
    i = 0
    while (i < n) { ts(i) = (tsIn(i) - mn) / (mx - mn); i += 1 }

    var sum = 0.0
    i = 0
    while (i < n) { sum += ts(i); i += 1 }
    val tsMean = sum / n
    var sq = 0.0
    i = 0
    while (i < n) { val e = ts(i) - tsMean; sq += e * e; i += 1 }
    val tsStd = math.sqrt(sq / n)
    val tsMinMax = 1.0 // max - min after normalisation

    val maxScore = sussScore(ts, 1, tsMean, tsStd, tsMinMax)
    val minScore = sussScore(ts, n - 1, tsMean, tsStd, tsMinMax)
    if (minScore == maxScore) return lboundIn

    @inline def normScore(w: Int): Double =
      1.0 - (sussScore(ts, w, tsMean, tsStd, tsMinMax) - minScore) / (maxScore - minScore)

    // exponential search (window_size.py:100-112); guarded against the
    // reference's potential infinite loop when the score never crosses
    var exp = 0
    var found = false
    while (!found) {
      val w = 1 << exp
      if (w >= n) { found = true } // safety deviation; reference would hang
      else if (w < lboundIn) exp += 1
      else if (normScore(w) > threshold) found = true
      else exp += 1
    }

    var lbound = math.max(lboundIn, 1 << math.max(0, exp - 1))
    var ubound = (1 << exp) + 1

    // binary search (window_size.py:117-126); NaN score -> break (matches
    // Python, where NaN fails both < and > comparisons)
    var break_ = false
    while (!break_ && lbound <= ubound) {
      val w = (lbound + ubound) / 2
      val score = normScore(w)
      if (score < threshold) lbound = w + 1
      else if (score > threshold) ubound = w - 1
      else break_ = true
    }
    2 * lbound
  }

  /** window_size.py:131-175. */
  def dominantFourierFrequency(ts: Array[Double], lbound: Int = 10, ubound: Int = 1000): Int = {
    val n = ts.length
    if (n < 2 * lbound) return n
    val (re, im) = FFTOps.fft(ts, new Array[Double](n))
    var bestMag = Double.NegativeInfinity
    var bestWs = -1
    // positive fftfreq indices: k = 1 .. ceil(n/2)-1 (even n: n/2 maps to -0.5)
    val kMax = (n + 1) / 2
    var k = 1
    while (k < kMax) {
      if (re(k) != 0.0 || im(k) != 0.0) {
        val freq = k.toDouble / n
        val ws = (1.0 / freq).toInt
        if (ws >= lbound && ws < ubound) {
          val mag = math.sqrt(re(k) * re(k) + im(k) * im(k))
          if (mag > bestMag) { bestMag = mag; bestWs = ws }
        }
      }
      k += 1
    }
    if (bestWs < 0) lbound else bestWs
  }

  /** window_size.py:178-216 — acf (statsmodels semantics) + peak argmax. */
  def highestAutocorrelation(ts: Array[Double], lbound: Int = 10, ubound: Int = 1000): Int = {
    val n = ts.length
    if (n < lbound) return n
    val nlags = (n / 2.0).toInt
    val acf = new Array[Double](nlags + 1)
    var mean = 0.0
    var i = 0
    while (i < n) { mean += ts(i); i += 1 }
    mean /= n
    var lag = 0
    while (lag <= nlags) {
      var s = 0.0
      var t = 0
      while (t < n - lag) { s += (ts(t) - mean) * (ts(t + lag) - mean); t += 1 }
      acf(lag) = s / n
      lag += 1
    }
    val c0 = acf(0)
    i = 0
    while (i <= nlags) { acf(i) /= c0; i += 1 }

    val peaks = findPeaks(acf)
    var bestCorr = Double.NegativeInfinity
    var bestPeak = -1
    for (p <- peaks if p >= lbound && p < ubound) {
      if (acf(p) > bestCorr) { bestCorr = acf(p); bestPeak = p }
    }
    if (bestPeak < 0) lbound else bestPeak
  }

  /** scipy.signal.find_peaks default semantics: strict local maxima; a flat
    * plateau peaks at its floor-midpoint. */
  def findPeaks(x: Array[Double]): Array[Int] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    val n = x.length
    val iMax = n - 1
    var i = 1
    while (i < iMax) {
      if (x(i - 1) < x(i)) {
        var iAhead = i + 1
        while (iAhead < iMax && x(iAhead) == x(i)) iAhead += 1
        if (x(iAhead) < x(i)) {
          out += (i + iAhead - 1) / 2
          i = iAhead
        }
      }
      i += 1
    }
    out.toArray
  }
}
