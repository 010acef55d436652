package graft.kernel

/** Change-point validation tests.
  *
  * Semantics follow `/root/reference/claspy/validation.py`:
  * _rank_binary_data (:7-40, closed-form average ranks for a binary vector),
  * _rank_sums_test (:43-77, two-sided Wilcoxon rank-sum z + p via the normal
  * survival function), significance_test (:80-108, threshold 1e-15 default)
  * and score_threshold (:111-130, threshold 0.75 default).
  */
object Validation {

  /** erf via Taylor series (|x| < 2) and continued fraction (|x| >= 2);
    * ~1e-15 relative accuracy, matching scipy's Cephes ndtr closely. */
  def erfc(x: Double): Double = {
    if (x < 0) return 2.0 - erfc(-x)
    if (x < 2.0) 1.0 - erf(x)
    else {
      // erfc(x) = exp(-x^2)/sqrt(pi) * 1/(x+ (1/2)/(x+ 1/(x+ (3/2)/(x+ ...))))
      // evaluated backward — very accurate for x >= 2
      var cf = 0.0
      var i = 200
      while (i >= 1) { cf = (i / 2.0) / (x + cf); i -= 1 }
      cf = 1.0 / (x + cf)
      math.exp(-x * x) / math.sqrt(math.Pi) * cf
    }
  }

  def erf(x: Double): Double = {
    if (x < 0) return -erf(-x)
    if (x >= 2.0) return 1.0 - erfc(x)
    // Taylor: erf(x) = 2/sqrt(pi) * sum (-1)^n x^(2n+1) / (n! (2n+1))
    val x2 = x * x
    var term = x
    var sum = x
    var n = 1
    while (math.abs(term) > 1e-18 * math.abs(sum) && n < 200) {
      term = -term * x2 / n
      sum += term / (2 * n + 1)
      n += 1
    }
    2.0 / math.sqrt(math.Pi) * sum
  }

  /** Standard normal survival function, scipy `norm.sf`. */
  def normSf(x: Double): Double = 0.5 * erfc(x / math.sqrt(2.0))

  /** Average ranks for a binary vector in closed form (validation.py:7-40). */
  def rankBinaryData(data: Array[Int]): Array[Double] = {
    val n = data.length
    var nZeros = 0
    var i = 0
    while (i < n) { if (data(i) == 0) nZeros += 1; i += 1 }
    // zero_ranks = arange(nZeros); one_ranks = arange(nZeros, n)
    val zeroMean = if (nZeros > 0) (nZeros - 1) / 2.0 + 1 else 0.0
    val oneMean = if (n - nZeros > 0) (nZeros + n - 1) / 2.0 + 1 else 0.0
    val ranks = new Array[Double](n)
    i = 0
    while (i < n) { ranks(i) = if (data(i) == 1) oneMean else zeroMean; i += 1 }
    ranks
  }

  /** Two-sided rank-sum test over binary samples; returns (z, p) (validation.py:43-77). */
  def rankSumsTest(x: Array[Int], y: Array[Int]): (Double, Double) = {
    val n1 = x.length; val n2 = y.length
    val all = new Array[Int](n1 + n2)
    System.arraycopy(x, 0, all, 0, n1)
    System.arraycopy(y, 0, all, n1, n2)
    val ranked = rankBinaryData(all)
    var s = 0.0
    var i = 0
    while (i < n1) { s += ranked(i); i += 1 }
    val expected = n1 * (n1 + n2 + 1) / 2.0
    val z = (s - expected) / math.sqrt(n1.toDouble * n2 * (n1 + n2 + 1) / 12.0)
    val p = 2.0 * normSf(math.abs(z))
    (z, p)
  }

  /** significance_test (validation.py:80-108). `profileArgmax` is the candidate
    * cp in the *caller's* index space; lbound rebases into the knn table. */
  def significanceTest(offsetsFlat: Array[Int], k: Int, lbound: Int, windowSize: Int,
                       changePoint: Int, threshold: Double): Boolean = {
    val (_, yPred) = CrossVal.labels(offsetsFlat, k, changePoint - lbound, windowSize)
    // split y_pred at the *unrebased* change point (validation.py:107)
    val cp = changePoint
    val left = java.util.Arrays.copyOfRange(yPred, 0, math.min(cp, yPred.length))
    val right = java.util.Arrays.copyOfRange(yPred, math.min(cp, yPred.length), yPred.length)
    val (_, p) = rankSumsTest(left, right)
    p <= threshold
  }

  def scoreThreshold(profile: Array[Double], changePoint: Int, threshold: Double): Boolean =
    profile(changePoint) >= threshold
}
