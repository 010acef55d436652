package graft.kernel

/** Sliding-window statistics via cumulative sums.
  *
  * Semantics follow the reference implementation in
  * `/root/reference/claspy/distance.py:5-54` (sliding_mean_std, incl. the
  * `|std| < 1e-3 -> 1` floor at distance.py:52), distance.py:88-107
  * (sliding_csum) and distance.py:139-168 (sliding_csum_dcsum, incl. the
  * `+1e-5` complexity-estimate stabiliser). Cumulative sums are sequential
  * left-folds, mirroring np.cumsum's evaluation order.
  */
object SlidingStats {

  /** (movmean, movstd) arrays of length n - w + 1; std floored: |std|<1e-3 -> 1. */
  def slidingMeanStd(ts: Array[Double], w: Int): (Array[Double], Array[Double]) = {
    val n = ts.length
    val m = n - w + 1
    val s = new Array[Double](n + 1)
    val sq = new Array[Double](n + 1)
    var i = 0
    while (i < n) {
      s(i + 1) = s(i) + ts(i)
      sq(i + 1) = sq(i) + ts(i) * ts(i)
      i += 1
    }
    val mean = new Array[Double](m)
    val std = new Array[Double](m)
    i = 0
    while (i < m) {
      val segSum = s(i + w) - s(i)
      val segSq = sq(i + w) - sq(i)
      val mu = segSum / w
      mean(i) = mu
      var v = segSq / w - mu * mu
      if (v < 0) v = 0
      var sd = math.sqrt(v)
      if (math.abs(sd) < 1e-3) sd = 1.0
      std(i) = sd
      i += 1
    }
    (mean, std)
  }

  /** Sliding sum of squares over windows of length w; length n - w + 1. */
  def slidingCsum(ts: Array[Double], w: Int): Array[Double] = {
    val n = ts.length
    val sq = new Array[Double](n + 1)
    var i = 0
    while (i < n) { sq(i + 1) = sq(i) + ts(i) * ts(i); i += 1 }
    val out = new Array[Double](n - w + 1)
    i = 0
    while (i < out.length) { out(i) = sq(i + w) - sq(i); i += 1 }
    out
  }

  /** (csumsq, dcsumsq + 1e-5, means, stds) — complexity-invariant preprocessing. */
  def slidingCsumDcsum(ts: Array[Double], w: Int): (Array[Double], Array[Double], Array[Double], Array[Double]) = {
    val (means, stds) = slidingMeanStd(ts, w)
    val csum = slidingCsum(ts, w)
    val n = ts.length
    // cumulative sum of squared first differences, offset by 2 zeros as in the reference
    val d = new Array[Double](n + 1)
    var i = 1
    while (i < n) {
      val diff = ts(i) - ts(i - 1)
      d(i + 1) = d(i) + diff * diff
      i += 1
    }
    d(1) = 0.0
    val dout = new Array[Double](n - w + 1)
    i = 0
    while (i < dout.length) { dout(i) = d(i + w) - d(i) + 1e-5; i += 1 }
    (csum, dout, means, stds)
  }
}
