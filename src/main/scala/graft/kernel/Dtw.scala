package graft.kernel

/** Dynamic time warping with a Sakoe–Chiba band (public method: Sakoe &
  * Chiba 1978; the banded O(n·r) formulation is the standard speedup used
  * throughout the UCR-suite literature). Local cost is the SQUARED
  * pointwise difference and the returned value is the accumulated squared
  * cost along the optimal warping path — consistent with the engine's
  * other (squared) distances; only relative order matters for search. */
object Dtw {

  /** Banded DTW distance between two series. `band` is the Sakoe–Chiba
    * radius in samples; it is widened to |n−m| automatically (the minimum
    * feasible band for unequal lengths). `band = 0` with equal lengths
    * degenerates to the squared euclidean distance; a band ≥ max(n,m)
    * is unconstrained DTW. O(min-band memory): two rolling DP rows. */
  def dtw(a: Array[Double], b: Array[Double], band: Int): Double = {
    val n = a.length; val m = b.length
    require(n > 0 && m > 0, "DTW needs non-empty series")
    require(band >= 0, s"band must be >= 0, got $band")
    val r = math.max(band, math.abs(n - m))
    var prev = new Array[Double](m + 1)
    var cur = new Array[Double](m + 1)
    java.util.Arrays.fill(prev, Double.PositiveInfinity)
    prev(0) = 0.0
    var i = 1
    while (i <= n) {
      java.util.Arrays.fill(cur, Double.PositiveInfinity)
      val lo = math.max(1, i - r)
      val hi = math.min(m, i + r)
      var j = lo
      while (j <= hi) {
        val d = a(i - 1) - b(j - 1)
        val best = math.min(prev(j), math.min(cur(j - 1), prev(j - 1)))
        cur(j) = d * d + best
        j += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    prev(m)
  }

  /** Z-normalize a series (population std; constant series map to all
    * zeros) — the standard preprocessing before shape-based DTW search. */
  def znorm(xs: Array[Double]): Array[Double] = {
    val n = xs.length
    var s = 0.0; var i = 0
    while (i < n) { s += xs(i); i += 1 }
    val mu = s / n
    var sq = 0.0; i = 0
    while (i < n) { val e = xs(i) - mu; sq += e * e; i += 1 }
    val sd = math.sqrt(sq / n)
    if (sd == 0.0) new Array[Double](n)
    else {
      val out = new Array[Double](n)
      i = 0
      while (i < n) { out(i) = (xs(i) - mu) / sd; i += 1 }
      out
    }
  }
}
