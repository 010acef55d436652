package graft.ops

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable quantile sketch state (MRL-family, Manku-Rajagopalan-Lindsay
  * 1998/1999 compaction scheme): `levels(h)` holds values of weight 2^h;
  * level 0 is a pre-allocated ring the per-row path appends into without
  * cloning. Compaction keeps every level under `k` values, so the sketch
  * is O(k · log(n/k)) regardless of input size — the property that makes a
  * PARTIAL sketch a first-class column value that can cascade through
  * retention tiers (1m sketches merge into 1h into 1d), which Spark's
  * percentile_approx cannot do (its partial state never surfaces).
  *
  * Determinism: the textbook compactor drops odd- or even-indexed items at
  * RANDOM; this one alternates by a parity counter, so a fixed input
  * SEQUENCE yields a fixed sketch (the sketch still varies with partition
  * order, as any mergeable summary does — the spec bounds rank error, not
  * bit equality). Below `k` total values no compaction ever fires and
  * quantiles are EXACT (the regime the q54 oracle pins). */
final case class Kll(
    k: Int,
    n: Long,
    lvl0: Array[Double],
    lvl0Len: Int,
    upper: Array[Array[Double]],
    parity: Long)

object QuantileSketch {

  def empty(k: Int): Kll = {
    // odd k would drop the last sorted value at every compaction (the MRL
    // keep-every-other step halves an EVEN buffer), silently biasing high
    // quantiles and leaking weight
    require(k >= 2 && k % 2 == 0, s"capacity k must be even and >= 2, got $k")
    Kll(k, 0L, new Array[Double](math.min(8, k)), 0, Array.empty, 0L)
  }

  /** Level-0 capacity is LAZY: it starts at 8 and doubles toward k as
    * values arrive, because the buffer is what the encoder ships — with
    * eager k-sized buffers a cascade over sparse groups (minute tiers at
    * one event per minute) shuffles k doubles per near-empty sketch, which
    * at k=256 is a 2 KB row for 8 bytes of content. Compaction timing
    * (lvl0Len vs k) is unchanged, so sketch CONTENTS are bit-identical to
    * the eager layout. */
  private def withRoom(s: Kll): Kll =
    if (s.lvl0Len < s.lvl0.length) s
    else s.copy(lvl0 = java.util.Arrays.copyOf(
      s.lvl0, math.min(s.k, math.max(8, s.lvl0.length * 2))))

  /** Append one value (mutates the level-0 ring in place; O(1) amortized
    * until a compaction cascade). */
  def update(s0: Kll, v: Double): Kll = {
    val s = withRoom(s0)
    s.lvl0(s.lvl0Len) = v
    val grown = s.copy(n = s.n + 1, lvl0Len = s.lvl0Len + 1)
    if (grown.lvl0Len < grown.k) grown else compact(grown)
  }

  /** Merge two sketches: concatenate level-wise, then re-compact any level
    * that overflowed. Associative up to the documented rank-error bound. */
  def merge(a: Kll, b: Kll): Kll = {
    if (b.n == 0) return a
    if (a.n == 0) return b
    val k = math.max(a.k, b.k)
    val la = a.upper; val lb = b.upper
    val depth = math.max(la.length, lb.length)
    val upper = Array.tabulate(depth) { h =>
      (if (h < la.length) la(h) else Array.emptyDoubleArray) ++
        (if (h < lb.length) lb(h) else Array.emptyDoubleArray)
    }
    val lvl0 = java.util.Arrays.copyOf(a.lvl0,
      math.min(k, math.max(math.min(8, k), a.lvl0Len + b.lvl0Len)))
    var i = 0
    var s = Kll(k, a.n + b.n, lvl0, a.lvl0Len, upper, a.parity + b.parity)
    while (i < b.lvl0Len) {
      // reuse the single-value path so level-0 overflow compacts as usual
      if (s.lvl0Len >= s.k) s = compact(s)
      s = withRoom(s)
      s.lvl0(s.lvl0Len) = b.lvl0(i)
      s = s.copy(lvl0Len = s.lvl0Len + 1)
      i += 1
    }
    var out = if (s.lvl0Len >= s.k) compact(s) else s
    out = compactUpper(out)
    out
  }

  /** Compact level 0 into level 1 (sort, keep alternating indices). */
  private def compact(s: Kll): Kll = {
    val buf = java.util.Arrays.copyOf(s.lvl0, s.lvl0Len)
    java.util.Arrays.sort(buf)
    val keepOdd = (s.parity & 1L) == 1L
    val kept = Array.tabulate(buf.length / 2)(j =>
      buf(2 * j + (if (keepOdd) 1 else 0)))
    val upper = if (s.upper.isEmpty) Array(kept)
      else { val u = s.upper.clone(); u(0) = u(0) ++ kept; u }
    compactUpper(s.copy(lvl0 = new Array[Double](math.min(8, s.k)), lvl0Len = 0,
      upper = upper, parity = s.parity + 1))
  }

  /** Cascade compaction through the weighted levels. An ODD buffer (merge
    * concatenation can produce one when k/2 is odd) keeps its largest value
    * at the current level instead of silently dropping it — otherwise the
    * sketch's total weight drifts below n and high quantiles bias low. */
  private def compactUpper(s0: Kll): Kll = {
    var s = s0
    var h = 0
    while (h < s.upper.length) {
      if (s.upper(h).length >= s.k) {
        val buf = s.upper(h).clone()
        java.util.Arrays.sort(buf)
        val pairs = buf.length / 2
        val keepOdd = (s.parity & 1L) == 1L
        val kept = Array.tabulate(pairs)(j =>
          buf(2 * j + (if (keepOdd) 1 else 0)))
        val leftover =
          if (buf.length % 2 == 1) Array(buf(buf.length - 1))
          else Array.emptyDoubleArray
        val upper =
          if (h + 1 < s.upper.length) {
            val u = s.upper.clone()
            u(h) = leftover
            u(h + 1) = u(h + 1) ++ kept
            u
          } else s.upper.clone().patch(h, Seq(leftover), 1)
            .toArray :+ kept
        s = s.copy(upper = upper, parity = s.parity + 1)
      }
      h += 1
    }
    s
  }

  /** Interpolated quantile (q in [0,1]) over the weighted items. With all
    * weights 1 (no compaction ever fired) this is EXACTLY the
    * quantile_cont / percentile_cont definition both Spark and DuckDB use,
    * which is what lets the small-group regime be hash-oracled. Weighted
    * items interpolate on the expanded-rank scale. */
  def quantile(s: Kll, q: Double): Double = {
    require(q >= 0 && q <= 1, s"q must be in [0,1], got $q")
    val items = scala.collection.mutable.ArrayBuffer.empty[(Double, Long)]
    var i = 0
    while (i < s.lvl0Len) { items += ((s.lvl0(i), 1L)); i += 1 }
    for (h <- s.upper.indices; v <- s.upper(h)) items += ((v, 1L << (h + 1)))
    if (items.isEmpty) return Double.NaN
    val sorted = items.sortBy(_._1).toArray
    val total = sorted.map(_._2).sum
    // element of the EXPANDED sorted multiset at integer rank r
    def at(r: Long): Double = {
      var acc = 0L
      var j = 0
      while (acc + sorted(j)._2 <= r) { acc += sorted(j)._2; j += 1 }
      sorted(j)._1
    }
    // target position on the 0..total-1 expanded rank scale
    val pos = q * (total - 1)
    val lo = math.floor(pos).toLong
    val frac = pos - lo
    val vLo = at(lo)
    if (frac == 0) vLo else vLo + frac * (at(lo + 1) - vLo)
  }

  /** Typed Aggregator: Double values → one sketch per group (the finest
    * tier's partial aggregate; map-side combine applies). */
  final class SketchAgg(k: Int) extends Aggregator[Double, Kll, Kll]
      with Serializable {
    def zero: Kll = empty(k)
    def reduce(b: Kll, v: Double): Kll = update(b, v)
    def merge(a: Kll, b: Kll): Kll = QuantileSketch.merge(a, b)
    def finish(r: Kll): Kll = r
    def bufferEncoder: Encoder[Kll] = Encoders.product[Kll]
    def outputEncoder: Encoder[Kll] = Encoders.product[Kll]
  }

  /** Typed Aggregator: sketches → merged sketch (the tier-cascade step —
    * 1h from 1m sketches, 1d from 1h — without ever re-reading raw data). */
  final class MergeAgg(k: Int) extends Aggregator[Kll, Kll, Kll]
      with Serializable {
    def zero: Kll = empty(k)
    def reduce(b: Kll, s: Kll): Kll = QuantileSketch.merge(b, s)
    def merge(a: Kll, b: Kll): Kll = QuantileSketch.merge(a, b)
    def finish(r: Kll): Kll = r
    def bufferEncoder: Encoder[Kll] = Encoders.product[Kll]
    def outputEncoder: Encoder[Kll] = Encoders.product[Kll]
  }
}
