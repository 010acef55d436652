package graft.kernel

/** MT19937 with numpy-legacy `RandomState` semantics for the draws the
  * reference makes: `np.random.seed(s)` + `np.random.choice(n, 2, replace=True)`
  * in `_calculate_temporal_constraints` (`/root/reference/claspy/clasp.py:344-348`).
  *
  * `choice(n, size, replace=True)` without probabilities delegates to
  * `randint(0, n)`, which for n < 2^32 draws 32-bit words and applies
  * masked rejection (smallest 2^k-1 mask >= n-1, reject while > n-1).
  * MT19937 itself is the standard Matsumoto–Nishimura generator (public
  * algorithm), seeded via init_genrand.
  */
final class NumpyRandom(seed: Long) {
  private val mt = new Array[Int](624)
  private var mti = 625

  // init_genrand
  {
    mt(0) = (seed & 0xffffffffL).toInt
    var i = 1
    while (i < 624) {
      val prev = mt(i - 1) & 0xffffffffL
      mt(i) = ((1812433253L * (prev ^ (prev >>> 30)) + i) & 0xffffffffL).toInt
      i += 1
    }
    mti = 624
  }

  /** Next 32-bit word as unsigned in a Long. */
  def nextUInt32(): Long = {
    if (mti >= 624) {
      var kk = 0
      while (kk < 624 - 397) {
        val y = (mt(kk) & 0x80000000) | (mt(kk + 1) & 0x7fffffff)
        mt(kk) = mt(kk + 397) ^ (y >>> 1) ^ (if ((y & 1) != 0) 0x9908b0df else 0)
        kk += 1
      }
      while (kk < 623) {
        val y = (mt(kk) & 0x80000000) | (mt(kk + 1) & 0x7fffffff)
        mt(kk) = mt(kk + (397 - 624)) ^ (y >>> 1) ^ (if ((y & 1) != 0) 0x9908b0df else 0)
        kk += 1
      }
      val y = (mt(623) & 0x80000000) | (mt(0) & 0x7fffffff)
      mt(623) = mt(396) ^ (y >>> 1) ^ (if ((y & 1) != 0) 0x9908b0df else 0)
      mti = 0
    }
    var y = mt(mti)
    mti += 1
    y ^= (y >>> 11)
    y ^= (y << 7) & 0x9d2c5680
    y ^= (y << 15) & 0xefc60000
    y ^= (y >>> 18)
    y.toLong & 0xffffffffL
  }

  /** numpy-legacy `RandomState.shuffle` of a 1-D array: Fisher–Yates from
    * the top, `j = rk_interval(i)` inclusive (mtrand shuffle loop). Used by
    * `permutation`, which backs both `np.random.choice(..., replace=False)`
    * (claspy/clap.py:143,152) and sklearn `KFold(shuffle=True)`. */
  def shuffle(arr: Array[Int]): Unit = {
    var i = arr.length - 1
    while (i > 0) {
      val j = randintBelow(i + 1L).toInt
      val t = arr(i); arr(i) = arr(j); arr(j) = t
      i -= 1
    }
  }

  /** `RandomState.permutation(n)` = arange(n) shuffled in place. */
  def permutation(n: Int): Array[Int] = {
    val a = Array.tabulate(n)(identity)
    shuffle(a)
    a
  }

  /** Legacy `choice(a, size, replace=False)` without probabilities:
    * `a[permutation(len(a))[:size]]` (mtrand choice). */
  def choiceNoReplace(candidates: Array[Int], size: Int): Array[Int] = {
    val perm = permutation(candidates.length)
    Array.tabulate(math.min(size, candidates.length))(k => candidates(perm(k)))
  }

  /** numpy-legacy rk_interval for max <= 0xffffffff: masked rejection. */
  def randintBelow(n: Long): Long = {
    require(n > 0 && n <= 0xffffffffL)
    val max = n - 1
    if (max == 0) return 0
    var mask = max
    mask |= mask >>> 1; mask |= mask >>> 2; mask |= mask >>> 4
    mask |= mask >>> 8; mask |= mask >>> 16
    var v = nextUInt32() & mask
    while (v > max) v = nextUInt32() & mask
    v
  }
}
