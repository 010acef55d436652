package graft.kernel

import org.scalatest.funsuite.AnyFunSuite

class DtwSpec extends AnyFunSuite {

  /** Unbanded reference DP, full O(n·m) matrix — independent of the
    * rolling-row banded implementation. */
  private def fullDtw(a: Array[Double], b: Array[Double]): Double = {
    val n = a.length; val m = b.length
    val dp = Array.fill(n + 1, m + 1)(Double.PositiveInfinity)
    dp(0)(0) = 0.0
    for (i <- 1 to n; j <- 1 to m) {
      val d = a(i - 1) - b(j - 1)
      dp(i)(j) = d * d +
        math.min(dp(i - 1)(j), math.min(dp(i)(j - 1), dp(i - 1)(j - 1)))
    }
    dp(n)(m)
  }

  private def lcg(n: Int, seed: Long): Array[Double] = {
    var s = seed
    Array.fill(n) {
      s = (s * 1103515245L + 12345L) & 0x7fffffffL
      (s % 1000L).toDouble / 100.0
    }
  }

  test("a wide band equals the full DP, including unequal lengths") {
    val a = lcg(40, 5L); val b = lcg(33, 9L)
    assert(Dtw.dtw(a, b, 40) == fullDtw(a, b))
    assert(Dtw.dtw(a, a, 40) == 0.0)
    // symmetry of the unconstrained distance
    assert(Dtw.dtw(a, b, 60) == Dtw.dtw(b, a, 60))
  }

  test("band 0 at equal lengths is the squared euclidean distance") {
    val a = lcg(25, 1L); val b = lcg(25, 2L)
    val expect = a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    assert(math.abs(Dtw.dtw(a, b, 0) - expect) <= 1e-9 * expect)
  }

  test("hand-checkable warping: a plateau stretch costs nothing") {
    // b repeats a's middle sample; DTW should absorb it at zero cost
    val a = Array(0.0, 1.0, 2.0)
    val b = Array(0.0, 1.0, 1.0, 1.0, 2.0)
    assert(Dtw.dtw(a, b, 5) == 0.0)
    // plain euclidean on truncation would not be 0
  }

  test("DTW tolerates phase shift where euclidean does not") {
    val a = Array.tabulate(120)(i => math.sin(i / 6.0))
    val shifted = Array.tabulate(120)(i => math.sin((i - 4) / 6.0))
    val other = Array.tabulate(120)(i => math.cos(i / 2.0) * 2.0)
    val dShift = Dtw.dtw(a, shifted, 10)
    val dOther = Dtw.dtw(a, other, 10)
    val eucShift = a.zip(shifted).map { case (x, y) => (x - y) * (x - y) }.sum
    assert(dShift < 0.05 * eucShift, "the band absorbs the 4-sample shift")
    assert(dShift < 0.01 * dOther, "shape match beats a different signal")
  }

  test("znorm centers and scales; constant series map to zeros") {
    val z = Dtw.znorm(Array(2.0, 4.0, 6.0))
    assert(math.abs(z.sum) < 1e-12)
    assert(math.abs(z.map(x => x * x).sum / 3 - 1.0) < 1e-12)
    assert(Dtw.znorm(Array(5.0, 5.0)).toSeq == Seq(0.0, 0.0))
  }
}
