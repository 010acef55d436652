package graft.kernel

import org.scalatest.funsuite.AnyFunSuite

/** decode ∘ encode = id over adversarial timestamp/value shapes (SURVEY.md §5
  * test plan item (c)). */
class GorillaSpec extends AnyFunSuite {

  private def roundTrip(ts: Array[Long], vs: Array[Double]): Unit = {
    val (ts2, vs2) = Gorilla.decode(Gorilla.encode(ts, vs))
    assert(ts2.toSeq == ts.toSeq)
    assert(vs2.length == vs.length)
    for (i <- vs.indices)
      assert(java.lang.Double.doubleToRawLongBits(vs2(i)) ==
        java.lang.Double.doubleToRawLongBits(vs(i)), s"value $i")
  }

  test("empty and singleton blocks") {
    roundTrip(Array.empty, Array.empty)
    roundTrip(Array(1577836800000L), Array(math.Pi))
  }

  test("regular 1-minute cadence with constant value compresses far below raw") {
    val n = 10000
    val ts = Array.tabulate(n)(i => 1577836800000L + i * 60000L)
    val vs = Array.fill(n)(42.0)
    val enc = Gorilla.encode(ts, vs)
    roundTrip(ts, vs)
    // dod==0 and xor==0 after the header: ~2 bits/point vs 128 raw
    assert(enc.length < n / 2, s"got ${enc.length} bytes for $n points")
  }

  test("handles NaN, infinities, denormals, and negative zero") {
    val ts = Array(0L, 1L, 3L, 6L, 10L, 15L, 21L)
    val vs = Array(Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity,
      -0.0, java.lang.Double.MIN_VALUE, Double.MaxValue, 0.0)
    roundTrip(ts, vs)
  }

  test("asymmetric dod class boundaries (±63/64, ±255/256, ±2047/2048, int32, int64)") {
    val dods = Seq(0L, 1L, -1L, 63L, 64L, -63L, -64L, 255L, 256L, -255L, -256L,
      2047L, 2048L, -2047L, -2048L, Int.MaxValue.toLong, Int.MinValue.toLong,
      Int.MaxValue + 1L, Int.MinValue - 1L, 1L << 40, -(1L << 40))
    var delta = 1000L
    var t = 1577836800000L
    val ts = scala.collection.mutable.ArrayBuffer(t)
    for (d <- dods) { delta += d; t += delta; ts += t }
    roundTrip(ts.toArray, Array.tabulate(ts.length)(i => i * 0.1))
  }

  test("property: 200 seeded random series round-trip bit-exactly") {
    var s = 20260816L
    def lcg(): Long = { s = s * 6364136223846793005L + 1442695040888963407L; s }
    def nextInt(bound: Int): Int = (((lcg() >>> 33) % bound).toInt + bound) % bound
    val specials = Array(0.0, -0.0, Double.NaN, 1.0, -1.0,
      Double.MinPositiveValue, Double.MaxValue, Double.PositiveInfinity)
    for (_ <- 0 until 200) {
      val n = nextInt(300)
      var t = 0L
      val ts = Array.fill(n) {
        val d = if (nextInt(4) == 0) (lcg() % (1L << 41)) else (lcg() % 5000L)
        t += d; t
      }
      val vs = Array.fill(n) {
        if (nextInt(5) == 0) specials(nextInt(specials.length))
        else java.lang.Double.longBitsToDouble(lcg()) match {
          case v if v.isNaN => 0.5 // collapse random NaN payloads; NaN itself is covered above
          case v => v
        }
      }
      roundTrip(ts, vs)
    }
  }
}
