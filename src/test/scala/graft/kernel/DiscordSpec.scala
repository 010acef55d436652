package graft.kernel

import org.scalatest.funsuite.AnyFunSuite

/** Discord discovery vs an independent O(n²·w) brute force: naive dot
  * products (no rolling update), full per-row distance matrix, the same
  * w/2 exclusion-zone row-max masking, then argmax selection. */
class DiscordSpec extends AnyFunSuite {

  private def lcgSeries(n: Int, seed: Long): Array[Double] = {
    var s = seed
    Array.fill(n) {
      s = (s * 1103515245L + 12345L) & 0x7fffffffL
      (s % 1000L).toDouble / 10.0
    }
  }

  /** Brute-force 1-NN distances with the kernel's znormed formula and
    * exclusion semantics, from scratch (naive dots, no argkmin). */
  private def bruteNn(ts: Array[Double], w: Int): Array[Double] = {
    val l = ts.length - w + 1
    val pre = ZNormedEuclidean.preprocess(ts, w)
    Array.tabulate(l) { i =>
      val dot = Array.tabulate(l) { j =>
        var s = 0.0; var t = 0; while (t < w) { s += ts(i + t) * ts(j + t); t += 1 }; s
      }
      val row = ZNormedEuclidean.compute(i, dot, w, pre)
      var mx = Double.NegativeInfinity
      var j = 0
      while (j < l) { if (row(j) > mx) mx = row(j); j += 1 }
      val lo = math.max(0, i - w / 2)
      val hi = math.min(i + w / 2 + 1, l)
      j = lo; while (j < hi) { row(j) = mx; j += 1 }
      row.min
    }
  }

  test("discords match the brute-force matrix-profile argmax") {
    val ts = lcgSeries(300, 42L)
    val w = 10
    val nn = bruteNn(ts, w)
    // independent greedy selection with the same spacing rule
    val order = Array.range(0, nn.length).sortBy(i => (-nn(i), i))
    val expect = scala.collection.mutable.ArrayBuffer.empty[(Int, Double)]
    for (i <- order if expect.size < 3
         if expect.forall(p => math.abs(p._1 - i) >= w))
      expect += ((i, nn(i)))
    val got = Discord.discords(ts, w, top = 3)
    assert(got.map(_._1).toSeq == expect.map(_._1).toSeq)
    for (((gi, gd), (_, ed)) <- got.zip(expect))
      assert(math.abs(gd - ed) <= 1e-6 * math.max(1.0, math.abs(ed)),
        s"discord $gi distance: kernel $gd vs brute $ed")
  }

  test("a planted anomaly is the top discord") {
    // smooth periodic base; one window replaced by a spike pattern
    val n = 400
    val ts = Array.tabulate(n)(i => math.sin(i / 7.0) * 10.0)
    for (i <- 200 until 212) ts(i) = if (i % 2 == 0) 40.0 else -40.0
    val got = Discord.discords(ts, 12, top = 1)
    assert(got.nonEmpty)
    assert(math.abs(got(0)._1 - 200) <= 12,
      s"discord at ${got(0)._1}, expected near 200")
  }

  test("picked discords respect the non-overlap spacing and short series bail out") {
    val ts = lcgSeries(200, 7L)
    val got = Discord.discords(ts, 15, top = 5)
    for (Seq(a, b) <- got.map(_._1).toSeq.sorted.sliding(2) if got.length > 1)
      assert(b - a >= 15)
    assert(got.map(_._2).toSeq == got.map(_._2).toSeq.sorted.reverse,
      "descending by distance")
    assert(Discord.discords(lcgSeries(25, 3L), 15).isEmpty,
      "n < 2w returns no discords")
  }
}
