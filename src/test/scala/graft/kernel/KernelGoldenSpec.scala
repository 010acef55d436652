package graft.kernel

import org.json4s._
import org.scalatest.funsuite.AnyFunSuite

/** Reference-parity tests: every expected value in these fixtures was
  * produced by RUNNING the reference library (ermshaua/claspy) via
  * tools/gen_golden.py. */
class KernelGoldenSpec extends AnyFunSuite {
  import GoldenJson._

  test("MT19937 raw draws match numpy (seed 42, choice(1e6, 64))") {
    val j = load("tcs")
    val expected = ints(j \ "raw_seed42_n1e6")
    val rng = new NumpyRandom(42)
    val got = Array.fill(64)(rng.randintBelow(1000000).toInt)
    assert(got.toSeq == expected.toSeq)
  }

  test("temporal constraints match the reference sampler (seed 2357)") {
    val j = load("tcs")
    val JArray(cases) = (j \ "cases"): @unchecked
    for (c <- cases) {
      val n = (c \ "n").values.asInstanceOf[BigInt].toInt
      val minSeg = (c \ "min_seg_size").values.asInstanceOf[BigInt].toInt
      val expected = intMatrix(c \ "tcs").map(r => (r(0), r(1))).toSeq
      val got = ClaSP.temporalConstraints(n, 10, minSeg, 2357L).toSeq
      assert(got == expected, s"n=$n minSeg=$minSeg")
    }
  }

  test("knn offsets/distances and ClaSP profile match the reference") {
    val j = load("knn_small")
    val ts = doubles(j \ "ts")
    val offsets = intMatrix(j \ "offsets")
    val dists = doubleMatrix(j \ "distances")
    val profile = doubles(j \ "profile")

    val knn = new KSubsequenceNeighbours(10, 3).fit(Array(ts))
    var offMismatch = 0
    for (i <- offsets.indices; k <- offsets(i).indices) {
      if (knn.offsets(i)(k) != offsets(i)(k)) offMismatch += 1
    }
    // FFT-vs-direct seed differences may flip near-exact distance ties on a
    // handful of rows; require 99.5%+ agreement
    assert(offMismatch <= offsets.length * offsets(0).length / 200,
      s"offset mismatches: $offMismatch of ${offsets.length * offsets(0).length}")

    var maxDistErr = 0.0
    for (i <- dists.indices; k <- dists(i).indices if knn.offsets(i)(k) == offsets(i)(k)) {
      maxDistErr = math.max(maxDistErr, math.abs(knn.distances(i)(k) - dists(i)(k)))
    }
    assert(maxDistErr < 1e-6, s"max distance err $maxDistErr")

    val clasp = ClaSP.fit(Array(ts), 10, 3, "znormed_euclidean_distance", "roc_auc", 5, knn)
    var maxProfErr = 0.0
    for (i <- profile.indices) {
      val a = clasp.profile(i); val b = profile(i)
      if (b.isNaN) assert(a.isInfinite || a.isNaN, s"profile sentinel mismatch at $i")
      else maxProfErr = math.max(maxProfErr, math.abs(a - b))
    }
    assert(maxProfErr < 1e-6, s"max profile err $maxProfErr")
  }

  test("window-size methods match the reference") {
    val j = load("window_sizes")
    val JArray(cases) = (j \ "cases"): @unchecked
    for (c <- cases) {
      val kind = (c \ "kind").values.toString
      val ts = doubles(c \ "ts")
      assert(WindowSize.suss(ts) == (c \ "suss").values.asInstanceOf[BigInt].toInt, s"suss/$kind")
      assert(WindowSize.dominantFourierFrequency(ts) == (c \ "fft").values.asInstanceOf[BigInt].toInt, s"fft/$kind")
      assert(WindowSize.highestAutocorrelation(ts) == (c \ "acf").values.asInstanceOf[BigInt].toInt, s"acf/$kind")
    }
  }

  test("BinaryClaSPSegmentation change points match the reference") {
    val j = load("segmentation")
    val JArray(cases) = (j \ "cases"): @unchecked
    for (c <- cases) {
      val kind = (c \ "kind").values.toString
      val seed = (c \ "seed").values.asInstanceOf[BigInt].toInt
      val ts = doubles(c \ "ts")
      val expectedWs = (c \ "window_size").values.asInstanceOf[BigInt].toInt
      val expectedCps = ints(c \ "cps")
      val seg = new BinaryClaSPSegmentation().fit(Array(ts))
      assert(seg.windowSize == expectedWs, s"window size $kind/$seed")
      assert(seg.changePoints.toSeq == expectedCps.toSeq, s"cps $kind/$seed")
    }
  }

  test("multivariate segmentation matches the reference (per-dim window + 1e-30 threshold)") {
    val j = load("multivariate")
    val JArray(cases) = (j \ "cases"): @unchecked
    for (c <- cases) {
      val seed = (c \ "seed").values.asInstanceOf[BigInt].toInt
      val JArray(dimsJ) = (c \ "dims"): @unchecked
      val dims = dimsJ.map(doubles).toArray
      val seg = new BinaryClaSPSegmentation().fit(dims)
      assert(seg.windowSize == (c \ "window_size").values.asInstanceOf[BigInt].toInt,
        s"window size seed=$seed")
      assert(seg.changePoints.toSeq == ints(c \ "cps").toSeq, s"cps seed=$seed")
    }
  }

  test("fixed-window ensemble + segmentation match the reference") {
    val j = load("fixed_window")
    val ts = doubles(j \ "ts")
    val expectedCps = ints(j \ "cps")
    val lb = (j \ "ensemble_lbound").values.asInstanceOf[BigInt].toInt
    val ub = (j \ "ensemble_ubound").values.asInstanceOf[BigInt].toInt
    val profile = doubles(j \ "ensemble_profile")

    val ens = ClaSP.fitEnsemble(Array(ts), 10, 12, 3, "znormed_euclidean_distance",
      "roc_auc", earlyStopping = true, 5, 2357L, "significance_test", 1e-15)
    assert(ens.lbound == lb && ens.ubound == ub)
    var maxErr = 0.0
    for (i <- profile.indices) {
      if (profile(i).isNaN) assert(ens.profile(i).isInfinite, s"inf at $i")
      else maxErr = math.max(maxErr, math.abs(ens.profile(i) - profile(i)))
    }
    assert(maxErr < 1e-6, s"ensemble profile err $maxErr")

    val seg = new BinaryClaSPSegmentation(windowSizeFixed = 12).fit(Array(ts))
    assert(seg.changePoints.toSeq == expectedCps.toSeq)
  }
}
