package graft.kernel

import org.json4s._
import org.scalatest.funsuite.AnyFunSuite
import graft.kernel.streaming.{ClaSS, StreamingClaSPSegmentation, StreamingKSN}

/** Reference-parity tests for the streaming kernel: every expected value was
  * produced by RUNNING the reference (ermshaua/claspy streaming modules) via
  * tools/gen_golden.py §6. */
class StreamingGoldenSpec extends AnyFunSuite {
  import GoldenJson._

  test("StreamingKSN tables match the reference after full replay") {
    val j = load("streaming_knn")
    val ts = doubles(j \ "ts")
    val sksn = new StreamingKSN(
      (j \ "n_timepoints").values.asInstanceOf[BigInt].toInt,
      (j \ "window_size").values.asInstanceOf[BigInt].toInt,
      (j \ "k_neighbours").values.asInstanceOf[BigInt].toInt)
    ts.foreach(x => sksn.update(x))
    assert(sksn.lbound == (j \ "lbound").values.asInstanceOf[BigInt].toInt)
    assert(sksn.knnFilled == (j \ "knn_filled").values.asInstanceOf[BigInt].toInt)
    assert(sksn.knnInsertIdx == (j \ "knn_insert_idx").values.asInstanceOf[BigInt].toInt)
    val t = sksn.transform()
    val expOff = intMatrix(j \ "offsets")
    val expDist = doubleMatrix(j \ "distances")
    assert(t.offsets.length == expOff.length)
    var offMismatch = 0
    var maxDistErr = 0.0
    for (i <- expOff.indices; k <- expOff(i).indices) {
      if (t.offsets(i)(k) != expOff(i)(k)) offMismatch += 1
      else {
        val e = expDist(i)(k)
        if (!e.isNaN && !t.distances(i)(k).isInfinite)
          maxDistErr = math.max(maxDistErr, math.abs(t.distances(i)(k) - e))
      }
    }
    assert(offMismatch == 0, s"offset mismatches: $offMismatch")
    assert(maxDistErr < 1e-8, s"max distance err $maxDistErr")
  }

  test("ClaSS profile and split match the reference") {
    val j = load("streaming_class")
    val ts = doubles(j \ "ts")
    val w = (j \ "window_size").values.asInstanceOf[BigInt].toInt
    val k = (j \ "k_neighbours").values.asInstanceOf[BigInt].toInt
    val expProfile = doubles(j \ "profile")
    val model = ClaSS.fit(ts, w, k, "znormed_euclidean_distance", "f1", 5)
    assert(model.profile.length == expProfile.length)
    var maxErr = 0.0
    for (i <- expProfile.indices) {
      if (expProfile(i).isNaN) assert(model.profile(i).isInfinite, s"sentinel at $i")
      else maxErr = math.max(maxErr, math.abs(model.profile(i) - expProfile(i)))
    }
    assert(maxErr < 1e-9, s"max profile err $maxErr")
    val expCp = (j \ "cp").values
    val gotCp = model.split("significance_test", 1e-15)
    assert(gotCp.map(BigInt(_)) == (expCp match {
      case null => None
      case b: BigInt => Some(b)
      case _ => None
    }), s"cp $gotCp vs $expCp")
  }

  test("StreamingClaSPSegmentation end-to-end matches the reference cp log") {
    val j = load("streaming_segmentation")
    val JArray(cases) = (j \ "cases"): @unchecked
    for (c <- cases) {
      val kind = (c \ "kind").values.toString
      val ts = doubles(c \ "ts")
      val stream = new StreamingClaSPSegmentation(
        nTimepoints = (c \ "n_timepoints").values.asInstanceOf[BigInt].toInt,
        nWarmupIn = (c \ "n_warmup").values.asInstanceOf[BigInt].toInt,
        logCps = true)
      ts.foreach(x => stream.update(x))
      assert(stream.windowSize == (c \ "window_size").values.asInstanceOf[BigInt].toInt,
        s"window size $kind")
      assert(stream.lastCp == (c \ "last_cp").values.asInstanceOf[BigInt].toInt,
        s"last_cp $kind")
      assert(stream.changePoints.toSeq == ints(c \ "change_points").toSeq,
        s"cps $kind")
    }
  }
}
