package graft.kernel

import org.json4s._
import org.scalatest.funsuite.AnyFunSuite

/** Golden parity for the previously-untested parameter paths: alternative
  * distances, score_threshold validation, and the evaluation metrics
  * (reference values produced by running `claspy/tests/evaluation.py` and
  * `BinaryClaSPSegmentation(distance=..., validation=...)` in
  * tools/gen_golden.py §9). */
class ParamGoldenSpec extends AnyFunSuite {
  import GoldenJson._

  private def jint(v: JValue): Int = v match {
    case JInt(i) => i.toInt
    case JLong(l) => l.toInt
    case JDouble(d) => d.toInt
    case other => throw new IllegalArgumentException(other.toString)
  }
  private def jdouble(v: JValue): Double = v match {
    case JDouble(d) => d
    case JInt(i) => i.toDouble
    case JDecimal(d) => d.toDouble
    case other => throw new IllegalArgumentException(other.toString)
  }

  test("euclidean and cinvariant distances reproduce reference change points") {
    val g = load("param_grid")
    for (c <- (g \ "distance_cases").asInstanceOf[JArray].arr) {
      val dist = (c \ "distance").asInstanceOf[JString].s
      val ts = doubles(c \ "ts")
      val seg = new BinaryClaSPSegmentation(distanceName = dist)
      val res = seg.fit(Array(ts))
      assert(res.windowSize == jint(c \ "window_size"), s"$dist window")
      assert(res.changePoints.sameElements(ints(c \ "cps")), s"$dist cps")
      val expProfile = doubles(c \ "profile")
      var maxDiff = 0.0
      for (i <- expProfile.indices if !expProfile(i).isNaN && !res.profile(i).isNaN)
        maxDiff = math.max(maxDiff, math.abs(expProfile(i) - res.profile(i)))
      assert(maxDiff < 1e-6, s"$dist profile maxDiff=$maxDiff")
    }
  }

  test("score_threshold validation reproduces reference change points") {
    val g = load("param_grid")
    for (c <- (g \ "score_threshold_cases").asInstanceOf[JArray].arr) {
      val ts = doubles(c \ "ts")
      val thr = jdouble(c \ "threshold")
      val seg = new BinaryClaSPSegmentation(validation = "score_threshold", thresholdIn = thr)
      val res = seg.fit(Array(ts))
      assert(res.windowSize == jint(c \ "window_size"))
      assert(res.changePoints.sameElements(ints(c \ "cps")), s"thr=$thr cps")
    }
  }

  test("evaluation metrics match reference values") {
    val g = load("eval_metrics")
    for (c <- (g \ "cases").asInstanceOf[JArray].arr) {
      val n = jint(c \ "n")
      val cpsTrue = ints(c \ "cps_true")
      val cpsPredSame = ints(c \ "cps_pred_same")
      val cpsPred = ints(c \ "cps_pred")
      assert(math.abs(Eval.relativeChangePointDistance(cpsTrue, cpsPredSame, n)
        - jdouble(c \ "rel_cp_dist")) < 1e-9, s"rel_cp_dist n=$n")
      assert(math.abs(Eval.fMeasure(Seq(cpsTrue), cpsPred, margin = 5)
        - jdouble(c \ "f_measure")) < 1e-12, s"f_measure n=$n")
      assert(math.abs(Eval.fMeasure(Seq(cpsTrue), cpsPred, margin = 20)
        - jdouble(c \ "f_measure_m20")) < 1e-12, s"f_measure_m20 n=$n")
      assert(math.abs(Eval.covering(cpsTrue, cpsPred, n)
        - jdouble(c \ "covering")) < 1e-12, s"covering n=$n")
    }
    val m = g \ "multi"
    val anns = intMatrix(m \ "annotations").toSeq
    val pred = ints(m \ "cps_pred")
    val n = jint(m \ "n")
    assert(math.abs(Eval.fMeasure(anns, pred, margin = 5)
      - jdouble(m \ "f_measure")) < 1e-12, "multi-annotator f_measure")
    val multiCovering = anns.map(a => Eval.covering(a, pred, n)).sum / anns.length
    assert(math.abs(multiCovering - jdouble(m \ "covering")) < 1e-12, "multi-annotator covering")
  }
}
