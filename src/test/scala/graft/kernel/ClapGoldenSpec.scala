package graft.kernel

import org.json4s._
import org.scalatest.funsuite.AnyFunSuite

/** Exact parity of the CLaP / state-detection layer against the REFERENCE
  * run by tools/gen_golden.py (claspy.clap + claspy.state_detection executed
  * with faithful numpy stubs for sklearn and a shared deterministic 1-NN in
  * the external-classifier slot — see gen_golden.py §8). */
class ClapGoldenSpec extends AnyFunSuite {
  import GoldenJson._

  private def field(v: JValue, name: String): JValue = v \ name

  test("numpy RandomState.shuffle/permutation parity") {
    val g = load("sklearn_prim")
    for (c <- (g \ "permutations").asInstanceOf[JArray].arr) {
      val n = ints(JArray(List(field(c, "n"))))(0)
      val seed = ints(JArray(List(field(c, "seed"))))(0)
      val expected = ints(field(c, "perm"))
      val got = new NumpyRandom(seed.toLong).permutation(n)
      assert(got.sameElements(expected), s"perm(n=$n, seed=$seed)")
    }
  }

  test("sklearn KFold(shuffle=True) split parity") {
    val g = load("sklearn_prim")
    for (c <- (g \ "kfolds").asInstanceOf[JArray].arr) {
      val n = ints(JArray(List(field(c, "n"))))(0)
      val k = ints(JArray(List(field(c, "k"))))(0)
      val seed = ints(JArray(List(field(c, "seed"))))(0)
      val folds = (field(c, "folds")).asInstanceOf[JArray].arr
      val got = SklearnKit.kfoldShuffled(n, k, seed.toLong)
      assert(got.length == folds.length)
      for ((fold, i) <- folds.zipWithIndex) {
        assert(got(i)._1.sameElements(ints(field(fold, "train"))), s"train fold $i n=$n")
        assert(got(i)._2.sameElements(ints(field(fold, "test"))), s"test fold $i n=$n")
      }
    }
  }

  test("CLaP dataset, subselect, cross-val and score match the reference") {
    val g = load("clap")
    val ts = Array(doubles(g \ "ts"))
    val nCps = ints(g \ "cps").length
    val stateLabels = Eval.createStateLabels(ints(g \ "cps"), Array.range(0, nCps + 1), ts(0).length)
    for (c <- (g \ "cases").asInstanceOf[JArray].arr) {
      val w = ints(JArray(List(field(c, "window_size"))))(0)
      val ss = ints(JArray(List(field(c, "sample_size"))))(0)
      val clap = new Clap(w, NN1Classifier, 5, ss, 2357L)

      val (x, y, starts) = clap.createDataset(ts, stateLabels)
      assert(y.sameElements(ints(field(c, "dataset_y"))), s"dataset y (w=$w)")
      assert(starts.sameElements(ints(field(c, "dataset_starts"))), s"starts (w=$w)")

      val sel = clap.subselectIndices(y)
      assert(sel.sameElements(ints(field(c, "subselect_idx"))), s"subselect (w=$w ss=$ss)")
      assert(sel.map(y).sameElements(ints(field(c, "subselect_y"))))

      val (yt, yp) = clap.crossVal(sel.map(x), sel.map(y))
      assert(yt.sameElements(ints(field(c, "y_true"))), s"y_true (w=$w ss=$ss)")
      assert(yp.sameElements(ints(field(c, "y_pred"))), s"y_pred (w=$w ss=$ss)")

      clap.yTrue = yt; clap.yPred = yp; clap.isFitted = true
      val expectedScore = doubles(JArray(List(field(c, "score"))))(0)
      assert(clap.score() == expectedScore, s"f1 macro score exact (w=$w ss=$ss)")
    }
  }

  test("AgglomerativeCLaPDetection merge loop and process match the reference") {
    val g = load("state_detection")
    for (c <- (g \ "cases").asInstanceOf[JArray].arr) {
      val name = field(c, "name").asInstanceOf[JString].s
      val dims = doubleMatrix(field(c, "dims"))
      val ss = ints(JArray(List(field(c, "sample_size"))))(0)
      val wParam = field(c, "window_size_param") match {
        case JNull => -1
        case JInt(i) => i.toInt
        case JLong(l) => l.toInt
        case other => throw new IllegalArgumentException(other.toString)
      }
      val det = new AgglomerativeClapDetection(
        windowSizeMethod = "suss", fixedWindowSize = wParam,
        classifier = NN1Classifier, nSplits = 5, sampleSize = ss, randomState = 2357L)
      val cpsIn = field(c, "cps_in") match {
        case JNull => null
        case arr => ints(arr)
      }
      val res = det.fit(dims, cpsIn)
      assert(res.windowSize == ints(JArray(List(field(c, "resolved_window"))))(0), s"$name window")
      assert(res.changePointsIn.sameElements(ints(field(c, "detected_cps_in"))), s"$name cps_in")
      assert(res.labels.sameElements(ints(field(c, "labels"))), s"$name merged labels")
      assert(res.segmentLabels.sameElements(ints(field(c, "segment_labels"))), s"$name segment labels")
      assert(res.changePoints.sameElements(ints(field(c, "change_points"))), s"$name change points")
      assert(res.predictDense.sameElements(ints(field(c, "dense"))), s"$name dense")
      val (states, transitions) = res.process
      assert(states == ints(field(c, "states")).toSet, s"$name states")
      val expTrans = intMatrix(field(c, "transitions")).map(p => (p(0), p(1))).toSet
      assert(transitions == expTrans, s"$name transitions")
    }
  }

  test("rocket classifier recovers recurring states (AMI floor)") {
    // production-path quality floor in the spirit of the reference's own
    // AMI >= .77 TSSB floor (claspy/tests/state_detection_test.py:17-31),
    // on synthetic recurring-state fixtures
    def genStateSeries(pattern: Array[Int], segLen: Int, seed: Int): (Array[Double], Array[Int], Array[Int]) = {
      val rng = new java.util.Random(seed)
      val n = pattern.length * segLen
      val ts = new Array[Double](n)
      val truth = new Array[Int](n)
      var i = 0
      for (st <- pattern) {
        var t = 0
        while (t < segLen) {
          ts(i) = st match {
            case 0 => math.sin(2 * math.Pi * t / 10.0) + 0.1 * rng.nextGaussian()
            case 1 => 0.5 * math.sin(2 * math.Pi * t / 31.0) + 2.0 + 0.1 * rng.nextGaussian()
            case _ => 0.2 * rng.nextGaussian() - 1.5
          }
          truth(i) = st
          i += 1; t += 1
        }
      }
      val cps = Array.tabulate(pattern.length - 1)(k => segLen * (k + 1))
      (ts, truth, cps)
    }
    val scores = for ((pattern, segLen, seed) <- Seq(
        (Array(0, 1, 0, 1), 150, 1),
        (Array(0, 1, 2, 0, 1, 2), 120, 2),
        (Array(0, 2, 0, 2), 200, 3))) yield {
      val (ts, truth, cps) = genStateSeries(pattern, segLen, seed)
      val det = new AgglomerativeClapDetection(fixedWindowSize = 10,
        classifier = new RocketClassifier(), sampleSize = 1000)
      val dense = det.fit(Array(ts), cps).predictDense
      Eval.adjustedMutualInfo(truth, dense)
    }
    val mean = scores.sum / scores.length
    assert(mean >= 0.77, s"mean AMI $mean (per-case: $scores)")

    // every alternative production classifier must clear the same floor on
    // the same fixtures (quant = interval quantiles, boss = SAX dictionary,
    // weasel = SFA words, rdst = dilated shapelets, freshprince = summary
    // features, mrhydra = competing kernels, proximityforest =
    // elastic-distance tree ensemble — the full clap.py:189-209 grid minus
    // inception, the one slot that needs a deep net we can't honestly
    // rebuild here)
    for (clfName <- Seq("quant", "boss", "weasel", "rdst", "freshprince",
        "mrhydra", "proximityforest")) {
      val altScores = for ((pattern, segLen, seed) <- Seq(
          (Array(0, 1, 0, 1), 150, 1),
          (Array(0, 1, 2, 0, 1, 2), 120, 2),
          (Array(0, 2, 0, 2), 200, 3))) yield {
        val (ts, truth, cps) = genStateSeries(pattern, segLen, seed)
        val det = new AgglomerativeClapDetection(fixedWindowSize = 10,
          classifier = WindowClassifier.byName(clfName), sampleSize = 1000)
        val dense = det.fit(Array(ts), cps).predictDense
        Eval.adjustedMutualInfo(truth, dense)
      }
      val altMean = altScores.sum / altScores.length
      assert(altMean >= 0.77, s"$clfName mean AMI $altMean (per-case: $altScores)")
    }
  }

  test("transition probabilities row-normalize the segment sequence") {
    val (states, counts, probs) = AgglomerativeClapDetection.transitionProbs(
      Array(1, 2, 1, 2, 3, 1))
    assert(states.sameElements(Array(1, 2, 3)))
    assert(counts(0).sameElements(Array(0L, 2L, 0L))) // 1->2 twice
    assert(counts(1).sameElements(Array(1L, 0L, 1L))) // 2->1, 2->3
    assert(probs(1).sameElements(Array(0.5, 0.0, 0.5)))
    assert(probs(2).sameElements(Array(1.0, 0.0, 0.0))) // 3->1
  }
}
