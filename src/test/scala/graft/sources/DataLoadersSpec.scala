package graft.sources

import org.json4s._
import org.scalatest.funsuite.AnyFunSuite
import graft.kernel.{BinaryClaSPSegmentation, GoldenJson}

/** Loader parity vs the reference's own load_tssb_dataset/load_has_dataset
  * run on the SAME fixture files (gen_golden.py §10 writes the fixtures in
  * the benchmarks' exact on-disk formats and dumps what the reference
  * loader returns). */
class DataLoadersSpec extends AnyFunSuite {
  import GoldenJson._

  private def resourceDir(p: String): String =
    new java.io.File(getClass.getResource(p).toURI).getAbsolutePath

  private def jint(v: JValue): Int = v match {
    case JInt(i) => i.toInt
    case JLong(l) => l.toInt
    case other => throw new IllegalArgumentException(other.toString)
  }

  test("TSSB txt loader matches the reference loader and feeds segmentation") {
    val loaded = DataLoaders.loadTssb(resourceDir("/loaders/tssb"))
    val g = load("tssb_loader")
    val cases = (g \ "cases").asInstanceOf[JArray].arr
    assert(loaded.length == cases.length)
    for ((c, t) <- cases.zip(loaded)) {
      assert(t.dataset == (c \ "dataset").asInstanceOf[JString].s)
      assert(t.windowSize == jint(c \ "window_size"))
      assert(t.changePoints.sameElements(ints(c \ "cps")), s"${t.dataset} cps")
      assert(t.labels.sameElements(ints(c \ "labels")), s"${t.dataset} dense labels")
      assert(t.timeSeries.length == jint(c \ "ts_len"))
      assert(t.timeSeries.take(8).sameElements(doubles(c \ "ts_head")), s"${t.dataset} ts bits")
      // end-to-end: the loaded series segments exactly like the reference run
      val found = new BinaryClaSPSegmentation().fitPredict(t.timeSeries)
      assert(found.sameElements(ints(c \ "segmentation_cps")), s"${t.dataset} segmentation")
    }
  }

  test("HAS fixture drives multivariate state detection (AMI floor)") {
    // the spirit of the reference's HAS benchmark test
    // (claspy/tests/state_detection_test.py:33-53): numeric activity labels,
    // dense ground truth via create_state_labels, AMI against the detection
    val loaded = DataLoaders.loadHas(
      new java.io.File(resourceDir("/loaders/has"), "has.csv.zip").getAbsolutePath)
    val scores = loaded.map { h =>
      val actIds = h.activities.map(h.activities.distinct.sorted.indexOf(_))
      val truth = graft.kernel.Eval.createStateLabels(h.changePoints, actIds, h.dims(0).length)
      val det = new graft.kernel.AgglomerativeClapDetection(
        fixedWindowSize = 25, classifier = new graft.kernel.RocketClassifier())
      val dense = det.fit(h.dims, h.changePoints).predictDense
      graft.kernel.Eval.adjustedMutualInfo(truth, dense)
    }
    val mean = scores.sum / scores.length
    assert(mean >= 0.64, s"mean AMI $mean (per-case: $scores)")
  }

  test("HAS zipped-CSV loader matches the reference loader") {
    val loaded = DataLoaders.loadHas(
      new java.io.File(resourceDir("/loaders/has"), "has.csv.zip").getAbsolutePath)
    val g = load("has_loader")
    val cases = (g \ "cases").asInstanceOf[JArray].arr
    assert(loaded.length == cases.length)
    for ((c, h) <- cases.zip(loaded)) {
      assert(h.dataset == (c \ "dataset").asInstanceOf[JString].s)
      assert(h.windowSize == jint(c \ "window_size"))
      assert(h.changePoints.sameElements(ints(c \ "cps")), s"${h.dataset} cps")
      val expActs = (c \ "labels").asInstanceOf[JArray].arr.map(_.asInstanceOf[JString].s)
      assert(h.activities.toSeq == expActs, s"${h.dataset} activities")
      assert(h.dims.length == jint(c \ "n_dims"), s"${h.dataset} dims")
      assert(h.dims(0).length == jint(c \ "ts_len"))
      val heads = doubleMatrix(c \ "dims_head")
      for (d <- h.dims.indices)
        assert(h.dims(d).take(5).sameElements(heads(d)), s"${h.dataset} dim $d bits")
      // dims_sum was produced with np.sum (pairwise); compare with tolerance
      val sums = (c \ "dims_sum").asInstanceOf[JArray].arr.map(v =>
        java.lang.Double.parseDouble(v.asInstanceOf[JString].s))
      for (d <- h.dims.indices)
        assert(math.abs(h.dims(d).sum - sums(d)) < 1e-9, s"${h.dataset} dim $d sum")
    }
  }
}
