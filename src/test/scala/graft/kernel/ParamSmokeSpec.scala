package graft.kernel

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.DataLoaders

/** Parameter-grid smoke coverage mirroring the reference's own config-grid
  * tests (`claspy/tests/segmentation_test.py:62-83`,
  * `claspy/tests/clap_test.py:26-48`): every combination must run and
  * produce structurally valid output. */
class ParamSmokeSpec extends AnyFunSuite {

  private def fixtureSeries(): Array[Double] = {
    val dir = new java.io.File(getClass.getResource("/loaders/tssb").toURI).getAbsolutePath
    DataLoaders.loadTssb(dir).head.timeSeries
  }

  test("segmentation runs across the reference's parameter grid") {
    val ts = fixtureSeries()
    for {
      nSeg <- Seq(1, -1) // 1 and "learn"
      wMethod <- Seq("suss", "fft", "acf")
      distance <- Seq("znormed_euclidean_distance", "euclidean_distance",
        "cinvariant_euclidean_distance")
      validation <- Seq(null, "significance_test", "score_threshold")
    } {
      val seg = new BinaryClaSPSegmentation(nSegments = nSeg,
        windowSizeMethod = wMethod, distanceName = distance, validation = validation)
      val res = seg.fit(Array(ts))
      val minSeg = res.windowSize * 5
      assert(res.changePoints.length <= ts.length / minSeg,
        s"($nSeg,$wMethod,$distance,$validation): too many cps")
      assert(res.changePoints.forall(c => c > 0 && c < ts.length))
      assert(res.changePoints.sorted.sameElements(res.changePoints))
      if (nSeg == 1) assert(res.changePoints.isEmpty)
    }
  }

  test("fixed window sizes run across the grid") {
    val ts = fixtureSeries()
    for (w <- Seq(10, 50, 100)) {
      val res = new BinaryClaSPSegmentation(windowSizeFixed = w).fit(Array(ts))
      assert(res.windowSize == w)
      assert(res.changePoints.forall(c => c > 0 && c < ts.length))
    }
  }

  test("CLaP runs across the reference's parameter grid") {
    val ts = fixtureSeries()
    val dir = new java.io.File(getClass.getResource("/loaders/tssb").toURI).getAbsolutePath
    val d = DataLoaders.loadTssb(dir).head
    // mirrors claspy/tests/clap_test.py:26-48 (window x classifier x splits
    // x sample_size product) with string dispatch, across every implemented
    // classifier name from the clap.py:189-209 grid
    for {
      w <- Seq(10, 50)
      clfName <- Seq("nn1", "rocket", "quant", "boss", "weasel", "rdst",
        "freshprince", "mrhydra", "proximityforest")
      nSplits <- Seq(3, 5)
      sampleSize <- Seq(50, 1000)
    } {
      val clf = WindowClassifier.byName(clfName)
      val clap = new Clap(w, clf, nSplits, sampleSize, 2357L)
      val (yTrue, yPred) = clap.fitTransform(Array(ts), d.labels)
      assert(yTrue.length <= d.labels.length && yPred.length == yTrue.length,
        s"(w=$w,${clf.name},$nSplits,$sampleSize)")
      val score = clap.score()
      assert(score >= 0.0 && score <= 1.0, s"score $score out of range")
    }
  }

  test("the inception grid slot is a recorded exclusion, not a silent gap") {
    // clap.py:206-208 lazily imports an InceptionTime deep CNN; the engine
    // records the decision not to reimplement a neural-net training stack
    val e = intercept[UnsupportedOperationException] {
      WindowClassifier.byName("inception")
    }
    assert(e.getMessage.contains("intentionally not implemented"))
    assert(e.getMessage.contains("out of scope"))
    // unknown names still get the reference's ValueError-style message
    val u = intercept[IllegalArgumentException](WindowClassifier.byName("nope"))
    assert(u.getMessage.contains("not supported"))
  }
}
