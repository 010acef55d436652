package graft.kernel

/** CLaP — state classification for labeled time-series segments.
  *
  * Port of `/root/reference/claspy/clap.py:16-300`: windowed dataset
  * construction with change-point exclusion zones (:77-115), seeded
  * per-class subsampling + order randomization (:117-153, numpy-RNG exact
  * via [[NumpyRandom]]), and k-fold cross-validated window classification
  * (:155-214, sklearn-KFold exact via [[SklearnKit.kfoldShuffled]]).
  *
  * Time series are dim-major (`ts(dim)(t)`), matching the segmentation
  * kernel; the reference's `(n, d)` ndarray maps to this via `.T`.
  */
final class Clap(
    val windowSize: Int = 10,
    val classifier: WindowClassifier = new RocketClassifier(),
    val nSplits: Int = 5,
    val sampleSize: Int = 1000,
    val randomState: Long = 2357L) extends Serializable {

  var yTrue: Array[Int] = _
  var yPred: Array[Int] = _
  var isFitted = false

  /** clap.py:77-115 — windows of `windowSize` at stride windowSize/2, skipping
    * any window whose START falls in an exclusion zone
    * `[cp - w/2 + 1, cp)` around a label change point. Windows flatten
    * dim-major (the reference's `window.T` row-major flatten). Returns
    * (X, y, window start indices — the starts are exposed for golden
    * parity checks). */
  def createDataset(ts: Array[Array[Double]], stateLabels: Array[Int])
      : (Array[Array[Double]], Array[Int], Array[Int]) = {
    val n = ts(0).length
    val d = ts.length
    val w = windowSize
    val stride = w / 2
    require(stride > 0, s"window_size $w too small (stride would be 0)")

    val excl = new Array[Boolean](n)
    var i = 0
    while (i < n - 1) {
      if (stateLabels(i) != stateLabels(i + 1)) {
        val cp = i + 1
        // python slice semantics: negative start wraps to n+start (and an
        // out-of-order slice is empty), so the zone vanishes for tiny cp
        val rawStart = cp - w / 2 + 1
        val lo = math.max(if (rawStart < 0) n + rawStart else rawStart, 0)
        var k = lo
        while (k < cp) { excl(k) = true; k += 1 }
      }
      i += 1
    }

    val xs = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
    val ys = scala.collection.mutable.ArrayBuffer.empty[Int]
    val starts = scala.collection.mutable.ArrayBuffer.empty[Int]
    var idx = 0
    while (idx <= n - w) {
      if (!excl(idx)) {
        val row = new Array[Double](d * w)
        var dim = 0
        while (dim < d) {
          System.arraycopy(ts(dim), idx, row, dim * w, w)
          dim += 1
        }
        xs += row
        ys += stateLabels(idx)
        starts += idx
      }
      idx += stride
    }
    (xs.toArray, ys.toArray, starts.toArray)
  }

  /** clap.py:117-153 — per-class cap at `sampleSize` via seeded
    * `choice(replace=False)`, then a full order-randomizing permutation.
    * One RNG freshly seeded with `randomState`, consumed in label order —
    * the exact global-`np.random` sequence of the reference. Returns the
    * selected GLOBAL indices in final order (callers gather X/y by them). */
  def subselectIndices(y: Array[Int]): Array[Int] = {
    val rng = new NumpyRandom(randomState)
    val labels = y.distinct.sorted
    val sel = scala.collection.mutable.ArrayBuffer.empty[Int]
    for (label <- labels) {
      val cand = Array.range(0, y.length).filter(y(_) == label)
      if (cand.length > sampleSize) sel ++= rng.choiceNoReplace(cand, sampleSize)
      else sel ++= cand
    }
    val order = rng.permutation(sel.length)
    order.map(sel)
  }

  /** clap.py:155-214 — KFold(shuffle=True, random_state) cross-validation;
    * (yTrue, yPred) assembled across all test folds. */
  def crossVal(x: Array[Array[Double]], y: Array[Int]): (Array[Int], Array[Int]) = {
    val k = math.min(x.length, nSplits)
    if (k < 2) return (y.clone(), y.clone()) // degenerate; reference's return here is malformed (np.copy([y]))
    val outTrue = new Array[Int](y.length)
    val outPred = new Array[Int](y.length)
    for ((trainIdx, testIdx) <- SklearnKit.kfoldShuffled(x.length, k, randomState)) {
      val pred = classifier.fitPredict(trainIdx.map(x), trainIdx.map(y), testIdx.map(x))
      var i = 0
      while (i < testIdx.length) {
        outTrue(testIdx(i)) = y(testIdx(i))
        outPred(testIdx(i)) = pred(i)
        i += 1
      }
    }
    (outTrue, outPred)
  }

  /** clap.py:216-245. With `yPredIn` given, labels are stored as-is. */
  def fit(ts: Array[Array[Double]], yTrueIn: Array[Int],
      yPredIn: Array[Int] = null): this.type = {
    if (yPredIn == null) {
      val (xAll, yAll, _) = createDataset(ts, yTrueIn)
      val idx = subselectIndices(yAll)
      val res = crossVal(idx.map(xAll), idx.map(yAll))
      yTrue = res._1; yPred = res._2
    } else {
      yTrue = yTrueIn; yPred = yPredIn
    }
    isFitted = true
    this
  }

  def transform(): (Array[Int], Array[Int]) = {
    require(isFitted, "CLaP object is not fitted yet.")
    (yTrue, yPred)
  }

  def fitTransform(ts: Array[Array[Double]], yTrueIn: Array[Int]): (Array[Int], Array[Int]) =
    fit(ts, yTrueIn).transform()

  /** clap.py:285-300 — macro-averaged F1 (sklearn semantics). */
  def score(): Double = {
    require(isFitted, "CLaP object is not fitted yet.")
    SklearnKit.f1Macro(yTrue, yPred)
  }
}
