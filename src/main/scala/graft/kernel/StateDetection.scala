package graft.kernel

/** Result of agglomerative state detection on one series: per-segment state
  * labels (1..k), the surviving change points between DIFFERENT states, and
  * the sparse process (states + transitions). */
final case class StateDetectionResult(
    windowSize: Int,
    changePointsIn: Array[Int],
    labels: Array[Int], // one per original segment, mapped 1..k
    mergedYTrue: Array[Int],
    mergedYPred: Array[Int],
    tsLen: Int) {

  /** state_detection.py:317-333 — collapse consecutive equal labels. */
  def segmentLabels: Array[Int] = {
    val out = scala.collection.mutable.ArrayBuffer(labels(0))
    var i = 1
    while (i < labels.length) {
      if (out.last != labels(i)) out += labels(i)
      i += 1
    }
    out.toArray
  }

  /** state_detection.py:335-353 — cps where the merged label changes. */
  def changePoints: Array[Int] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    var last = labels(0)
    var i = 1
    while (i < labels.length) {
      if (labels(i) != last) { out += changePointsIn(i - 1); last = labels(i) }
      i += 1
    }
    out.toArray
  }

  /** Dense per-timepoint state labels (predict(), state_detection.py:202-222). */
  def predictDense: Array[Int] =
    Eval.createStateLabels(changePoints, segmentLabels, tsLen)

  /** state_detection.py:355-370 — (states, transitions) sets. */
  def process: (Set[Int], Set[(Int, Int)]) = {
    val segs = segmentLabels
    (segs.toSet, (0 until segs.length - 1).map(i => (segs(i), segs(i + 1))).toSet)
  }

  /** Classification gain of the merged labeling (state_detection.py:280-298).
    * NOTE: the reference's `score()` dereferences an unfitted `self.clap`
    * (`state_detection.py:195-197` fits the local variable instead) and
    * raises; this returns what that code clearly intends. */
  def score: Double = AgglomerativeClapDetection.classificationGain(mergedYTrue, mergedYPred)
}

/** Agglomerative state detection with CLaP — port of
  * `/root/reference/claspy/state_detection.py:15-370` (plotting excluded):
  * segment the series (or take given change points), CLaP-classify windows,
  * then greedily merge the most confused label pairs while the
  * classification gain does not decrease.
  */
final class AgglomerativeClapDetection(
    val windowSizeMethod: String = "suss", // or null with fixedWindowSize
    val fixedWindowSize: Int = -1,
    val classifier: WindowClassifier = new RocketClassifier(),
    val nSplits: Int = 5,
    val sampleSize: Int = 1000,
    val randomState: Long = 2357L) extends Serializable {
  import AgglomerativeClapDetection._

  /** state_detection.py:91-200. `ts` is dim-major. */
  // one-shot warning latch for the np.argsort-tie-order boundary (see merge loop)
  private var argsortBoundaryLogged = false

  def fit(ts: Array[Array[Double]], changePointsIn: Array[Int] = null): StateDetectionResult = {
    val n = ts(0).length
    val cps =
      if (changePointsIn != null) changePointsIn
      else new BinaryClaSPSegmentation().fitPredict(ts)

    // :119-128 — window size: mean over per-dim detections, floor to int
    val w =
      if (fixedWindowSize > 0) fixedWindowSize
      else {
        val wss = WindowSize.byName(windowSizeMethod)
        val ws = ts.map(dim => math.max(1, wss(dim)))
        if (ws.nonEmpty) (ws.map(_.toDouble).sum / ws.length).toInt else 10
      }

    val labels = Array.range(0, cps.length + 1)
    val stateLabels = Eval.createStateLabels(cps, labels, n)
    val clap = new Clap(w, classifier, nSplits, sampleSize, randomState)
    val (y0, p0) = clap.fitTransform(ts, stateLabels)
    val yTrue = y0.clone()
    val yPred = p0.clone()

    // :140-189 — merge loop
    var merged = true
    val ignoreCache = scala.collection.mutable.Set.empty[String]
    while (merged && labels.distinct.length > 1) {
      val uniqueLabels = labels.distinct.sorted
      val confLoss = new Array[Double](uniqueLabels.length)
      val confIndex = new Array[Int](uniqueLabels.length)
      val (_, cm) = SklearnKit.confusionMatrix(yTrue, yPred)
      require(cm.length <= uniqueLabels.length,
        "confusion matrix larger than alive labels (cannot happen when y ⊆ labels)")
      var idx = 0
      while (idx < cm.length) {
        val row = cm(idx)
        var am = 0; var mv = Long.MinValue
        var sum = 0L
        var j = 0
        while (j < row.length) {
          val v = if (j == idx) 0L else row(j) // drop TPs
          if (v > mv) { mv = v; am = j }
          sum += row(j)
          j += 1
        }
        confIndex(idx) = am
        confLoss(idx) = mv.toDouble / sum
        idx += 1
      }

      merged = false
      // np.argsort(...)[::-1]: numpy's introsort degenerates to a stable
      // insertion sort for <=16 elements, so stable-ascending-then-reverse
      // is exact for any series with <=16 alive segments (golden fixtures
      // stay under that; beyond it only the tie order could differ)
      if (uniqueLabels.length > 16 && !argsortBoundaryLogged) {
        argsortBoundaryLogged = true
        System.err.println(
          s"[graft] CLaP merge with ${uniqueLabels.length} alive labels: " +
            "np.argsort tie order is only guaranteed exact for <=16; " +
            "conf_loss TIES beyond this may merge in a different order than numpy")
      }
      val desc = confLoss.indices.sortBy(confLoss).reverse
      val it = desc.iterator
      while (!merged && it.hasNext) {
        val i = it.next()
        val label1 = uniqueLabels(i)
        val label2 = uniqueLabels(confIndex(i))
        if (label1 != label2 && labels.contains(label1) && labels.contains(label2)) {
          val key = {
            val sb = new java.lang.StringBuilder(yTrue.length)
            var k = 0
            while (k < yTrue.length) {
              sb.append(if (yTrue(k) == label1 || yTrue(k) == label2) '1' else '0')
              k += 1
            }
            sb.toString
          }
          if (!ignoreCache.contains(key)) {
            val yT2 = yTrue.map(v => if (v == label2) label1 else v)
            val yP2 = yPred.map(v => if (v == label2) label1 else v)
            if (classificationGain(yTrue, yPred) > classificationGain(yT2, yP2)) {
              ignoreCache += key
            } else {
              // absorb the smaller label into the larger (:180-186)
              val keep = math.max(label1, label2)
              val drop = math.min(label1, label2)
              var k = 0
              while (k < labels.length) { if (labels(k) == drop) labels(k) = keep; k += 1 }
              k = 0
              while (k < yTrue.length) {
                if (yTrue(k) == drop) yTrue(k) = keep
                if (yPred(k) == drop) yPred(k) = keep
                k += 1
              }
              merged = true
            }
          }
        }
      }
    }

    // :191-194 — map labels to 1..k by sorted unique
    val mapping = labels.distinct.sorted.zipWithIndex.map { case (l, i) => l -> (i + 1) }.toMap
    StateDetectionResult(w, cps, labels.map(mapping), yTrue, yPred, n)
  }

  def fitPredict(ts: Array[Array[Double]], changePointsIn: Array[Int] = null): Array[Int] =
    fit(ts, changePointsIn).predictDense
}

object AgglomerativeClapDetection {

  /** Expected macro-F1 of a random classifier (state_detection.py:246-278). */
  def randomF1Score(yTrue: Array[Int]): Double = {
    val labels = yTrue.distinct.sorted
    val n = yTrue.length
    var score = 0.0
    for (label <- labels) {
      var pos = 0L
      var i = 0
      while (i < n) { if (yTrue(i) == label) pos += 1; i += 1 }
      val neg = n - pos
      val tp = (pos * pos).toDouble / n
      val fn = (pos * neg).toDouble / n
      val fp = (neg * pos).toDouble / n
      val pre = tp / (tp + fp)
      val re = tp / (tp + fn)
      if (pre + re > 0) score += 2.0 * (pre * re) / (pre + re)
    }
    score / labels.length
  }

  /** Macro-F1 minus the random baseline (state_detection.py:280-298). */
  def classificationGain(yTrue: Array[Int], yPred: Array[Int]): Double =
    SklearnKit.f1Macro(yTrue, yPred) - randomF1Score(yTrue)

  /** Transition counts + row-normalized probabilities over a segment-label
    * sequence (the process-graph edge weights, state_detection.py:430-441).
    * Returns (sorted unique states, counts, probabilities). */
  def transitionProbs(segmentLabels: Array[Int])
      : (Array[Int], Array[Array[Long]], Array[Array[Double]]) = {
    val states = segmentLabels.distinct.sorted
    val index = states.zipWithIndex.toMap
    val counts = Array.ofDim[Long](states.length, states.length)
    var i = 0
    while (i < segmentLabels.length - 1) {
      counts(index(segmentLabels(i)))(index(segmentLabels(i + 1))) += 1
      i += 1
    }
    val probs = counts.map { row =>
      val s = row.sum
      row.map(c => if (s > 0) c.toDouble / s else 0.0)
    }
    (states, counts, probs)
  }
}
