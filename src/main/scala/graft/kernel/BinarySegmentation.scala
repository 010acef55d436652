package graft.kernel

/** Best-first binary segmentation driven by ClaSP ensembles.
  *
  * Semantics follow `BinaryClaSPSegmentation` in
  * `/root/reference/claspy/segmentation.py:184-335`: per-dimension window-size
  * learning `max(3, method(dim)//2)` then min across dims (:205-211),
  * `min_seg_size = window_size * excl_radius` (:213), degenerate-input
  * downgrade to one segment (:215-220), threshold defaults 1e-15 (1-D) /
  * 1e-30 (d-D) (:225-232), `n_segments="learn"` -> n // min_seg_size (:237),
  * best-first expansion via a priority queue ordered by (-score, insertion
  * index) (:234, 265-286), profile max-merge (:275-276), cp validity spacing
  * (:104-125) and final NaN interpolation clamped at both ends (:291-292,
  * pandas `interpolate(limit_direction="both")`).
  */
final case class SegmentationResult(
    changePoints: Array[Int],
    scores: Array[Double],
    profile: Array[Double],
    windowSize: Int,
    nTimepoints: Int) {
  /** Dense per-point segment ids 0..k (cps are segment starts). */
  def segmentLabels: Array[Int] = {
    val out = new Array[Int](nTimepoints)
    var seg = 0
    var next = 0
    var i = 0
    while (i < nTimepoints) {
      if (next < changePoints.length && i == changePoints(next)) { seg += 1; next += 1 }
      out(i) = seg
      i += 1
    }
    out
  }
}

final class BinaryClaSPSegmentation(
    val nSegments: Int = -1, // -1 == "learn"
    val nEstimators: Int = 10,
    val windowSizeMethod: String = "suss", // used when windowSize <= 0
    val windowSizeFixed: Int = -1,
    val kNeighbours: Int = 3,
    val distanceName: String = "znormed_euclidean_distance",
    val scoreName: String = "roc_auc",
    val earlyStopping: Boolean = true,
    val validation: String = "significance_test",
    val thresholdIn: Double = Double.NaN, // NaN == "default"
    val exclRadius: Int = 5,
    val randomState: Long = 2357L) extends Serializable {

  require(exclRadius > kNeighbours, "Exclusion radius must be larger than the number of neighbours used.")

  /** Fit on a dim-major series (d arrays of length n). */
  def fit(ts: Array[Array[Double]]): SegmentationResult = {
    val d = ts.length
    val n = ts(0).length

    // window size learning (segmentation.py:205-211)
    var windowSize =
      if (windowSizeFixed > 0) windowSizeFixed
      else {
        val method = WindowSize.byName(windowSizeMethod)
        var minWs = Int.MaxValue
        var dim = 0
        while (dim < d) {
          val ws = math.max(3, method(ts(dim)) / 2)
          if (ws < minWs) minWs = ws
          dim += 1
        }
        minWs
      }

    // NOTE: min_seg_size is bound BEFORE the degenerate-window shrink, like
    // the reference (segmentation.py:213 vs :220)
    val minSegSize = windowSize * exclRadius
    var numSegments = nSegments
    if (n < 2 * minSegSize) {
      numSegments = 1
      windowSize = math.min(windowSize, n / 2)
    }

    val threshold =
      if (!thresholdIn.isNaN) thresholdIn
      else validation match {
        case "score_threshold" => 0.75
        case "significance_test" => if (d == 1) 1e-15 else 1e-30
        case _ => Double.NaN
      }

    if (numSegments < 0) numSegments = n / minSegSize

    def cpIsValid(candidate: Int, changePoints: List[Int]): Boolean = {
      (0 :: changePoints ::: List(n)).forall { cp =>
        val leftBegin = math.max(0, cp - minSegSize)
        val rightEnd = math.min(n, cp + minSegSize)
        candidate < leftBegin || candidate >= rightEnd
      }
    }

    // priority queue ordered like Python's (-score, insertion_idx) min-heap
    implicit val ord: Ordering[(Double, Int)] =
      Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Int).reverse
    val queue = scala.collection.mutable.PriorityQueue.empty[(Double, Int)]
    val tree = scala.collection.mutable.ArrayBuffer.empty[((Int, Int), ClaSPModel)]

    var profile: Array[Double] = null

    def localSegmentation(lbound: Int, ubound: Int, changePoints: List[Int]): Unit = {
      if (ubound - lbound < 2 * minSegSize) return
      val sub = ts.map(dim => java.util.Arrays.copyOfRange(dim, lbound, ubound))
      val clasp = ClaSP.fitEnsemble(sub, nEstimators, windowSize, kNeighbours,
        distanceName, scoreName, earlyStopping, exclRadius, randomState,
        validation, threshold)
      clasp.split(validation, threshold) match {
        case None => ()
        case Some(cp) =>
          val score = clasp.profile(cp)
          if (cpIsValid(lbound + cp, changePoints)) {
            tree += (((lbound, ubound), clasp))
            queue.enqueue((-score, tree.length - 1))
          }
      }
    }

    if (numSegments > 1) {
      val clasp = ClaSP.fitEnsemble(ts, nEstimators, windowSize, kNeighbours,
        distanceName, scoreName, earlyStopping, exclRadius, randomState,
        validation, threshold)
      clasp.split(validation, threshold) match {
        case Some(cp) if cpIsValid(cp, Nil) =>
          tree += (((0, n), clasp))
          queue.enqueue((-clasp.profile(cp), tree.length - 1))
        case _ => ()
      }
      profile = tree.headOption.map(_._2.profile).getOrElse(clasp.profile)
    } else {
      profile = Array.fill(n - windowSize + 1)(Double.NegativeInfinity)
    }

    var changePoints = List.empty[Int]
    var scores = List.empty[Double]

    var idx = 0
    var break_ = false
    while (idx < numSegments - 1 && !break_) {
      if (queue.isEmpty) break_ = true
      else {
        val (priority, treeIdx) = queue.dequeue()
        val ((lbound, ubound), clasp) = tree(treeIdx)
        val cp = lbound + clasp.split(validation, threshold).getOrElse(clasp.argmax)
        // profile max-merge (segmentation.py:275-276)
        var i = lbound
        while (i < ubound - windowSize + 1) {
          val v = clasp.profile(i - lbound)
          if (v > profile(i)) profile(i) = v
          i += 1
        }
        changePoints = cp :: changePoints
        scores = -priority :: scores
        if (changePoints.length == numSegments - 1) break_ = true
        else {
          localSegmentation(lbound, cp, changePoints)
          localSegmentation(cp, ubound, changePoints)
        }
      }
      idx += 1
    }

    val cpsArr = changePoints.reverse.toArray
    val scoresArr = scores.reverse.toArray
    val order = cpsArr.indices.sortBy(cpsArr(_)).toArray
    val cpsSorted = order.map(cpsArr(_))
    val scoresSorted = order.map(scoresArr(_))

    // ±inf -> NaN, then linear interpolation clamped at both ends
    val interp = interpolateProfile(profile)

    SegmentationResult(cpsSorted, scoresSorted, interp, windowSize, n)
  }

  /** pandas Series.interpolate(limit_direction="both") over a profile whose
    * ±inf entries became NaN: interior gaps linear, ends clamped. */
  private def interpolateProfile(profileIn: Array[Double]): Array[Double] = {
    val p = profileIn.map(v => if (v.isInfinite) Double.NaN else v)
    val n = p.length
    val valid = (0 until n).filter(i => !p(i).isNaN)
    if (valid.isEmpty) return p
    val out = new Array[Double](n)
    var vi = 0
    var i = 0
    while (i < n) {
      if (!p(i).isNaN) out(i) = p(i)
      else if (i < valid.head) out(i) = p(valid.head)
      else if (i > valid.last) out(i) = p(valid.last)
      else {
        while (valid(vi + 1) < i) vi += 1
        val j1 = valid(vi); val j2 = valid(vi + 1)
        out(i) = p(j1) + (p(j2) - p(j1)) * (i - j1).toDouble / (j2 - j1)
      }
      i += 1
    }
    out
  }

  def fitPredict(ts: Array[Array[Double]]): Array[Int] = fit(ts).changePoints

  /** Univariate convenience. */
  def fitPredict(ts: Array[Double]): Array[Int] = fitPredict(Array(ts))
}
