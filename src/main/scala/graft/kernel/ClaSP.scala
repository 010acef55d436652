package graft.kernel

/** ClaSP: classification-score profile over a fitted k-NN table.
  *
  * Semantics follow `/root/reference/claspy/clasp.py`: _profile (:14-46),
  * ClaSP.fit (:145-209 — profile evaluated on splits
  * [min_seg_size, n_offsets - min_seg_size + window_size) with -inf
  * elsewhere), split (:245-285 — argmax gated by a validation test), and
  * ClaSPEnsemble (:288-443 — seeded temporal-constraint sampling, shared knn,
  * per-tc profile rescaling `(p + (ub-lb)/n)/2`, keep-best with early
  * stopping, -inf canvas embedding).
  */
final class ClaSPModel(
    val windowSize: Int,
    val kNeighbours: Int,
    val scoreName: String,
    val exclRadius: Int,
    val knn: KSNModel,
    val profile: Array[Double],
    val lbound: Int,
    val ubound: Int) extends Serializable {

  def minSegSize: Int = windowSize * exclRadius

  /** argmax of the profile (first max wins, like np.argmax). */
  def argmax: Int = {
    var best = Double.NegativeInfinity
    var arg = 0
    var i = 0
    while (i < profile.length) {
      if (profile(i) > best) { best = profile(i); arg = i }
      i += 1
    }
    arg
  }

  /** clasp.py:245-285 — argmax gated by validation; None if rejected. */
  def split(validation: String, threshold: Double): Option[Int] = {
    val cp = argmax
    val ok = validation match {
      case null | "" => true
      case "significance_test" =>
        Validation.significanceTest(knn.offsetsFlat, knn.stride, lbound, windowSize, cp, threshold)
      case "score_threshold" =>
        Validation.scoreThreshold(profile, cp, threshold)
      case other => throw new IllegalArgumentException(
        s"$other is not a valid validation method.")
    }
    if (ok) Some(cp) else None
  }
}

object ClaSP {

  /** ClaSP.fit (clasp.py:145-209). `ts` is dim-major (d arrays of n). */
  def fit(ts: Array[Array[Double]], windowSize: Int, kNeighbours: Int,
          distanceName: String, scoreName: String, exclRadius: Int,
          knnIn: KSNModel = null): ClaSPModel = {
    val n = ts(0).length
    val minSegSize = windowSize * exclRadius
    require(exclRadius > kNeighbours, "Exclusion radius must be larger than the number of neighbours used.")
    require(n >= 2 * minSegSize, "Time series must at least have 2*min_seg_size data points.")

    val knn =
      if (knnIn != null) knnIn
      else new KSubsequenceNeighbours(windowSize, kNeighbours, distanceName).fit(ts)

    val nOff = knn.nOffsets
    // allocation-free hot loop: labels + scorer scratch reused across the
    // O(n) splits — the naive per-split allocations made the whole engine
    // GC-bound at high task parallelism
    val scorer = new Scoring.Scorer(scoreName, nOff)
    val yTrue = new Array[Int](nOff)
    val yPred = new Array[Int](nOff)
    val profile = Array.fill(nOff)(Double.NegativeInfinity)
    // 16-bit offset view when rows fit (chunk-bounded series always do):
    // halves the bytes the O(n²·k) profile loop streams; indices identical
    val offsShort: Array[Short] =
      if (nOff < 32768) {
        val flat = knn.offsetsFlat
        val a = new Array[Short](flat.length)
        var i = 0
        while (i < flat.length) { a(i) = flat(i).toShort; i += 1 }
        a
      } else null
    // single-prange decomposition (clasp.py:188-199 with n_jobs=1):
    val start = math.max(0, minSegSize)
    val end = math.min(nOff, nOff - minSegSize + windowSize)
    var split = start
    while (split < end) {
      if (offsShort != null)
        CrossVal.labelsIntoShort(offsShort, knn.stride, split, windowSize, yTrue, yPred)
      else
        CrossVal.labelsInto(knn.offsetsFlat, knn.stride, split, windowSize, yTrue, yPred)
      profile(split) = scorer(yTrue, yPred)
      split += 1
    }
    new ClaSPModel(windowSize, kNeighbours, scoreName, exclRadius, knn, profile, 0, n)
  }

  /** _calculate_temporal_constraints (clasp.py:335-357). */
  def temporalConstraints(n: Int, nEstimators: Int, minSegSize: Int, randomState: Long): Array[(Int, Int)] = {
    val tcs = scala.collection.mutable.ArrayBuffer[(Int, Int)]((0, n))
    val rng = new NumpyRandom(randomState)
    while (tcs.length < nEstimators && n > 3 * minSegSize) {
      val lbound = rng.randintBelow(n).toInt
      var area = rng.randintBelow(n).toInt
      if (n - lbound < area) area = n - lbound
      val ubound = lbound + area
      if (ubound - lbound >= 2 * minSegSize) tcs += ((lbound, ubound))
    }
    // python sorted(key=length, reverse=True) is stable; sortBy is stable too
    tcs.sortBy(tc => -(tc._2 - tc._1)).toArray
  }

  /** ClaSPEnsemble.fit (clasp.py:359-443). Returns the fitted ensemble model
    * (profile = -inf canvas with the best constrained profile embedded). */
  def fitEnsemble(ts: Array[Array[Double]], nEstimators: Int, windowSize: Int,
                  kNeighbours: Int, distanceName: String, scoreName: String,
                  earlyStopping: Boolean, exclRadius: Int, randomState: Long,
                  validation: String, threshold: Double): ClaSPModel = {
    val n = ts(0).length
    val minSegSize = windowSize * exclRadius
    require(n >= 2 * minSegSize, "Time series must at least have 2*min_seg_size data points.")

    val tcs = temporalConstraints(n, nEstimators, minSegSize, randomState)
    val knn = new KSubsequenceNeighbours(windowSize, kNeighbours, distanceName).fit(ts, tcs)

    var bestScore = Double.NegativeInfinity
    var bestTc: (Int, Int) = null
    var bestClasp: ClaSPModel = null

    var idx = 0
    var break_ = false
    while (idx < tcs.length && !break_) {
      val (lbound, ubound) = tcs(idx)
      val sub = ts.map(dim => java.util.Arrays.copyOfRange(dim, lbound, ubound))
      val clasp = fit(sub, windowSize, kNeighbours, distanceName, scoreName,
        exclRadius, knn.constrain(lbound, ubound))
      // rescale (clasp.py:420)
      val frac = (ubound - lbound).toDouble / n
      var i = 0
      while (i < clasp.profile.length) {
        clasp.profile(i) = (clasp.profile(i) + frac) / 2.0
        i += 1
      }
      var mx = Double.NegativeInfinity
      i = 0
      while (i < clasp.profile.length) { if (clasp.profile(i) > mx) mx = clasp.profile(i); i += 1 }

      if (mx > bestScore || (bestClasp == null && idx == tcs.length - 1)) {
        bestScore = mx
        bestTc = (lbound, ubound)
        bestClasp = clasp
      } else if (earlyStopping) break_ = true

      if (!break_ && earlyStopping && bestClasp != null &&
          bestClasp.split(validation, threshold).isDefined) break_ = true
      idx += 1
    }

    val canvas = Array.fill(n - windowSize + 1)(Double.NegativeInfinity)
    if (bestClasp != null) {
      System.arraycopy(bestClasp.profile, 0, canvas, bestTc._1, bestClasp.profile.length)
      new ClaSPModel(windowSize, kNeighbours, scoreName, exclRadius,
        bestClasp.knn, canvas, bestTc._1, bestTc._2)
    } else {
      new ClaSPModel(windowSize, kNeighbours, scoreName, exclRadius, knn, canvas, 0, n)
    }
  }
}
