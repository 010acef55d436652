package graft.kernel

/** Segmentation evaluation metrics, ported for test parity.
  *
  * Semantics follow `/root/reference/claspy/tests/evaluation.py`:
  * relative_change_point_distance (:6-30 — each *predicted* cp matched to its
  * nearest true cp), _true_positives (:33-61 — greedy margin matching over
  * the true set, closest-then-smallest tie-break), f_measure (:64-106 —
  * multi-annotator, 0 added to every set, F = PR/(αR+(1-α)P)), and covering
  * (:109-210 — length-weighted best-Jaccard of true vs predicted partitions,
  * averaged over annotators).
  */
object Eval {

  /** evaluation.py:6-30. Requires equal lengths like the reference. */
  def relativeChangePointDistance(cpsTrue: Array[Int], cpsPred: Array[Int], tsLen: Int): Double = {
    require(cpsTrue.length == cpsPred.length, "true/predicted cps must have the same length.")
    var differences = 0L
    for (p <- cpsPred) {
      var best = Long.MaxValue
      for (t <- cpsTrue) { val d = math.abs(p.toLong - t); if (d < best) best = d }
      differences += best
    }
    math.round(differences.toDouble / (cpsTrue.length.toLong * tsLen) * 1e6) / 1e6
  }

  /** evaluation.py:33-61 — TP(T, X): for each tau in T, match the closest
    * unused x in X within margin (ties -> smaller x). */
  private def truePositives(t: Set[Int], xIn: Set[Int], margin: Int): Set[Int] = {
    val x = scala.collection.mutable.SortedSet.empty[Int] ++ xIn
    val tp = scala.collection.mutable.Set.empty[Int]
    for (tau <- t.toSeq.sorted) {
      val close = x.toSeq.collect { case v if math.abs(tau - v) <= margin => (math.abs(tau - v), v) }.sorted
      if (close.nonEmpty) {
        tp += tau
        x -= close.head._2
      }
    }
    tp.toSet
  }

  /** evaluation.py:64-106 — multi-annotator F-measure; alpha=.5 is F1. */
  def fMeasure(annotations: Seq[Array[Int]], predictions: Array[Int],
               margin: Int = 5, alpha: Double = 0.5): Double = {
    val tks = annotations.map(a => a.toSet + 0)
    val x = predictions.toSet + 0
    val tStar = tks.flatten.toSet
    val k = tks.length
    val p = truePositives(tStar, x, margin).size.toDouble / x.size
    val r = tks.map(tk => truePositives(tk, x, margin).size.toDouble / tk.size).sum / k
    p * r / (alpha * r + (1 - alpha) * p)
  }

  def fMeasure(annotation: Array[Int], predictions: Array[Int], margin: Int): Double =
    fMeasure(Seq(annotation), predictions, margin)

  private def partitionFromCps(cps: Array[Int], n: Int): Array[(Int, Int)] = {
    val inner = cps.toSet.toArray.sorted.filter(c => c > 0 && c < n)
    val bounds = Array(0) ++ inner ++ Array(n)
    bounds.sliding(2).map(a => (a(0), a(1))).toArray
  }

  /** evaluation.py:160-210 — covering of one annotation by the prediction. */
  def covering(cpsTrue: Array[Int], cpsPred: Array[Int], tsLen: Int): Double = {
    val truth = partitionFromCps(cpsTrue, tsLen)
    val pred = partitionFromCps(cpsPred, tsLen)
    var total = 0.0
    for ((ts, te) <- truth) {
      var bestJ = 0.0
      for ((ps, pe) <- pred) {
        val inter = math.max(0, math.min(te, pe) - math.max(ts, ps))
        val union = math.max(te, pe) - math.min(ts, ps)
        val j = if (union > 0) inter.toDouble / union else 0.0
        if (j > bestJ) bestJ = j
      }
      total += (te - ts).toDouble * bestJ
    }
    total / tsLen
  }

  /** Adjusted mutual information between two labelings — the metric of the
    * reference's state-detection floor tests
    * (`claspy/tests/state_detection_test.py:25,47`). Standard published
    * formula (Vinh et al. 2010), arithmetic normalizer like sklearn's
    * default: AMI = (MI − E[MI]) / (mean(H(U), H(V)) − E[MI]), with E[MI]
    * the hypergeometric expectation computed via log-gamma. */
  def adjustedMutualInfo(a: Array[Int], b: Array[Int]): Double = {
    require(a.length == b.length && a.nonEmpty)
    val n = a.length
    val ua = a.distinct.sorted
    val ub = b.distinct.sorted
    val ia = ua.zipWithIndex.toMap
    val ib = ub.zipWithIndex.toMap
    val cont = Array.ofDim[Long](ua.length, ub.length)
    for (k <- a.indices) cont(ia(a(k)))(ib(b(k))) += 1
    val ai = Array.tabulate(ua.length)(i => cont(i).sum)
    val bj = Array.tabulate(ub.length)(j => cont.map(_(j)).sum)
    if (ua.length == 1 && ub.length == 1) return 1.0

    def h(counts: Array[Long]): Double =
      -counts.filter(_ > 0).map { c => val p = c.toDouble / n; p * math.log(p) }.sum
    val hu = h(ai); val hv = h(bj)

    var mi = 0.0
    for (i <- ua.indices; j <- ub.indices if cont(i)(j) > 0) {
      val nij = cont(i)(j).toDouble
      mi += (nij / n) * math.log(n * nij / (ai(i).toDouble * bj(j)))
    }

    import org.apache.commons.math3.special.Gamma.logGamma
    def lf(x: Long): Double = logGamma(x + 1.0)
    var emi = 0.0
    for (i <- ua.indices; j <- ub.indices) {
      val lo = math.max(1L, ai(i) + bj(j) - n)
      val hi = math.min(ai(i), bj(j))
      var nij = lo
      while (nij <= hi) {
        val term1 = nij.toDouble / n * math.log(n.toDouble * nij / (ai(i).toDouble * bj(j)))
        val logP = lf(ai(i)) + lf(bj(j)) + lf(n - ai(i)) + lf(n - bj(j)) -
          lf(n) - lf(nij) - lf(ai(i) - nij) - lf(bj(j) - nij) - lf(n - ai(i) - bj(j) + nij)
        emi += term1 * math.exp(logP)
        nij += 1
      }
    }

    val normalizer = (hu + hv) / 2.0
    val denom0 = normalizer - emi
    // sklearn clamps with np.finfo('float64').eps (machine epsilon), NOT the
    // smallest subnormal — MIN_VALUE here let near-zero denominators blow up
    // to +/-Infinity where sklearn returns a bounded score.
    val eps = 2.220446049250313e-16
    val denom = if (denom0 < 0) math.min(denom0, -eps) else math.max(denom0, eps)
    (mi - emi) / denom
  }

  /** create_state_labels (utils.py:203-240): densify (cps, segment labels). */
  def createStateLabels(cps: Array[Int], labels: Array[Int], tsLen: Int): Array[Int] = {
    val segments = Array(0) ++ cps ++ Array(tsLen)
    val out = new Array[Int](tsLen)
    var idx = 1
    while (idx < segments.length) {
      var i = segments(idx - 1)
      while (i < segments(idx)) { out(i) = labels(idx - 1); i += 1 }
      idx += 1
    }
    out
  }
}
