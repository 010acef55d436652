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
