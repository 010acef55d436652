package graft.kernel

/** Hypothetical-split cross-validation labels from the k-NN table.
  *
  * Semantics follow `cross_val_labels` in
  * `/root/reference/claspy/nearest_neighbour.py:280-323`: y_true is the step
  * function at the split; y_pred is the majority vote of each window's k
  * nearest neighbours' y_true (ties -> 0, strict `ones > zeros`); the
  * exclusion zone [split-w, split) is forced to 1.
  */
object CrossVal {

  /** Returns (yTrue, yPred), each of length offsets.length. */
  /** Allocation-free variant for the O(n) profile loop: fills the provided
    * arrays (each sized offsets.length) instead of allocating. */
  def labelsInto(offsets: Array[Array[Int]], splitIdx: Int, windowSize: Int,
      yTrue: Array[Int], yPred: Array[Int]): Unit = {
    val n = offsets.length
    val k = offsets(0).length
    var i = 0
    while (i < splitIdx) { yTrue(i) = 0; i += 1 }
    while (i < n) { yTrue(i) = 1; i += 1 }
    i = 0
    while (i < n) {
      var ones = 0
      val row = offsets(i)
      var j = 0
      while (j < k) { ones += yTrue(row(j)); j += 1 }
      yPred(i) = if (ones > k - ones) 1 else 0
      i += 1
    }
    i = splitIdx - windowSize
    while (i < splitIdx) {
      val idx = if (i < 0) n + i else i
      if (idx >= 0 && idx < n) yPred(idx) = 1
      i += 1
    }
  }

  def labels(offsets: Array[Array[Int]], splitIdx: Int, windowSize: Int): (Array[Int], Array[Int]) = {
    val n = offsets.length
    val k = offsets(0).length
    val yTrue = new Array[Int](n)
    var i = splitIdx
    while (i < n) { yTrue(i) = 1; i += 1 }

    val yPred = new Array[Int](n)
    i = 0
    while (i < n) {
      var ones = 0
      val row = offsets(i)
      var j = 0
      while (j < k) { ones += yTrue(row(j)); j += 1 }
      yPred(i) = if (ones > k - ones) 1 else 0
      i += 1
    }
    // exclusion zone (nearest_neighbour.py:320-321); numpy negative indices
    // wrap — replicated for splitIdx < windowSize
    i = splitIdx - windowSize
    while (i < splitIdx) {
      val idx = if (i < 0) n + i else i
      if (idx >= 0 && idx < n) yPred(idx) = 1
      i += 1
    }
    (yTrue, yPred)
  }
}
