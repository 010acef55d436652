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

  /** Allocation-free variant for the O(n) profile loop: fills the provided
    * arrays (each sized n = offsetsFlat.length / k) instead of allocating.
    * `offsetsFlat` is the FLAT (n × k) kNN table — this loop runs O(n) times
    * per profile, so the contiguous layout is load-bearing. */
  def labelsInto(offsetsFlat: Array[Int], k: Int, splitIdx: Int, windowSize: Int,
      yTrue: Array[Int], yPred: Array[Int]): Unit = {
    val n = offsetsFlat.length / k
    var i = 0
    while (i < splitIdx) { yTrue(i) = 0; i += 1 }
    while (i < n) { yTrue(i) = 1; i += 1 }
    i = 0
    var base = 0
    while (i < n) {
      var ones = 0
      var j = 0
      while (j < k) { ones += yTrue(offsetsFlat(base + j)); j += 1 }
      yPred(i) = if (ones > k - ones) 1 else 0
      base += k
      i += 1
    }
    i = splitIdx - windowSize
    while (i < splitIdx) {
      val idx = if (i < 0) n + i else i
      if (idx >= 0 && idx < n) yPred(idx) = 1
      i += 1
    }
  }

  /** Short-typed twin of [[labelsInto]]: when the table has < 32768 rows
    * (always true for chunk-bounded series) the offsets fit in 16 bits,
    * HALVING the bytes streamed by the O(n²·k) profile loop — the single
    * largest memory-bandwidth consumer in the engine. Indices are identical,
    * so output is bit-equal to the Int path. */
  def labelsIntoShort(offsetsFlat: Array[Short], k: Int, splitIdx: Int, windowSize: Int,
      yTrue: Array[Int], yPred: Array[Int]): Unit = {
    val n = offsetsFlat.length / k
    var i = 0
    while (i < splitIdx) { yTrue(i) = 0; i += 1 }
    while (i < n) { yTrue(i) = 1; i += 1 }
    i = 0
    var base = 0
    while (i < n) {
      var ones = 0
      var j = 0
      while (j < k) { ones += yTrue(offsetsFlat(base + j)); j += 1 }
      yPred(i) = if (ones > k - ones) 1 else 0
      base += k
      i += 1
    }
    i = splitIdx - windowSize
    while (i < splitIdx) {
      val idx = if (i < 0) n + i else i
      if (idx >= 0 && idx < n) yPred(idx) = 1
      i += 1
    }
  }

  /** Exclusion-zone semantics per nearest_neighbour.py:320-321; numpy
    * negative indices wrap — replicated for splitIdx < windowSize. */
  def labels(offsetsFlat: Array[Int], k: Int, splitIdx: Int, windowSize: Int): (Array[Int], Array[Int]) = {
    val n = offsetsFlat.length / k
    val yTrue = new Array[Int](n)
    val yPred = new Array[Int](n)
    labelsInto(offsetsFlat, k, splitIdx, windowSize, yTrue, yPred)
    (yTrue, yPred)
  }
}
