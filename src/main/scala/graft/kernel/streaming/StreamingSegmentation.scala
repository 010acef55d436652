package graft.kernel.streaming

import graft.kernel.WindowSize

/** Streaming ClaSP segmentation state machine. Faithful port of
  * `/root/reference/claspy/streaming/segmentation.py`: warmup + window-size
  * learn (:116-166), gated ClaSS detection every `jump` points (:168-232)
  * with profile blend `(2·p + tc)/3` (:221-223), max-merge into the global
  * profile ring, `last_cp` advance and optional global change-point log
  * (:228-230). One instance per series key; drives both the Structured
  * Streaming wrapper and the batch mega-series path. */
final class StreamingClaSPSegmentation(
    val nTimepoints: Int = 10000,
    nWarmupIn: Int = 10000,
    val windowSizeMethod: String = "suss",
    val kNeighbours: Int = 3,
    val distanceName: String = "znormed_euclidean_distance",
    val scoreName: String = "f1",
    val jump: Int = 5,
    val validation: String = "significance_test",
    thresholdIn: Double = Double.NaN, // NaN == "default"
    val logCps: Boolean = false,
    val exclRadius: Int = 5) extends Serializable {

  val nWarmup: Int = math.min(nTimepoints, nWarmupIn)

  val warmup: Array[Double] = Array.fill(nWarmup)(Double.NegativeInfinity)
  val profile: Array[Double] = Array.fill(nTimepoints)(Double.NegativeInfinity)
  val changePoints = scala.collection.mutable.ArrayBuffer.empty[Int]
  var lastCp = 0
  var ingested = 0
  var knnStreamLag = 0
  var warmupCounter = 0
  var windowSize = -1
  var minSegSize = -1
  var threshold: Double = thresholdIn
  var knnStream: StreamingKSN = null

  def isWarmedUp: Boolean = warmupCounter == nWarmup

  private def warmupStep(timepoint: Double): this.type = {
    warmupCounter += 1
    System.arraycopy(warmup, 1, warmup, 0, nWarmup - 1)
    warmup(nWarmup - 1) = timepoint
    if (warmupCounter != nWarmup) return this

    windowSize = WindowSize.byName(windowSizeMethod)(warmup)
    minSegSize = 5 * windowSize
    if (threshold.isNaN) {
      threshold = validation match {
        case "score_threshold" => 0.75
        case "significance_test" => 1e-50
        case _ => Double.NaN
      }
    }
    knnStream = new StreamingKSN(nTimepoints, windowSize, kNeighbours, distanceName)
    knnStreamLag = knnStream.windowSize + knnStream.exclusionRadius + knnStream.kNeighbours
    var i = 0
    while (i < nWarmup) { update(warmup(i)); i += 1 }
    this
  }

  /** segmentation.py:168-232. */
  def update(timepoint: Double): this.type = {
    if (warmupCounter < nWarmup) return warmupStep(timepoint)

    ingested += 1
    knnStream.update(timepoint, lastCp)
    System.arraycopy(profile, 1, profile, 0, nTimepoints - 1)
    profile(nTimepoints - 1) = Double.NegativeInfinity

    if (ingested < minSegSize * 2) return this
    if (knnStream.knnInsertIdx - knnStream.knnFilled == 0)
      lastCp = math.max(0, lastCp - 1)

    val profileStart = knnStream.lbound
    val profileEnd = knnStream.knnInsertIdx
    if (profileEnd - profileStart < 2 * minSegSize || ingested % jump != 0) return this

    val clasz = ClaSS.fit(knnStream.timeSeries, windowSize, kNeighbours,
      distanceName, scoreName, exclRadius, knnStream.transform())
    val prof = clasz.profile
    val cpOpt = clasz.split(validation, threshold)

    val cp = cpOpt.getOrElse(-1)
    if (cp < 0 || cp < minSegSize || prof.length - cp < minSegSize) return this
    if (prof.length - minSegSize - cp <= 0) return this

    // blend: profile = (2·profile + tc)/3 where tc = filled fraction (:221-223)
    var notNinf = 0
    var i = 0
    while (i < prof.length) { if (!prof(i).isNegInfinity) notNinf += 1; i += 1 }
    val tc = notNinf.toDouble / nTimepoints
    i = 0
    while (i < prof.length) {
      if (!prof(i).isNegInfinity) prof(i) = (2 * prof(i) + tc) / 3
      i += 1
    }
    // max-merge into the global ring
    i = 0
    while (i < prof.length && profileStart + i < nTimepoints) {
      val gi = profileStart + i
      if (prof(i) > profile(gi)) profile(gi) = prof(i)
      i += 1
    }
    lastCp += cp

    if (logCps) {
      val globalCp = ingested - knnStreamLag - (profileEnd - profileStart) + cp + windowSize
      changePoints += globalCp
    }
    this
  }

  def predict(): Int = {
    require(isWarmedUp, "StreamingClaSPSegmentation object is not warmed up yet.")
    lastCp
  }
}
