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

  /** Flat value snapshot of ALL mutable state (for Structured Streaming's
    * GroupState: the product encoder serializes primitive arrays orders of
    * magnitude faster than Encoders.javaSerialization walking this object
    * graph reflectively per micro-batch). */
  def snapshot: SegSnapshot = {
    val hasKnn = knnStream != null
    SegSnapshot(
      warmup.clone(), profile.clone(), changePoints.toArray,
      lastCp, ingested, knnStreamLag, warmupCounter, windowSize, minSegSize, threshold,
      if (hasKnn) knnStream.lbound else 0,
      if (hasKnn) knnStream.nFilled else 0,
      if (hasKnn) knnStream.knnFilled else 0,
      if (hasKnn) knnStream.timeSeries.clone() else Array.empty,
      if (hasKnn) knnStream.csum.clone() else Array.empty,
      if (hasKnn) knnStream.csumsq.clone() else Array.empty,
      if (hasKnn) knnStream.dcsum.clone() else Array.empty,
      if (hasKnn) knnStream.means.clone() else Array.empty,
      if (hasKnn) knnStream.stds.clone() else Array.empty,
      if (hasKnn) knnStream.dists.flatten else Array.empty,
      if (hasKnn) knnStream.knns.flatten else Array.empty,
      if (hasKnn && knnStream.dotRolled != null) knnStream.dotRolled.clone() else Array.empty)
  }
}

/** Value-encoded state of one [[StreamingClaSPSegmentation]]; fields prefixed
  * k belong to the inner [[StreamingKSN]] ring (empty arrays while the
  * detector is still warming up / before the first dot seed). */
final case class SegSnapshot(
    warmup: Array[Double], profile: Array[Double], changePoints: Array[Int],
    lastCp: Int, ingested: Int, knnStreamLag: Int, warmupCounter: Int,
    windowSize: Int, minSegSize: Int, threshold: Double,
    kLbound: Int, kNFilled: Int, kKnnFilled: Int,
    kTimeSeries: Array[Double], kCsum: Array[Double], kCsumsq: Array[Double],
    kDcsum: Array[Double], kMeans: Array[Double], kStds: Array[Double],
    kDists: Array[Double], kKnns: Array[Int], kDotRolled: Array[Double])

object StreamingClaSPSegmentation {

  /** Rebuild a live state machine from a snapshot + the (static) config. */
  def restore(s: SegSnapshot, nTimepoints: Int, nWarmupIn: Int,
      windowSizeMethod: String = "suss", kNeighbours: Int = 3,
      distanceName: String = "znormed_euclidean_distance", scoreName: String = "f1",
      jump: Int = 5, validation: String = "significance_test",
      logCps: Boolean = false, exclRadius: Int = 5): StreamingClaSPSegmentation = {
    val m = new StreamingClaSPSegmentation(nTimepoints, nWarmupIn, windowSizeMethod,
      kNeighbours, distanceName, scoreName, jump, validation, s.threshold, logCps, exclRadius)
    System.arraycopy(s.warmup, 0, m.warmup, 0, m.nWarmup)
    System.arraycopy(s.profile, 0, m.profile, 0, nTimepoints)
    m.changePoints.clear(); m.changePoints ++= s.changePoints
    m.lastCp = s.lastCp; m.ingested = s.ingested; m.knnStreamLag = s.knnStreamLag
    m.warmupCounter = s.warmupCounter; m.windowSize = s.windowSize
    m.minSegSize = s.minSegSize; m.threshold = s.threshold
    if (s.windowSize > 0 && s.kTimeSeries.nonEmpty) {
      val k = new StreamingKSN(nTimepoints, s.windowSize, kNeighbours, distanceName)
      k.lbound = s.kLbound; k.nFilled = s.kNFilled; k.knnFilled = s.kKnnFilled
      System.arraycopy(s.kTimeSeries, 0, k.timeSeries, 0, k.timeSeries.length)
      System.arraycopy(s.kCsum, 0, k.csum, 0, k.csum.length)
      System.arraycopy(s.kCsumsq, 0, k.csumsq, 0, k.csumsq.length)
      System.arraycopy(s.kDcsum, 0, k.dcsum, 0, k.dcsum.length)
      System.arraycopy(s.kMeans, 0, k.means, 0, k.means.length)
      System.arraycopy(s.kStds, 0, k.stds, 0, k.stds.length)
      val kk = k.kNeighbours
      var i = 0
      while (i < k.nWindows) {
        System.arraycopy(s.kDists, i * kk, k.dists(i), 0, kk)
        System.arraycopy(s.kKnns, i * kk, k.knns(i), 0, kk)
        i += 1
      }
      if (s.kDotRolled.nonEmpty) k.dotRolled = s.kDotRolled.clone()
      m.knnStream = k
    }
    m
  }
}
