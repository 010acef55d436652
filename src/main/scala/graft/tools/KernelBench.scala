package graft.tools

/** Microbench: BinaryClaSPSegmentation wall time on a synthetic 4000-pt
  * series (the chunk-kernel unit of work), best of N. */
object KernelBench {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 4000
    val reps = if (args.length > 1) args(1).toInt else 5
    var s = 12345L
    @inline def next(): Double = { s = s * 6364136223846793005L + 1442695040888963407L; (s >>> 11).toDouble / (1L << 53) }
    val ts = Array.tabulate(n) { i =>
      val seg = i * 3 / n
      val period = 8.0 + 9.0 * seg
      math.sin(2 * math.Pi * i / period) + 0.1 * (next() - 0.5)
    }
    var best = Double.MaxValue
    for (_ <- 0 until reps) {
      val t0 = System.nanoTime()
      val cps = new graft.kernel.BinaryClaSPSegmentation().fitPredict(ts)
      val dt = (System.nanoTime() - t0) / 1e9
      if (dt < best) best = dt
      System.err.println(f"run: $dt%.3f s, cps=${cps.mkString(",")}")
    }
    println(f"best: $best%.3f s (n=$n)")
  }
}
