package graft.ops

import org.json4s._
import org.scalatest.funsuite.AnyFunSuite
import graft.kernel.GoldenJson

/** Differential twin for the LTTB downsampler: tools/gen_lttb_golden.py runs
  * an independently written Python implementation of the public algorithm
  * (Steinarsson 2013 §4.2) over LCG-generated series; the Scala kernel must
  * select the IDENTICAL indices. Converts q34 from rows-only to
  * cross-implementation-checked. */
class LttbGoldenSpec extends AnyFunSuite {
  import GoldenJson._

  test("lttbIndices matches the independent Python twin on all cases") {
    val j = load("lttb")
    val JArray(cases) = (j \ "cases"): @unchecked
    assert(cases.nonEmpty)
    for (c <- cases) {
      val seed = (c \ "seed").values.asInstanceOf[BigInt].toInt
      val ts = ints(c \ "ts").map(_.toLong)
      val v = doubles(c \ "v")
      val threshold = (c \ "threshold").values.asInstanceOf[BigInt].toInt
      val expected = ints(c \ "indices").toSeq
      val got = DownsampleOps.lttbIndices(ts, v, threshold).toSeq
      assert(got == expected, s"seed=$seed n=${ts.length} threshold=$threshold")
    }
  }
}
