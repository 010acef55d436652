package graft.kernel

import org.json4s._
import org.scalatest.funsuite.AnyFunSuite
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

/** Aggregate covering-parity suite (the round-2 evidence gap): a synthetic
  * TSSB-scale corpus — 34 batch series of 286..17000 points with 1..9 true
  * change points, 10 streaming series — generated and replayed through the
  * ACTUAL reference by tools/gen_golden.py §11/§12, which records the
  * reference's per-series change points and claspy's own covering score.
  * This mirrors the dataset-level semantics of the reference's headline
  * tests (claspy/tests/segmentation_test.py:31-45 covering floor,
  * streaming_segmentation_test.py:16-31) at per-series EXACTNESS:
  *   (a) per-series change points must match the reference exactly,
  *   (b) the dataset mean covering must be within 0.01 of the reference run
  *       (computed independently via Eval.covering, itself golden-tested
  *       against claspy's evaluation module). */
class CoveringCorpusSpec extends AnyFunSuite {
  import GoldenJson._

  private implicit val ec: ExecutionContext = ExecutionContext.global

  private def num(v: JValue): Double = v match {
    case JDouble(d) => d
    case JInt(i) => i.toDouble
    case JLong(l) => l.toDouble
    case JDecimal(d) => d.toDouble
    case other => throw new IllegalArgumentException(s"not a number: $other")
  }

  test("batch corpus: per-series exact cp parity + dataset covering within 0.01") {
    val j = load("corpus_segmentation")
    val JArray(cases) = (j \ "cases"): @unchecked
    val refMean = num(j \ "mean_covering")
    assert(cases.length >= 30, s"corpus has ${cases.length} series, need >= 30")

    val results = Await.result(Future.traverse(cases) { c =>
      Future {
        val seed = (c \ "seed").values.asInstanceOf[BigInt].toInt
        val n = (c \ "n").values.asInstanceOf[BigInt].toInt
        val ts = doubles(c \ "ts")
        val trueCps = ints(c \ "true_cps")
        val expCps = ints(c \ "cps")
        val expW = (c \ "window_size").values.asInstanceOf[BigInt].toInt
        val seg = new BinaryClaSPSegmentation()
        val res = seg.fit(Array(ts))
        val cov = Eval.covering(trueCps, res.changePoints, n)
        (seed, n, expW, expCps.toSeq, res.windowSize, res.changePoints.toSeq,
          num(c \ "covering"), cov)
      }
    }, Duration.Inf)

    val lens = results.map(_._2)
    assert(lens.min <= 300 && lens.max >= 17000, s"length spread ${lens.min}..${lens.max}")
    val kTrue = cases.map(c => ints(c \ "true_cps").length)
    assert(kTrue.min >= 1 && kTrue.max >= 8, s"cp-count spread ${kTrue.min}..${kTrue.max}")

    for ((seed, n, expW, expCps, gotW, gotCps, _, _) <- results) {
      assert(gotW == expW, s"seed=$seed n=$n window: $gotW vs reference $expW")
      assert(gotCps == expCps, s"seed=$seed n=$n cps: $gotCps vs reference $expCps")
    }
    val engineMean = results.map(_._8).sum / results.length
    assert(math.abs(engineMean - refMean) <= 0.01,
      s"dataset covering: engine $engineMean vs reference $refMean")
    info(f"batch corpus: ${results.length} series, mean covering $engineMean%.4f (reference $refMean%.4f)")
  }

  test("streaming corpus: per-series exact cp-log parity + dataset covering within 0.01") {
    val j = load("corpus_streaming")
    val JArray(cases) = (j \ "cases"): @unchecked
    val refMean = num(j \ "mean_covering")
    assert(cases.length >= 10)

    val results = Await.result(Future.traverse(cases) { c =>
      Future {
        val seed = (c \ "seed").values.asInstanceOf[BigInt].toInt
        val n = (c \ "n").values.asInstanceOf[BigInt].toInt
        val ts = doubles(c \ "ts")
        val trueCps = ints(c \ "true_cps")
        val stream = new graft.kernel.streaming.StreamingClaSPSegmentation(
          nTimepoints = (c \ "n_timepoints").values.asInstanceOf[BigInt].toInt,
          nWarmupIn = (c \ "n_warmup").values.asInstanceOf[BigInt].toInt,
          logCps = true)
        ts.foreach(stream.update)
        val got = stream.changePoints.toArray
        val cov = Eval.covering(trueCps, got, n)
        (seed, (c \ "window_size").values.asInstanceOf[BigInt].toInt, stream.windowSize,
          ints(c \ "change_points").toSeq, got.toSeq, cov)
      }
    }, Duration.Inf)

    for ((seed, expW, gotW, expCps, gotCps, _) <- results) {
      assert(gotW == expW, s"seed=$seed window: $gotW vs reference $expW")
      assert(gotCps == expCps, s"seed=$seed cp log: $gotCps vs reference $expCps")
    }
    val engineMean = results.map(_._6).sum / results.length
    assert(math.abs(engineMean - refMean) <= 0.01,
      s"dataset covering: engine $engineMean vs reference $refMean")
    info(f"streaming corpus: ${results.length} series, mean covering $engineMean%.4f (reference $refMean%.4f)")
  }
}
