package graft.trend

import org.scalatest.funsuite.AnyFunSuite

class TransformsSpec extends AnyFunSuite {
  import SeriesTransforms._

  private val cfg = Config(seriesLength = 2, referenceLength = 4,
    nSmooth = 2, baselineOffset = 1, lambda = 0.5, alpha = 1.2)

  test("add_one") {
    assert(addOne(Array(0.0, 2.0)).toSeq == Seq(1.0, 3.0))
  }

  test("unit_normalization uses the python slice [-(rl+off):-off] over rl") {
    // series len 6, rl=4, off=1 → slice [1:5] = (2,3,4,5), total = 14/4 = 3.5
    val s = Array(1.0, 2.0, 3.0, 4.0, 5.0, 6.0)
    val out = unitNormalization(s, cfg)
    assert(out.toSeq == s.toSeq.map(_ / 3.5))
  }

  test("unit_normalization zero-sum slice uses SMALL_NUMBER (library.py:113)") {
    val out = unitNormalization(Array(0.0, 0.0, 0.0, 0.0, 0.0, 7.0), cfg)
    assert(out(5) == 7.0 / 0.00001)
  }

  test("smoothing window grows to n then slides (library.py:129-138)") {
    val out = smoothing(Array(2.0, 4.0, 6.0, 8.0), cfg) // n_smooth = 2
    assert(out.toSeq == Seq(2.0, 3.0, 5.0, 7.0))
  }

  test("logarithmic_scaling floors non-positives at 1e-5 (library.py:163-170)") {
    val out = logarithmicScaling(Array(100.0, 0.0, -3.0))
    assert(out(0) == 2.0 && out(1) == -5.0 && out(2) == -5.0)
  }

  test("spike_normalization |pt-prev|^alpha with zero passthrough") {
    val out = spikeNormalization(Array(2.0, 0.0, 3.0), cfg)
    assert(out(0) == math.pow(2.0, 1.2))
    assert(out(1) == 0.0)
    assert(out(2) == math.pow(3.0, 1.2)) // prev was 0 (the literal point value)
  }

  test("min sliding L1 over subwindows (models.py:206-211)") {
    val ref = Array(0.0, 1.0, 5.0, 1.0, 0.0)
    val test = Array(1.0, 5.0)
    // windows: (0,1)->5, (1,5)->0, (5,1)->8, (1,0)->5
    assert(minSlidingL1(ref, test) == 0.0)
  }

  test("reference chain = test chain + sizing") {
    val s = Array(3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0)
    val r = referenceChain(s, cfg)
    val t = testChain(s, cfg)
    assert(r.toSeq == t.takeRight(cfg.referenceLength).toSeq)
    assert(r.length == cfg.referenceLength)
  }
}
