package graft

import graft.functions.Dsp
import org.scalatest.funsuite.AnyFunSuite

class DspSpec extends AnyFunSuite {

  private def approx(a: Double, b: Double, eps: Double = 1e-9): Boolean =
    math.abs(a - b) <= eps

  test("savgol coefficients (5,2) match the classic closed form") {
    val c = Dsp.savgolCoefficients(5, 2)
    val expected = Array(-3.0 / 35, 12.0 / 35, 17.0 / 35, 12.0 / 35, -3.0 / 35)
    c.zip(expected).foreach { case (a, b) => assert(approx(a, b)) }
  }

  test("savgol coefficients sum to 1 (preserve constants)") {
    for ((w, p) <- Seq((5, 2), (7, 3), (11, 2), (9, 4)))
      assert(approx(Dsp.savgolCoefficients(w, p).sum, 1.0))
  }

  test("polyfitAt reproduces a quadratic exactly") {
    val ts = Array(0.0, 1.0, 2.0, 3.0, 4.0)
    val xs = ts.map(t => 2.0 * t * t - 3.0 * t + 1.0)
    for (t0 <- Seq(0.0, 1.5, 4.0))
      assert(approx(Dsp.polyfitAt(ts, xs, 2, t0), 2.0 * t0 * t0 - 3.0 * t0 + 1.0, 1e-8))
  }

  test("butterworth lowpass has unit DC gain and -3dB at the cutoff") {
    for (order <- 1 to 6; wn <- Seq(0.1, 0.3, 0.7)) {
      val tf = Dsp.butterLowpassTf(order, wn)
      val dc = tf.b.sum / tf.a.sum
      assert(approx(dc, 1.0, 1e-9), s"order=$order wn=$wn dc=$dc")
      assert(approx(gainAt(tf, math.Pi * wn), 1.0 / math.sqrt(2.0), 1e-9),
        s"order=$order wn=$wn cutoff gain")
    }
  }

  /** |H(e^{jw})| for the transfer function. */
  private def gainAt(tf: Dsp.Tf, w: Double): Double = {
    def polyAt(c: Array[Double]): (Double, Double) =
      c.zipWithIndex.foldLeft((0.0, 0.0)) { case ((re, im), (ci, i)) =>
        (re + ci * math.cos(-i * w), im + ci * math.sin(-i * w))
      }
    val (nr, ni) = polyAt(tf.b); val (dr, di) = polyAt(tf.a)
    math.hypot(nr, ni) / math.hypot(dr, di)
  }

  test("bandpass kills DC, passes the band, attenuates outside it") {
    val tf = Dsp.butterBandpassTf(4, 0.05, 0.4)
    assert(math.abs(tf.b.sum / tf.a.sum) < 1e-9, "DC leak")
    assert(gainAt(tf, math.Pi * 0.2) > 0.99, "passband")
    assert(approx(gainAt(tf, math.Pi * 0.05), 1.0 / math.sqrt(2.0), 1e-6), "low edge")
    assert(approx(gainAt(tf, math.Pi * 0.4), 1.0 / math.sqrt(2.0), 1e-6), "high edge")
    assert(gainAt(tf, math.Pi * 0.9) < 0.01, "stopband")
  }

  test("filtfilt passes a constant signal unchanged") {
    val tf = Dsp.butterLowpassTf(4, 0.2)
    val x = Array.fill(50)(3.25)
    Dsp.filtfiltTf(tf, x).foreach(v => assert(approx(v, 3.25, 1e-9)))
  }

  test("filtfilt is zero-phase on a slow ramp (interior)") {
    val tf = Dsp.butterLowpassTf(2, 0.5)
    val x = Array.tabulate(100)(i => i * 0.1)
    val y = Dsp.filtfiltTf(tf, x)
    for (i <- 20 until 80) assert(approx(y(i), x(i), 1e-3), s"i=$i ${y(i)}")
  }

  test("lowpass design matches the numpy scipy-chain golden (b, a)") {
    val tf = Dsp.butterLowpassTf(4, 0.2)
    tf.b.zip(DspGolden.lowpassB).foreach { case (s, g) => assert(approx(s, g, 1e-12)) }
    tf.a.zip(DspGolden.lowpassA).foreach { case (s, g) => assert(approx(s, g, 1e-12)) }
  }

  test("bandpass design matches the numpy scipy-chain golden (b, a)") {
    val tf = Dsp.butterBandpassTf(4, 0.05, 0.4)
    tf.b.zip(DspGolden.bandpassB).foreach { case (s, g) => assert(approx(s, g, 1e-12)) }
    tf.a.zip(DspGolden.bandpassA).foreach { case (s, g) => assert(approx(s, g, 1e-12)) }
  }

  test("lowpass filtfilt matches the numpy scipy-chain golden output") {
    val tf = Dsp.butterLowpassTf(4, 0.2)
    val y = Dsp.filtfiltTf(tf, DspGolden.goldenInput)
    y.zip(DspGolden.goldenLowpass).foreach { case (s, g) =>
      assert(approx(s, g, 1e-9), s"lowpass diff ${s - g}")
    }
  }

  test("bandpass filtfilt matches the numpy scipy-chain golden output") {
    val tf = Dsp.butterBandpassTf(4, 0.05, 0.4)
    val y = Dsp.filtfiltTf(tf, DspGolden.goldenInput)
    y.zip(DspGolden.goldenBandpass).foreach { case (s, g) =>
      assert(approx(s, g, 1e-9), s"bandpass diff ${s - g}")
    }
  }

  test("quadratic B-spline matches the numpy make_interp_spline(k=2) golden") {
    // 17 non-uniform knots with a local jump: the global collocation
    // solve must spread it exactly as scipy's does (a local slope-
    // propagation scheme would diverge wildly here)
    val f = Dsp.quadraticSpline(DspGolden.qsKnotsT, DspGolden.qsKnotsY)
    DspGolden.qsEvalAt.zip(DspGolden.qsGolden).foreach { case (q, g) =>
      assert(approx(f(q), g, 1e-9), s"at $q diff ${f(q) - g}")
    }
    // n = 3: the single parabola through three points
    val f3 = Dsp.quadraticSpline(Array(0.0, 1.3, 2.1), Array(1.0, -0.7, 2.4))
    DspGolden.qs3EvalAt.zip(DspGolden.qs3Golden).foreach { case (q, g) =>
      assert(approx(f3(q), g, 1e-12), s"at $q diff ${f3(q) - g}")
    }
  }

  test("cubic B-spline matches the numpy make_interp_spline(k=3) golden") {
    // 17 non-uniform knots with a jump: the not-a-knot global solve
    // must match scipy's — a natural spline (S''=0 ends) diverges on
    // this data at every site
    val f = Dsp.notAKnotCubicSpline(DspGolden.qcKnotsT, DspGolden.qcKnotsY)
    DspGolden.qcEvalAt.zip(DspGolden.qcGolden).foreach { case (q, g) =>
      assert(approx(f(q), g, 1e-9), s"at $q diff ${f(q) - g}")
    }
    // n = 4: no interior knots, one cubic through four points
    val f4 = Dsp.notAKnotCubicSpline(DspGolden.qc4KnotsT, DspGolden.qc4KnotsY)
    DspGolden.qc4EvalAt.zip(DspGolden.qc4Golden).foreach { case (q, g) =>
      assert(approx(f4(q), g, 1e-11), s"n=4 at $q diff ${f4(q) - g}")
    }
    // n = 5: a single interior knot
    val f5 = Dsp.notAKnotCubicSpline(DspGolden.qc5KnotsT, DspGolden.qc5KnotsY)
    DspGolden.qc5EvalAt.zip(DspGolden.qc5Golden).foreach { case (q, g) =>
      assert(approx(f5(q), g, 1e-11), s"n=5 at $q diff ${f5(q) - g}")
    }
  }
}
