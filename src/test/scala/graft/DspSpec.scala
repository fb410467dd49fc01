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

  test("butterworth sections have unit DC gain") {
    for (order <- 1 to 6; wn <- Seq(0.1, 0.3, 0.7)) {
      val sos = Dsp.butterLowpassSos(order, wn)
      val dc = sos.map(s => (s.b0 + s.b1 + s.b2) / (1.0 + s.a1 + s.a2)).product
      assert(approx(dc, 1.0, 1e-9), s"order=$order wn=$wn dc=$dc")
    }
  }

  test("filtfilt passes a constant signal unchanged") {
    val sos = Dsp.butterLowpassSos(4, 0.2)
    val x = Array.fill(50)(3.25)
    Dsp.filtfilt(sos, x).foreach(v => assert(approx(v, 3.25, 1e-9)))
  }

  test("filtfilt is zero-phase on a slow ramp (interior)") {
    val sos = Dsp.butterLowpassSos(2, 0.5)
    val x = Array.tabulate(100)(i => i * 0.1)
    val y = Dsp.filtfilt(sos, x)
    for (i <- 20 until 80) assert(approx(y(i), x(i), 1e-3), s"i=$i ${y(i)}")
  }
}
