package graft.functions

/** Driver-side DSP coefficient math (no Spark dependency): Savitzky–
  * Golay FIR weights and Butterworth biquad design. These run once on
  * the driver per operator instantiation; executors only ever see the
  * resulting constant coefficients, either unrolled into Catalyst
  * expressions (SG) or closed over by a `flatMapGroups` kernel (IIR).
  *
  * Reference behavior being matched: filter_engine.py:44-58 (savgol,
  * butterworth) and its scipy backends.
  */
object Dsp {

  /** Solve `A x = b` by Gaussian elimination with partial pivoting.
    * Sizes here are tiny (polyorder+1 ≤ ~7), so numerics are easy.
    */
  def solve(a: Array[Array[Double]], b: Array[Double]): Array[Double] = {
    val n = b.length
    val m = Array.tabulate(n)(i => a(i).clone() :+ b(i))
    for (c <- 0 until n) {
      var p = c
      for (r <- c + 1 until n) if (math.abs(m(r)(c)) > math.abs(m(p)(c))) p = r
      val tmp = m(c); m(c) = m(p); m(p) = tmp
      require(math.abs(m(c)(c)) > 1e-12, s"singular system at column $c")
      for (r <- 0 until n if r != c) {
        val f = m(r)(c) / m(c)(c)
        for (k <- c to n) m(r)(k) -= f * m(c)(k)
      }
    }
    Array.tabulate(n)(i => m(i)(n) / m(i)(i))
  }

  /** Savitzky–Golay smoothing weights for the window center: the
    * least-squares polynomial of degree `polyorder` over offsets
    * `-h..h`, evaluated at offset 0. Identical to
    * `scipy.signal.savgol_coeffs(window, polyorder)` (interior
    * points).
    */
  def savgolCoefficients(window: Int, polyorder: Int): Array[Double] = {
    require(window % 2 == 1, s"savgol window must be odd, got $window")
    require(polyorder < window, "polyorder must be < window")
    val h = window / 2
    val np = polyorder + 1
    // normal equations: (AᵀA) x = e0 where A[i][j] = (i-h)^j
    val ata = Array.ofDim[Double](np, np)
    for (j <- 0 until np; k <- 0 until np)
      ata(j)(k) = (-h to h).map(i => math.pow(i.toDouble, j + k)).sum
    val e0 = Array.tabulate(np)(j => if (j == 0) 1.0 else 0.0)
    val x = solve(ata, e0)
    // weight for sample at offset d: Σ_j x_j · d^j
    Array.tabulate(window) { i =>
      val d = (i - h).toDouble
      (0 until np).map(j => x(j) * math.pow(d, j)).sum
    }
  }

  /** Polynomial-fit value at `t0` for irregular (t, x) pairs — the
    * scipy savgol edge fallback (filter_engine.py:94-113 fits a
    * polynomial on the shrunken edge window).
    */
  def polyfitAt(ts: Array[Double], xs: Array[Double], degree: Int, t0: Double): Double = {
    val np = degree + 1
    val ata = Array.ofDim[Double](np, np)
    val atb = new Array[Double](np)
    var i = 0
    while (i < ts.length) {
      val t = ts(i) - t0
      var j = 0
      var pj = 1.0
      while (j < np) {
        var k = 0; var pk = pj
        while (k < np) { ata(j)(k) += pk; pk *= t; k += 1 }
        atb(j) += pj * xs(i)
        pj *= t; j += 1
      }
      i += 1
    }
    solve(ata, atb)(0)
  }

  /** Global cubic B-spline interpolant through knots `(ts, xs)`
    * (strictly increasing ts), clamped to the knot range at the
    * ends — the algorithm behind the reference W10's `method='cubic'`
    * (filter_engine.py:85-87 / dialogs.py:49 → pandas → scipy
    * `interp1d(kind='cubic')` → `make_interp_spline(k=3)` with the
    * default not-a-knot layout): quadruple end knots, interior knots
    * at the data sites minus the two nearest each end (scipy
    * `_not_a_knot`), B-spline coefficients from the banded
    * collocation system `B(x_i)·c = y_i` (kl = ku = 2 here, solved
    * by unpivoted banded LU — stable, collocation matrices are
    * totally positive) and BSPLVB-unrolled basis evaluation. NOT the
    * natural spline (whose `S''=0` end condition scipy does not use);
    * cross-validated against an independent numpy reimplementation
    * (scripts/golden_cubicspline.py) in DspSpec. Two knots degrade
    * to the secant, three to the unique parabola (scipy raises below
    * k+1 points; a total function is kinder in a column engine).
    * The DuckDB oracle ([[KernelOracles.cubicSplineOracle]]) replays
    * the same knot layout, band slots, LU sweeps and evaluation in
    * the same IEEE op order.
    */
  def notAKnotCubicSpline(ts: Array[Double], xs: Array[Double]): Double => Double = {
    val n = ts.length
    require(n >= 2, "spline needs at least two knots")
    if (n == 2) {
      val slope = (xs(1) - xs(0)) / (ts(1) - ts(0))
      t0 => {
        val t = math.max(ts(0), math.min(ts(1), t0))
        xs(0) + slope * (t - ts(0))
      }
    } else if (n == 3) {
      val x0 = ts(0); val x1 = ts(1); val x2 = ts(2)
      t0 => {
        val t = math.max(x0, math.min(x2, t0))
        xs(0) * ((t - x1) * (t - x2)) / ((x0 - x1) * (x0 - x2)) +
          xs(1) * ((t - x0) * (t - x2)) / ((x1 - x0) * (x1 - x2)) +
          xs(2) * ((t - x0) * (t - x1)) / ((x2 - x0) * (x2 - x1))
      }
    } else {
      // not-a-knot knot vector (0-based, length n+4)
      val tq = new Array[Double](n + 4)
      var q = 0
      while (q < 4) { tq(q) = ts(0); tq(n + q) = ts(n - 1); q += 1 }
      for (r <- 1 to n - 4) tq(3 + r) = ts(r + 1)
      // BSPLVB unrolled for k=3: the four nonzero cubic B-splines on
      // knot interval [tq(j), tq(j+1)) at x — coefficients c(j-3..j)
      def basis(j: Int, x: Double): (Double, Double, Double, Double) = {
        val term10 = 1.0 / (tq(j + 1) - tq(j))
        val c10 = (tq(j + 1) - x) * term10
        val c11 = (x - tq(j)) * term10
        val t20 = c10 / (tq(j + 1) - tq(j - 1))
        val o20 = (tq(j + 1) - x) * t20
        val s20 = (x - tq(j - 1)) * t20
        val t21 = c11 / (tq(j + 2) - tq(j))
        val o21 = s20 + (tq(j + 2) - x) * t21
        val o22 = (x - tq(j)) * t21
        val t30 = o20 / (tq(j + 1) - tq(j - 2))
        val b0 = (tq(j + 1) - x) * t30
        val s30 = (x - tq(j - 2)) * t30
        val t31 = o21 / (tq(j + 2) - tq(j - 1))
        val b1 = s30 + (tq(j + 2) - x) * t31
        val s31 = (x - tq(j - 1)) * t31
        val t32 = o22 / (tq(j + 3) - tq(j))
        val b2 = s31 + (tq(j + 3) - x) * t32
        val b3 = (x - tq(j)) * t32
        (b0, b1, b2, b3)
      }
      // rightmost knot interval containing x, clamped to [3, n-1]
      def interval(x: Double): Int = {
        var lo = 0; var hi = n + 4
        while (lo < hi) {
          val mid = (lo + hi) >>> 1
          if (tq(mid) <= x) lo = mid + 1 else hi = mid
        }
        math.min(math.max(lo - 1, 3), n - 1)
      }
      // collocation rows in banded form: row i holds (e0,e1,d,u1,u2)
      // at columns i-2..i+2; rows 0 and n-1 are identities (quadruple
      // end knots make the end basis a delta)
      val e0 = new Array[Double](n); val e1 = new Array[Double](n)
      val dd = new Array[Double](n); val u1 = new Array[Double](n)
      val u2 = new Array[Double](n); val rr = new Array[Double](n)
      dd(0) = 1.0; rr(0) = xs(0)
      dd(n - 1) = 1.0; rr(n - 1) = xs(n - 1)
      for (i <- 1 to n - 2) {
        val j = interval(ts(i))
        // j−i is 2 (site strictly inside its interval: rows 1..n−3)
        // or 1 (site is the interval's left knot, where B_j vanishes:
        // row n−2) — guaranteed by the not-a-knot layout
        require(j == i + 1 || j == i + 2, s"band violation at row $i (j=$j)")
        val (b0, b1, b2, b3) = basis(j, ts(i))
        rr(i) = xs(i)
        if (j == i + 2) { e1(i) = b0; dd(i) = b1; u1(i) = b2; u2(i) = b3 }
        else { e0(i) = b0; e1(i) = b1; dd(i) = b2; u1(i) = b3 }
      }
      // unpivoted banded LU forward sweep; the identity end rows fold
      // the known c(0)/c(n-1) into their neighbours' rhs exactly
      val ud = new Array[Double](n); val uu1 = new Array[Double](n)
      val uu2 = new Array[Double](n); val ur = new Array[Double](n)
      ud(0) = dd(0); uu1(0) = u1(0); uu2(0) = u2(0); ur(0) = rr(0)
      for (i <- 1 to n - 1) {
        val ppd = if (i >= 2) ud(i - 2) else 1.0
        val ppu1 = if (i >= 2) uu1(i - 2) else 0.0
        val ppu2 = if (i >= 2) uu2(i - 2) else 0.0
        val ppr = if (i >= 2) ur(i - 2) else 0.0
        val l2 = e0(i) / ppd
        val e1b = e1(i) - l2 * ppu1
        val db = dd(i) - l2 * ppu2
        val rb = rr(i) - l2 * ppr
        val l1 = e1b / ud(i - 1)
        ud(i) = db - l1 * uu1(i - 1)
        uu1(i) = u1(i) - l1 * uu2(i - 1)
        uu2(i) = u2(i)
        ur(i) = rb - l1 * ur(i - 1)
      }
      // back substitution (U bandwidth 2; zero-padded tail)
      val c = new Array[Double](n + 2)
      for (i <- n - 1 to 0 by -1)
        c(i) = ((ur(i) - uu1(i) * c(i + 1)) - uu2(i) * c(i + 2)) / ud(i)
      t0 => {
        val t = math.max(ts(0), math.min(ts(n - 1), t0))
        val j = interval(t)
        val (b0, b1, b2, b3) = basis(j, t)
        ((b0 * c(j - 3) + b1 * c(j - 2)) + b2 * c(j - 1)) + b3 * c(j)
      }
    }
  }

  /** Global C1 quadratic B-spline interpolant through knots
    * `(ts, xs)` (strictly increasing ts), clamped to the knot range
    * at the ends — the algorithm behind the reference W10's
    * `method='quadratic'` (dialogs.py:49 → pandas → scipy
    * `interp1d(kind='quadratic')` → `make_interp_spline(k=2)`):
    * interior knots at the data midpoints with the first and last
    * midpoint dropped (scipy's "a la not-a-knot" layout for even k),
    * B-spline coefficients from the banded collocation system
    * `B(x_i)·c = y_i` — tridiagonal here, solved by the Thomas
    * algorithm (stable without pivoting: B-spline collocation
    * matrices are totally positive) — and de Boor evaluation.
    * The solve is global, so a local jump shapes the whole curve
    * exactly as scipy's does (cross-validated against an independent
    * numpy reimplementation, scripts/golden_quadspline.py, in
    * DspSpec). Two knots degrade to the secant line (scipy raises
    * there; a total function is kinder in a column engine). The
    * DuckDB oracle ([[KernelOracles.quadraticSplineOracle]]) replays
    * the same knot layout, collocation entries, Thomas sweeps and
    * evaluation in the same IEEE op order.
    */
  def quadraticSpline(ts: Array[Double], xs: Array[Double]): Double => Double = {
    val n = ts.length
    require(n >= 2, "spline needs at least two knots")
    if (n == 2) {
      val d0 = (xs(1) - xs(0)) / (ts(1) - ts(0))
      t0 => {
        val t = math.max(ts(0), math.min(ts(1), t0))
        xs(0) + d0 * (t - ts(0))
      }
    } else {
      // knot vector (0-based, length n+3): triple end knots, interior
      // knots at data midpoints minus the first and last midpoint
      val tq = new Array[Double](n + 3)
      tq(0) = ts(0); tq(1) = ts(0); tq(2) = ts(0)
      for (r <- 1 to n - 3) tq(2 + r) = (ts(r) + ts(r + 1)) / 2.0
      tq(n) = ts(n - 1); tq(n + 1) = ts(n - 1); tq(n + 2) = ts(n - 1)
      // the three nonzero degree-2 B-splines on interval [tq(j), tq(j+1))
      // at x, for coefficients c(j-2), c(j-1), c(j) (de Boor closed form)
      def basis(j: Int, x: Double): (Double, Double, Double) = {
        val b0 = ((tq(j + 1) - x) / (tq(j + 1) - tq(j - 1))) * ((tq(j + 1) - x) / (tq(j + 1) - tq(j)))
        val b1 = ((x - tq(j - 1)) / (tq(j + 1) - tq(j - 1))) * ((tq(j + 1) - x) / (tq(j + 1) - tq(j))) +
          ((tq(j + 2) - x) / (tq(j + 2) - tq(j))) * ((x - tq(j)) / (tq(j + 1) - tq(j)))
        val b2 = ((x - tq(j)) / (tq(j + 2) - tq(j))) * ((x - tq(j)) / (tq(j + 1) - tq(j)))
        (b0, b1, b2)
      }
      // collocation: row 0 and n-1 are identities (full-multiplicity
      // end knots), interior site ts(i) lives on interval j = i+1 →
      // a tridiagonal system in c(1..n-2); Thomas sweep
      val c = new Array[Double](n)
      c(0) = xs(0); c(n - 1) = xs(n - 1)
      val cp = new Array[Double](n - 1)
      val dp = new Array[Double](n - 1)
      for (i <- 1 to n - 2) {
        val (aa, bb, cc) = basis(i + 1, ts(i))
        val rhs = (xs(i) - (if (i == 1) aa * xs(0) else 0.0)) -
          (if (i == n - 2) cc * xs(n - 1) else 0.0)
        val w = if (i == 1) bb else bb - aa * cp(i - 1)
        cp(i) = cc / w
        dp(i) = (if (i == 1) rhs else rhs - aa * dp(i - 1)) / w
      }
      c(n - 2) = dp(n - 2)
      for (i <- n - 3 to 1 by -1) c(i) = dp(i) - cp(i) * c(i + 1)
      t0 => {
        val t = math.max(ts(0), math.min(ts(n - 1), t0))
        // rightmost knot interval containing t, clamped to [2, n-1]
        var lo = 0; var hi = n + 3
        while (lo < hi) { // upper bound: first index with tq(idx) > t
          val mid = (lo + hi) >>> 1
          if (tq(mid) <= t) lo = mid + 1 else hi = mid
        }
        val j = math.min(math.max(lo - 1, 2), n - 1)
        val (b0, b1, b2) = basis(j, t)
        b0 * c(j - 2) + b1 * c(j - 1) + b2 * c(j)
      }
    }
  }

  // ------------------------------------------------------------------
  // Butterworth transfer-function design + zero-phase filtering.
  //
  // This is the exact published algorithm the reference invokes
  // (filter_engine.py:115-134): `b, a = scipy.signal.butter(order, wn,
  // btype)` followed by `scipy.signal.filtfilt(b, a, x)` with its
  // defaults (odd extension, padlen = 3·max(len(a), len(b)), initial
  // conditions from `lfilter_zi`, direct-form-II-transposed passes).
  // The design chain mirrors scipy's buttap → lp2lp_zpk / lp2bp_zpk →
  // bilinear_zpk → zpk2tf; an independent numpy reimplementation of
  // the same chain (scripts/golden_dsp.py) cross-checks it in DspSpec.
  // ------------------------------------------------------------------

  /** Digital transfer function b(z)/a(z); `a(0)` is exactly 1. */
  final case class Tf(b: Array[Double], a: Array[Double]) {
    require(a(0) == 1.0, "transfer function must be normalized (a0 = 1)")
    require(a.length == b.length, "b and a must be the same length")
    def ntaps: Int = b.length
  }

  private final case class Cplx(re: Double, im: Double) {
    def +(o: Cplx): Cplx = Cplx(re + o.re, im + o.im)
    def -(o: Cplx): Cplx = Cplx(re - o.re, im - o.im)
    def *(o: Cplx): Cplx = Cplx(re * o.re - im * o.im, re * o.im + im * o.re)
    def /(o: Cplx): Cplx = {
      val d = o.re * o.re + o.im * o.im
      Cplx((re * o.re + im * o.im) / d, (im * o.re - re * o.im) / d)
    }
    def *(s: Double): Cplx = Cplx(re * s, im * s)
    /** Principal square root. */
    def sqrt: Cplx = {
      val m = math.hypot(re, im)
      val sr = math.sqrt((m + re) / 2.0)
      val si = math.sqrt((m - re) / 2.0)
      Cplx(sr, if (im >= 0) si else -si)
    }
  }

  /** Monic polynomial with the given roots (numpy `poly`): real part
    * of the expanded coefficients, highest degree first.
    */
  private def polyFromRoots(roots: Seq[Cplx]): Array[Double] = {
    var c = Array(Cplx(1, 0))
    for (r <- roots) {
      val next = new Array[Cplx](c.length + 1)
      next(0) = c(0)
      for (i <- 1 until c.length) next(i) = c(i) - r * c(i - 1)
      next(c.length) = Cplx(0, 0) - r * c(c.length - 1)
      c = next
    }
    c.map(_.re)
  }

  /** Analog Butterworth prototype poles (scipy `buttap`). */
  private def buttapPoles(order: Int): Seq[Cplx] =
    (1 to order).map { k =>
      val theta = math.Pi * (2.0 * k + order - 1.0) / (2.0 * order)
      Cplx(math.cos(theta), math.sin(theta))
    }

  /** zpk → (b, a) via the bilinear transform at fs = 2 (scipy
    * `bilinear_zpk` + `zpk2tf`). `zeros` are the analog zeros.
    */
  private def bilinearTf(zeros: Seq[Cplx], poles: Seq[Cplx], k: Double): Tf = {
    val fs2 = 4.0 // 2 * fs with scipy's fs = 2.0
    val zd = zeros.map(z => (Cplx(fs2, 0) + z) / (Cplx(fs2, 0) - z)) ++
      Seq.fill(poles.length - zeros.length)(Cplx(-1, 0))
    val pd = poles.map(p => (Cplx(fs2, 0) + p) / (Cplx(fs2, 0) - p))
    val num = zeros.foldLeft(Cplx(1, 0))((acc, z) => acc * (Cplx(fs2, 0) - z))
    val den = poles.foldLeft(Cplx(1, 0))((acc, p) => acc * (Cplx(fs2, 0) - p))
    val kd = k * (num / den).re
    val a = polyFromRoots(pd)
    val b = polyFromRoots(zd).map(_ * kd)
    // a(0) is exactly 1 by construction (monic product of (1, …))
    Tf(b, a.map(_ / a(0)))
  }

  /** `scipy.signal.butter(order, wn, btype='low')` → (b, a). `wn` is
    * the cutoff normalized to Nyquist, in (0, 1).
    */
  def butterLowpassTf(order: Int, wn: Double): Tf = {
    require(wn > 0 && wn < 1, s"normalized cutoff must be in (0,1), got $wn")
    val warped = 4.0 * math.tan(math.Pi * wn / 2.0)
    val poles = buttapPoles(order).map(_ * warped)
    val k = math.pow(warped, order)
    bilinearTf(Nil, poles, k)
  }

  /** `scipy.signal.butter(order, [wnLow, wnHigh], btype='band')` →
    * (b, a): lp2bp_zpk pole transform, `order` zeros at s = 0.
    */
  def butterBandpassTf(order: Int, wnLow: Double, wnHigh: Double): Tf = {
    require(0 < wnLow && wnLow < wnHigh && wnHigh < 1,
      s"band edges must satisfy 0 < low < high < 1, got ($wnLow, $wnHigh)")
    val w1 = 4.0 * math.tan(math.Pi * wnLow / 2.0)
    val w2 = 4.0 * math.tan(math.Pi * wnHigh / 2.0)
    val bw = w2 - w1
    val wo = math.sqrt(w1 * w2)
    val pHp = buttapPoles(order).map(_ * (bw / 2.0))
    val woSq = Cplx(wo * wo, 0)
    val pBp = pHp.map(p => p + (p * p - woSq).sqrt) ++
      pHp.map(p => p - (p * p - woSq).sqrt)
    val zeros = Seq.fill(order)(Cplx(0, 0))
    val k = math.pow(bw, order)
    bilinearTf(zeros, pBp, k)
  }

  /** Steady-state direct-form-II-transposed state for a unit step
    * (scipy `lfilter_zi`): solves (I − Aᵀ)·zi = B for the companion
    * matrix A of `a`.
    */
  def lfilterZi(tf: Tf): Array[Double] = {
    val a = tf.a; val b = tf.b
    val m = tf.ntaps - 1
    val mat = Array.ofDim[Double](m, m)
    for (i <- 0 until m; j <- 0 until m) {
      val compT = if (j == 0) -a(i + 1) else if (i == j - 1) 1.0 else 0.0
      mat(i)(j) = (if (i == j) 1.0 else 0.0) - compT
    }
    val rhs = Array.tabulate(m)(i => b(i + 1) - a(i + 1) * b(0))
    solve(mat, rhs)
  }

  /** One direct-form-II-transposed pass with initial state `zi`
    * (scipy `lfilter(b, a, x, zi=zi)`); op order matches scipy's
    * update exactly so the DuckDB oracle can mirror it bit-for-bit.
    */
  def lfilter(tf: Tf, x: Array[Double], zi: Array[Double]): Array[Double] = {
    val b = tf.b; val a = tf.a
    val m = tf.ntaps - 1
    val z = zi.clone()
    val y = new Array[Double](x.length)
    var i = 0
    while (i < x.length) {
      val xi = x(i)
      val yi = b(0) * xi + z(0)
      var j = 0
      while (j < m - 1) { z(j) = b(j + 1) * xi + z(j + 1) - a(j + 1) * yi; j += 1 }
      z(m - 1) = b(m) * xi - a(m) * yi
      y(i) = yi
      i += 1
    }
    y
  }

  /** Zero-phase filtering — `scipy.signal.filtfilt(b, a, x)` with its
    * defaults: odd reflection of `padlen = 3·ntaps` samples at each
    * end (clamped to n−1 for short series, where scipy would raise),
    * `lfilter_zi`-scaled initial conditions, forward pass, backward
    * pass, trim.
    */
  def filtfiltTf(tf: Tf, x: Array[Double]): Array[Double] = {
    val n = x.length
    if (n < 2) return x.clone()
    val padLen = math.min(3 * tf.ntaps, n - 1)
    val ext = new Array[Double](n + 2 * padLen)
    var i = 0
    while (i < padLen) { ext(i) = 2 * x(0) - x(padLen - i); i += 1 }
    System.arraycopy(x, 0, ext, padLen, n)
    i = 0
    while (i < padLen) { ext(n + padLen + i) = 2 * x(n - 1) - x(n - 2 - i); i += 1 }
    val zi = lfilterZi(tf)
    val fwd = lfilter(tf, ext, zi.map(_ * ext(0)))
    val rev = fwd.reverse
    val back = lfilter(tf, rev, zi.map(_ * rev(0)))
    back.reverse.slice(padLen, padLen + n)
  }
}
