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

  /** Natural cubic spline through knots `(ts, xs)` (strictly
    * increasing ts): returns an evaluator clamped to the knot range
    * at the ends. Standard tridiagonal solve for the second
    * derivatives (reference W10's `method='cubic'`,
    * filter_engine.py:85-87 / dialogs.py:49).
    */
  def naturalCubicSpline(ts: Array[Double], xs: Array[Double]): Double => Double = {
    val n = ts.length
    require(n >= 2, "spline needs at least two knots")
    if (n == 2) {
      val slope = (xs(1) - xs(0)) / (ts(1) - ts(0))
      return t0 => {
        val t = math.max(ts(0), math.min(ts(1), t0))
        xs(0) + slope * (t - ts(0))
      }
    }
    val h = Array.tabulate(n - 1)(i => ts(i + 1) - ts(i))
    // Thomas algorithm for natural boundary (m(0) = m(n-1) = 0)
    val m = new Array[Double](n)
    val cp = new Array[Double](n)
    val dp = new Array[Double](n)
    for (i <- 1 until n - 1) {
      val a = h(i - 1); val b = 2 * (h(i - 1) + h(i)); val c = h(i)
      val d = 6 * ((xs(i + 1) - xs(i)) / h(i) - (xs(i) - xs(i - 1)) / h(i - 1))
      val w = if (i == 1) b else b - a * cp(i - 1)
      cp(i) = c / w
      dp(i) = (if (i == 1) d else d - a * dp(i - 1)) / w
    }
    for (i <- n - 2 to 1 by -1) m(i) = dp(i) - cp(i) * m(i + 1)
    t0 => {
      val t = math.max(ts(0), math.min(ts(n - 1), t0))
      var i = java.util.Arrays.binarySearch(ts, t)
      if (i < 0) i = -i - 2
      if (i >= n - 1) i = n - 2
      val dt = t - ts(i); val hi = h(i)
      val a = (ts(i + 1) - t) / hi
      val b = dt / hi
      a * xs(i) + b * xs(i + 1) +
        ((a * a * a - a) * m(i) + (b * b * b - b) * m(i + 1)) * hi * hi / 6.0
    }
  }

  /** Butterworth biquad cascade (second-order sections) for an
    * order-`order` lowpass at normalized cutoff `wn` = cutoff/(fs/2).
    * Standard bilinear-transform design — equivalent to
    * `scipy.signal.butter(order, wn, output='sos')`.
    */
  final case class Biquad(b0: Double, b1: Double, b2: Double, a1: Double, a2: Double)

  def butterLowpassSos(order: Int, wn: Double): Array[Biquad] = {
    require(wn > 0 && wn < 1, s"normalized cutoff must be in (0,1), got $wn")
    // prewarped analog cutoff
    val warped = math.tan(math.Pi * wn / 2.0)
    val nSections = (order + 1) / 2
    val sections = new Array[Biquad](nSections)
    var si = 0
    // complex pole pairs of the analog Butterworth prototype
    val pairs = (0 until order / 2).map { k =>
      val theta = math.Pi * (2.0 * k + 1.0) / (2.0 * order) + math.Pi / 2.0
      (math.cos(theta), math.sin(theta)) // pole = cosθ + i·sinθ, Re<0
    }
    for ((re, im) <- pairs) {
      // analog section: H(s) = wc² / (s² - 2·re·wc·s + wc²)
      val wc = warped
      // bilinear transform with T=2 (matched to prewarp above)
      val a0s = 1.0 - 2.0 * re * wc + wc * wc
      val b0 = wc * wc / a0s
      val a1 = (2.0 * wc * wc - 2.0) / a0s
      val a2 = (1.0 + 2.0 * re * wc + wc * wc) / a0s
      sections(si) = Biquad(b0, 2 * b0, b0, a1, a2)
      si += 1
    }
    if (order % 2 == 1) {
      // real pole section: H(s) = wc / (s + wc)
      val wc = warped
      val a0s = 1.0 + wc
      sections(si) = Biquad(wc / a0s, wc / a0s, 0.0, (wc - 1.0) / a0s, 0.0)
    }
    sections
  }

  /** One forward pass of a biquad cascade (direct form II transposed),
    * with each section's state initialized at its steady-state
    * response to the first sample — scipy `filtfilt`'s
    * `zi = lfilter_zi(...) * x[0]`, which removes the startup
    * transient (a constant signal passes through exactly).
    */
  def sosFilter(sos: Array[Biquad], x: Array[Double]): Array[Double] = {
    var y = x
    for (s <- sos) {
      val out = new Array[Double](y.length)
      val x0 = if (y.nonEmpty) y(0) else 0.0
      val dc = (s.b0 + s.b1 + s.b2) / (1.0 + s.a1 + s.a2)
      val y0 = dc * x0
      var z2 = s.b2 * x0 - s.a2 * y0
      var z1 = s.b1 * x0 - s.a1 * y0 + z2
      var i = 0
      while (i < y.length) {
        val xi = y(i)
        val yi = s.b0 * xi + z1
        z1 = s.b1 * xi - s.a1 * yi + z2
        z2 = s.b2 * xi - s.a2 * yi
        out(i) = yi
        i += 1
      }
      y = out
    }
    y
  }

  /** Zero-phase filtering: forward pass, reverse, forward pass,
    * reverse — `scipy.signal.filtfilt` with odd-reflection padding of
    * length `3·(2·nSections)` like scipy's default `padlen`.
    */
  def filtfilt(sos: Array[Biquad], x: Array[Double]): Array[Double] = {
    if (x.length < 2) return x.clone()
    val padLen = math.min(3 * (2 * sos.length + 1), x.length - 1)
    val n = x.length
    // odd reflection: 2·x[0] - x[padLen..1], x, 2·x[n-1] - x[n-2..]
    val ext = new Array[Double](n + 2 * padLen)
    var i = 0
    while (i < padLen) { ext(i) = 2 * x(0) - x(padLen - i); i += 1 }
    System.arraycopy(x, 0, ext, padLen, n)
    i = 0
    while (i < padLen) { ext(n + padLen + i) = 2 * x(n - 1) - x(n - 2 - i); i += 1 }
    val fwd = sosFilter(sos, ext)
    val rev = fwd.reverse
    val back = sosFilter(sos, rev)
    val out = back.reverse
    out.slice(padLen, padLen + n)
  }
}
