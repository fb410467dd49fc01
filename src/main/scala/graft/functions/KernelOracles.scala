package graft.functions

import graft.functions.Dsp.Tf

/** DuckDB oracle SQL generators for the sequential per-series kernels
  * (W4/W5 `filtfilt`, W3 exact Savitzky–Golay, W10 cubic spline).
  *
  * These kernels are pure double recurrences, so the oracle mirrors
  * the EXACT IEEE operation order of the Scala kernel as generated
  * SQL: recursive CTEs carry the filter/elimination state row by row,
  * and every coefficient is embedded as an e-notation literal (DuckDB
  * parses those as DOUBLE; plain decimals become DECIMAL) produced by
  * `Double.toString`, which round-trips bit-exactly. Identical inputs
  * + identical op order = bit-identical doubles in both engines, so
  * the driver's hash compare is stable — the same determinism policy
  * as the quantized aggregates.
  *
  * Every intermediate CTE is MATERIALIZED: DuckDB inlines CTEs
  * referenced once, and inlining a chain of recursive CTEs into a
  * later recursion's step re-evaluates the whole chain per iteration
  * (measured: minutes + tens of GB at sf0.01; materialized: <1 s).
  */
object KernelOracles {

  /** DOUBLE literal that DuckDB parses to exactly `d`. */
  def lit(d: Double): String = {
    val s = d.toString
    if (s.contains("E") || s.contains("e")) s else s + "e0"
  }

  /** One `lfilter(b, a, ·, zi·x0)` pass over `src(user_id, i, x)` →
    * recursive CTE `out(user_id, i, y, z_0…z_{m-1})`: the direct-form-
    * II-transposed recurrence of [[Dsp.lfilter]] with the same
    * expression shapes —
    *   y       = b0·x + z0
    *   z_j     = b_{j+1}·x + z_{j+1} − a_{j+1}·y   (j < m−1)
    *   z_{m-1} = b_m·x − a_m·y
    * seeded at i = 0 with z_j = zi_j·x0 (`lfilter_zi` literals scaled
    * by the first extended sample, like scipy filtfilt).
    */
  private def df2tCte(tf: Tf, src: String, out: String): String = {
    val m = tf.ntaps - 1
    val zi = Dsp.lfilterZi(tf)
    val b = tf.b.map(lit); val a = tf.a.map(lit)
    val stateCols = (0 until m).map(j => s"z_$j")
    def states(x: String, prior: Int => String): String =
      ((0 until m - 1).map { j =>
        s"${b(j + 1)} * $x + ${prior(j + 1)} - ${a(j + 1)} * y AS z_$j"
      } :+ s"${b(m)} * $x - ${a(m)} * y AS z_${m - 1}").mkString(", ")
    val seed =
      s"SELECT user_id, i, y, ${states("x", j => s"${lit(zi(j))} * x")} FROM " +
        s"(SELECT user_id, i, x, ${b(0)} * x + ${lit(zi(0))} * x AS y FROM $src WHERE i = 0) q"
    val step =
      s"SELECT user_id, i, y, ${states("x", j => s"pz_$j")} FROM " +
        s"(SELECT q0.*, ${b(0)} * x + pz_0 AS y FROM " +
        s"(SELECT e.user_id, e.i, e.x, " +
        stateCols.map(c => s"t.$c AS p$c").mkString(", ") +
        s" FROM $out t JOIN $src e ON e.user_id = t.user_id AND e.i = t.i + 1) q0) q"
    s"$out AS ($seed\nUNION ALL\n$step)"
  }

  /** filtfilt over `r(user_id, i, x)` using shared `plen(user_id, n,
    * pl)`: odd-reflection pad, forward cascade, reverse, backward
    * cascade, reverse, slice. Emits CTEs suffixed `sfx`; the output
    * relation `ffout$sfx` has (user_id, i, y) on original indices.
    */
  private def filtfiltCtes(tf: Tf, sfx: String): Seq[String] = Seq(
    s"""ext$sfx AS MATERIALIZED (
       |  SELECT b.user_id, p.pl - b.i AS i, 2e0 * f.xf - b.x AS x
       |    FROM r b JOIN plen p ON b.user_id = p.user_id JOIN x0n f ON b.user_id = f.user_id
       |    WHERE b.i BETWEEN 1 AND p.pl
       |  UNION ALL
       |  SELECT b.user_id, p.pl + b.i, b.x
       |    FROM r b JOIN plen p ON b.user_id = p.user_id
       |  UNION ALL
       |  SELECT b.user_id, p.pl + p.n + (p.n - 2 - b.i), 2e0 * f.xl - b.x
       |    FROM r b JOIN plen p ON b.user_id = p.user_id JOIN x0n f ON b.user_id = f.user_id
       |    WHERE b.i BETWEEN p.n - 1 - p.pl AND p.n - 2)""".stripMargin,
    df2tCte(tf, s"ext$sfx", s"fpass$sfx"),
    s"""frev$sfx AS MATERIALIZED (SELECT f.user_id, (p.n + 2 * p.pl - 1) - f.i AS i, f.y AS x
       |  FROM fpass$sfx f JOIN plen p ON f.user_id = p.user_id)""".stripMargin,
    df2tCte(tf, s"frev$sfx", s"bpass$sfx"),
    s"""ffout$sfx AS MATERIALIZED (SELECT b.user_id,
       |    ((p.n + 2 * p.pl - 1) - b.i) - p.pl AS i, b.y
       |  FROM bpass$sfx b JOIN plen p ON b.user_id = p.user_id
       |  WHERE ((p.n + 2 * p.pl - 1) - b.i) BETWEEN p.pl AND p.pl + p.n - 1)""".stripMargin)

  /** Shared row/length CTEs over the normalized series. `padMax` =
    * `3 * ntaps` like `Dsp.filtfiltTf` (scipy's default padlen),
    * clamped per series to n−1.
    */
  private def baseCtes(seriesSql: String, padMax: Int): Seq[String] = Seq(
    s"""s AS (SELECT *, t - min(t) OVER (PARTITION BY user_id) AS tn
       |FROM ($seriesSql))""".stripMargin,
    s"""r AS MATERIALIZED (SELECT user_id, event_id, tn, value AS x,
       |  row_number() OVER (PARTITION BY user_id ORDER BY tn, event_id) - 1 AS i FROM s)""".stripMargin,
    s"""plen AS MATERIALIZED (SELECT user_id, max(i) + 1 AS n, least($padMax, max(i)) AS pl
       |  FROM r GROUP BY user_id)""".stripMargin,
    s"""x0n AS MATERIALIZED (SELECT b.user_id,
       |    max(CASE WHEN b.i = 0 THEN b.x END) AS xf,
       |    max(CASE WHEN b.i = p.n - 1 THEN b.x END) AS xl
       |  FROM r b JOIN plen p ON b.user_id = p.user_id GROUP BY b.user_id)""".stripMargin)

  /** q36: zero-phase Butterworth low-pass oracle —
    * `butter(order, wn)` + `filtfilt` (filter_engine.py:115-123).
    */
  def butterLowpassOracle(seriesSql: String, order: Int, wn: Double): String = {
    val tf = Dsp.butterLowpassTf(order, wn)
    val ctes = baseCtes(seriesSql, 3 * tf.ntaps) ++ filtfiltCtes(tf, "F")
    s"""WITH RECURSIVE ${ctes.mkString(",\n")}
       |SELECT r.user_id, r.event_id, r.tn, round(o.y, 6) AS filtered
       |FROM r JOIN ffoutF o ON o.user_id = r.user_id AND o.i = r.i
       |ORDER BY r.user_id, r.event_id""".stripMargin
  }

  /** q37: zero-phase Butterworth band-pass oracle —
    * `butter(order, [low, high], btype='band')` + `filtfilt`
    * (filter_engine.py:125-134).
    */
  def butterBandpassOracle(seriesSql: String, order: Int, wnLow: Double, wnHigh: Double): String = {
    val tf = Dsp.butterBandpassTf(order, wnLow, wnHigh)
    val ctes = baseCtes(seriesSql, 3 * tf.ntaps) ++ filtfiltCtes(tf, "B")
    s"""WITH RECURSIVE ${ctes.mkString(",\n")}
       |SELECT r.user_id, r.event_id, r.tn, round(o.y, 6) AS filtered
       |FROM r JOIN ffoutB o ON o.user_id = r.user_id AND o.i = r.i
       |ORDER BY r.user_id, r.event_id""".stripMargin
  }

  /** Precomputed Savitzky–Golay edge weight row: the least-squares
    * polynomial fit is linear in the samples, so the fitted value at
    * `pos` is a fixed dot product; weight k comes from fitting the
    * k-th unit vector. Used by BOTH the kernel and the oracle so the
    * float ops agree exactly.
    */
  def savgolEdgeWeights(polyorder: Int, wlen: Int, pos: Int): Array[Double] = {
    val ts = Array.tabulate(wlen)(_.toDouble)
    Array.tabulate(wlen) { k =>
      val xs = Array.tabulate(wlen)(j => if (j == k) 1.0 else 0.0)
      Dsp.polyfitAt(ts, xs, math.min(polyorder, wlen - 1), pos.toDouble)
    }
  }

  /** q38: exact Savitzky–Golay (interior FIR + edge polynomial refit)
    * as a single projection over per-user value lists. Valid for
    * series with n ≥ window (shorter series fall back to the kernel's
    * runtime fit and are not covered — none exist in the test data).
    */
  def savgolExactOracle(seriesSql: String, window: Int, polyorder: Int): String = {
    val h = window / 2
    val interior = Dsp.savgolCoefficients(window, polyorder)
    // interior: y_i = Σ_k c_k · x[i−h+k]  (left-assoc, k ascending)
    val interiorExpr = interior.zipWithIndex
      .map { case (c, k) => s"${lit(c)} * xs[i + ${k - h} + 1]" }
      .mkString(" + ")
    // head edge i ∈ [0,h): window rows 0..i+h, evaluated at i
    val headCases = (0 until h).map { i =>
      val w = savgolEdgeWeights(polyorder, i + h + 1, i)
      val terms = w.zipWithIndex.map { case (c, k) => s"${lit(c)} * xs[${k + 1}]" }.mkString(" + ")
      s"WHEN i = $i THEN $terms"
    }
    // tail edge j = n−1−i ∈ [0,h): window rows i−h..n−1, evaluated at offset h
    val tailCases = (0 until h).map { j =>
      val w = savgolEdgeWeights(polyorder, h + j + 1, h)
      val terms = w.zipWithIndex.map { case (c, k) => s"${lit(c)} * xs[i + ${k - h} + 1]" }.mkString(" + ")
      s"WHEN n - 1 - i = $j THEN $terms"
    }
    s"""WITH s AS (SELECT *, t - min(t) OVER (PARTITION BY user_id) AS tn
       |FROM ($seriesSql)),
       |r AS MATERIALIZED (SELECT user_id, event_id, tn, value,
       |  row_number() OVER (PARTITION BY user_id ORDER BY tn, event_id) - 1 AS i FROM s),
       |lx AS MATERIALIZED (SELECT user_id, list(value ORDER BY i) AS xs, count(*) AS n
       |  FROM r GROUP BY user_id)
       |SELECT r.user_id, r.event_id, r.tn,
       |  round(CASE
       |    WHEN i >= $h AND i < n - $h THEN $interiorExpr
       |    ${headCases.mkString("\n    ")}
       |    ${tailCases.mkString("\n    ")}
       |  END, 6) AS filtered
       |FROM r JOIN lx USING (user_id)
       |ORDER BY user_id, event_id""".stripMargin
  }

  /** q110: EWMA (exponentially weighted moving average) oracle — the
    * first-order IIR recurrence `y_0 = x_0; y_i = α·x_i + (1−α)·y_{i−1}`
    * (pandas `ewm(alpha).mean()` with `adjust=False`) replayed as a
    * recursive CTE with the kernel's exact IEEE op order
    * (mul, mul, add — left-associated like the Scala loop).
    */
  def ewmaOracle(seriesSql: String, alpha: Double): String = {
    val a = lit(alpha); val b = lit(1.0 - alpha)
    s"""WITH RECURSIVE s AS (SELECT *, t - min(t) OVER (PARTITION BY user_id) AS tn
       |FROM ($seriesSql)),
       |r AS MATERIALIZED (SELECT user_id, event_id, tn, value AS x,
       |  row_number() OVER (PARTITION BY user_id ORDER BY tn, event_id) - 1 AS i FROM s),
       |e AS (SELECT user_id, i, x AS y FROM r WHERE i = 0
       |UNION ALL
       |SELECT r.user_id, r.i, $a * r.x + $b * e.y
       |  FROM e JOIN r ON r.user_id = e.user_id AND r.i = e.i + 1)
       |SELECT r.user_id, r.event_id, r.tn, e.y AS smoothed
       |FROM r JOIN e ON e.user_id = r.user_id AND e.i = r.i
       |ORDER BY r.user_id, r.event_id""".stripMargin
  }

  /** q180: steady-state-free Kalman local-level filter oracle — the
    * scalar predict/update recurrence
    * `P⁻ = P + Q;  K = P⁻/(P⁻+R);  x̂ = x̂ + K·(z−x̂);  P = (1−K)·P⁻`
    * seeded with `x̂₀ = z₀, P₀ = R`, replayed with
    * [[graft.operators.SignalKernels.kalmanLevel]]'s exact IEEE op
    * order. The gain expression `(e.p+Q)/((e.p+Q)+R)` is written out
    * twice (state and covariance update) — DuckDB evaluates each
    * occurrence with the same adds/div, so both engines agree
    * bitwise. Output is UNROUNDED like q110/q132: bit-exact replay
    * needs no rounding.
    */
  def kalmanOracle(seriesSql: String, q: Double, r: Double): String = {
    val qL = lit(q); val rL = lit(r)
    s"""WITH RECURSIVE s AS (SELECT *, t - min(t) OVER (PARTITION BY user_id) AS tn
       |FROM ($seriesSql)),
       |r AS MATERIALIZED (SELECT user_id, event_id, tn, value AS x,
       |  row_number() OVER (PARTITION BY user_id ORDER BY tn, event_id) - 1 AS i FROM s),
       |e AS (SELECT user_id, i, x AS y, $rL AS p FROM r WHERE i = 0
       |UNION ALL
       |SELECT r.user_id, r.i,
       |  e.y + ((e.p + $qL) / ((e.p + $qL) + $rL)) * (r.x - e.y),
       |  (1e0 - ((e.p + $qL) / ((e.p + $qL) + $rL))) * (e.p + $qL)
       |  FROM e JOIN r ON r.user_id = e.user_id AND r.i = e.i + 1)
       |SELECT r.user_id, r.event_id, r.tn, e.y AS level
       |FROM r JOIN e ON e.user_id = r.user_id AND e.i = r.i
       |ORDER BY r.user_id, r.event_id""".stripMargin
  }

  /** q132: running Goertzel power oracle — the second-order
    * single-bin DFT recurrence `s_i = x_i + c·s_{i-1} − s_{i-2}`
    * (c = 2·cos(2πf) embedded as an exact double literal) replayed
    * with [[graft.operators.SignalKernels.goertzelPower]]'s IEEE op
    * order, including the seed row's full `x + c·0 − 0` expression so
    * the engines agree on signed zeros. Output is UNROUNDED like
    * q110: bit-exact replay needs no rounding, and rounding is the
    * only nondeterminism available.
    */
  def goertzelOracle(seriesSql: String, freq: Double): String = {
    val c = lit(2.0 * math.cos(2.0 * math.Pi * freq))
    s"""WITH RECURSIVE s AS (SELECT *, t - min(t) OVER (PARTITION BY user_id) AS tn
       |FROM ($seriesSql)),
       |r AS MATERIALIZED (SELECT user_id, event_id, tn, value AS x,
       |  row_number() OVER (PARTITION BY user_id ORDER BY tn, event_id) - 1 AS i FROM s),
       |e AS (SELECT user_id, i, x + $c * 0e0 - 0e0 AS s1, 0e0 AS s2 FROM r WHERE i = 0
       |UNION ALL
       |SELECT r.user_id, r.i, r.x + $c * e.s1 - e.s2, e.s1
       |  FROM e JOIN r ON r.user_id = e.user_id AND r.i = e.i + 1)
       |SELECT r.user_id, r.event_id, r.tn,
       |  e.s1 * e.s1 + e.s2 * e.s2 - $c * e.s1 * e.s2 AS power
       |FROM r JOIN e ON e.user_id = r.user_id AND e.i = r.i
       |ORDER BY r.user_id, r.event_id""".stripMargin
  }

  /** q111: anti-aliased decimation oracle — the q36 zero-phase
    * low-pass cascade at the decimation cutoff, then every `factor`-th
    * sample of the filtered series (scipy `decimate`-style:
    * filter-then-pick, never pick-then-filter).
    */
  def decimateOracle(seriesSql: String, order: Int, wn: Double, factor: Int): String = {
    val tf = Dsp.butterLowpassTf(order, wn)
    val ctes = baseCtes(seriesSql, 3 * tf.ntaps) ++ filtfiltCtes(tf, "D")
    s"""WITH RECURSIVE ${ctes.mkString(",\n")}
       |SELECT r.user_id, r.event_id, r.tn, round(o.y, 6) AS decimated
       |FROM r JOIN ffoutD o ON o.user_id = r.user_id AND o.i = r.i
       |WHERE r.i % $factor = 0
       |ORDER BY r.user_id, r.event_id""".stripMargin
  }

  /** The three nonzero degree-2 B-splines on 0-based knot interval
    * `j` at `x`, as DuckDB SQL over the 1-based knot list `tq` —
    * exactly [[Dsp.quadraticSpline]]'s `basis` op order. `tm1/t0/
    * tp1/tp2` are the SQL refs for the Scala kernel's
    * `tq(j-1)/tq(j)/tq(j+1)/tq(j+2)`.
    */
  private def qsBasis(tm1: String, t0: String, tp1: String, tp2: String,
      x: String): (String, String, String) = (
    s"(($tp1 - $x) / ($tp1 - $tm1)) * (($tp1 - $x) / ($tp1 - $t0))",
    s"(($x - $tm1) / ($tp1 - $tm1)) * (($tp1 - $x) / ($tp1 - $t0))" +
      s" + (($tp2 - $x) / ($tp2 - $t0)) * (($x - $t0) / ($tp1 - $t0))",
    s"(($x - $t0) / ($tp2 - $t0)) * (($x - $t0) / ($tp1 - $t0))")

  /** q147: scipy-faithful quadratic B-spline interpolation oracle —
    * replays [[Dsp.quadraticSpline]]'s `make_interp_spline(k=2)`
    * algorithm in the kernel's exact IEEE op order: the midpoint
    * knot vector (triple end knots, first/last midpoint dropped),
    * the tridiagonal collocation rows (site `lts[i+1]` lives on
    * 0-based knot interval `i+1`), a Thomas forward sweep and back
    * substitution as recursive CTEs, and de Boor evaluation of the
    * three nonzero basis splines against the solved coefficients.
    * Lists are 1-based (DuckDB); `i`/`j0` are 0-based coefficient /
    * interval indices like the Scala arrays, so the Scala kernel's
    * `tq(j)` is SQL `tq[j + 1]`.
    */
  def quadraticSplineOracle(seriesSql: String): String = {
    // collocation at x = lts[i+1] (0-based site i) on interval j = i+1
    val (ca, cb, cc) = qsBasis("tq[i + 1]", "tq[i + 2]", "tq[i + 3]", "tq[i + 4]", "lts[i + 1]")
    // evaluation at tc on interval j0
    val (eb0, eb1, eb2) = qsBasis("tq[j0]", "tq[j0 + 1]", "tq[j0 + 2]", "tq[j0 + 3]", "tc")
    s"""WITH RECURSIVE s AS (SELECT *, t - min(t) OVER (PARTITION BY user_id) AS tn
       |FROM ($seriesSql)),
       |r AS MATERIALIZED (SELECT user_id, event_id, tn,
       |  CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v
       |  FROM s),
       |k AS MATERIALIZED (SELECT user_id, tn, v,
       |  row_number() OVER (PARTITION BY user_id ORDER BY tn) - 1 AS j
       |  FROM r WHERE v IS NOT NULL),
       |kl AS MATERIALIZED (SELECT user_id, list(tn ORDER BY j) AS lts,
       |    list(v ORDER BY j) AS lxs, count(*) AS kn
       |  FROM k GROUP BY user_id),
       |-- scipy k=2 knot vector: triple end knots + interior midpoints
       |-- with the first and last midpoint dropped (0-based length kn+3)
       |klq AS MATERIALIZED (SELECT user_id, lts, lxs, kn,
       |  [lts[1], lts[1], lts[1]]
       |    || list_transform(range(1, kn - 2), g -> (lts[g + 1] + lts[g + 2]) / 2e0)
       |    || [lts[kn], lts[kn], lts[kn]] AS tq
       |  FROM kl),
       |-- tridiagonal collocation rows i = 1..kn-2 (0-based): the three
       |-- nonzero basis values at site lts[i+1], rhs folded with the
       |-- known end coefficients c0 = lxs[1], c(kn-1) = lxs[kn]
       |rows_ct AS MATERIALIZED (
       |  SELECT user_id, i, kn, av, bv, cv,
       |    (lxs[i + 1] - CASE WHEN i = 1 THEN av * lxs[1] ELSE 0e0 END)
       |      - CASE WHEN i = kn - 2 THEN cv * lxs[kn] ELSE 0e0 END AS rhs
       |  FROM (
       |    SELECT user_id, lts, lxs, kn, tq, i,
       |      $ca AS av,
       |      $cb AS bv,
       |      $cc AS cv
       |    FROM (SELECT *, unnest(range(1, kn - 1)) AS i FROM klq WHERE kn >= 3) u) q),
       |-- Thomas forward sweep: w = bv - av*cp_prev (i=1: w = bv)
       |fwd AS (
       |  SELECT user_id, 1 AS i, cv / bv AS cp, rhs / bv AS dp
       |  FROM rows_ct WHERE i = 1
       |  UNION ALL
       |  SELECT user_id, i, cv / w AS cp, (rhs - av * pdp) / w AS dp FROM (
       |    SELECT rc.user_id, rc.i, rc.cv, rc.av, rc.rhs,
       |      rc.bv - rc.av * f.cp AS w, f.dp AS pdp
       |    FROM fwd f JOIN rows_ct rc ON rc.user_id = f.user_id AND rc.i = f.i + 1) q),
       |fm AS MATERIALIZED (SELECT user_id, i, cp, dp FROM fwd),
       |-- back substitution: c(kn-2) = dp(kn-2); c(i) = dp(i) - cp(i)*c(i+1)
       |bwd AS (
       |  SELECT f.user_id, f.i, f.dp AS cval
       |    FROM fm f JOIN klq ON klq.user_id = f.user_id WHERE f.i = klq.kn - 2
       |  UNION ALL
       |  SELECT f.user_id, f.i, f.dp - f.cp * b.cval
       |    FROM bwd b JOIN fm f ON f.user_id = b.user_id AND f.i = b.i - 1
       |    WHERE b.i >= 2),
       |coef AS MATERIALIZED (
       |  SELECT user_id, 0 AS i, lxs[1] AS cval FROM klq WHERE kn >= 3
       |  UNION ALL SELECT user_id, i, cval FROM bwd
       |  UNION ALL SELECT user_id, kn - 1 AS i, lxs[kn] AS cval FROM klq WHERE kn >= 3),
       |ev AS MATERIALIZED (
       |  SELECT r.user_id, r.event_id, r.tn, r.v, klq.lts, klq.lxs, klq.kn, klq.tq,
       |    CASE WHEN klq.kn >= 2
       |      THEN greatest(klq.lts[1], least(klq.lts[klq.kn], r.tn)) END AS tc
       |  FROM r JOIN klq ON klq.user_id = r.user_id),
       |-- rightmost knot interval containing tc, clamped to [2, kn-1]
       |ei AS MATERIALIZED (
       |  SELECT *, CASE WHEN kn >= 3 THEN
       |      least(greatest(len(list_filter(tq, e -> e <= tc)) - 1, 2), kn - 1)
       |    END AS j0
       |  FROM ev)
       |SELECT ei.user_id, ei.event_id, ei.tn,
       |  round(CASE
       |    WHEN v IS NOT NULL THEN v
       |    WHEN kn < 2 THEN 'NaN'::DOUBLE
       |    WHEN kn = 2 THEN lxs[1] + ((lxs[2] - lxs[1]) / (lts[2] - lts[1])) * (tc - lts[1])
       |    ELSE ($eb0) * cm2.cval + ($eb1) * cm1.cval + ($eb2) * cm0.cval
       |  END, 6) AS vq
       |FROM ei
       |LEFT JOIN coef cm2 ON cm2.user_id = ei.user_id AND cm2.i = ei.j0 - 2
       |LEFT JOIN coef cm1 ON cm1.user_id = ei.user_id AND cm1.i = ei.j0 - 1
       |LEFT JOIN coef cm0 ON cm0.user_id = ei.user_id AND cm0.i = ei.j0
       |ORDER BY ei.user_id, ei.event_id""".stripMargin
  }

  /** BSPLVB (k=3) unrolled as layered SQL over the 1-based knot
    * list `tq`: emits columns `b0v..b3v`, the four nonzero cubic
    * B-splines on 0-based knot interval `j` at `x`, in exactly
    * [[Dsp.notAKnotCubicSpline]]'s `basis` op order. Each layer only
    * references earlier layers, so no lateral-alias support is
    * assumed. The Scala kernel's 0-based `tq(j + d)` is SQL
    * `tq[j + d + 1]`.
    */
  private def cubicBasisLayers(j: String, x: String): Seq[String] = {
    def t(d: Int): String = {
      val m = d + 1
      if (m == 0) s"tq[$j]" else if (m > 0) s"tq[$j + $m]" else s"tq[$j - ${-m}]"
    }
    Seq(
      s"1e0 / (${t(1)} - ${t(0)}) AS term10",
      s"(${t(1)} - $x) * term10 AS c10, ($x - ${t(0)}) * term10 AS c11",
      s"c10 / (${t(1)} - ${t(-1)}) AS t20, c11 / (${t(2)} - ${t(0)}) AS t21",
      s"(${t(1)} - $x) * t20 AS o20, ($x - ${t(-1)}) * t20 AS s20, ($x - ${t(0)}) * t21 AS o22",
      s"s20 + (${t(2)} - $x) * t21 AS o21",
      s"o20 / (${t(1)} - ${t(-2)}) AS t30, o21 / (${t(2)} - ${t(-1)}) AS t31, o22 / (${t(3)} - ${t(0)}) AS t32",
      s"(${t(1)} - $x) * t30 AS b0v, ($x - ${t(-2)}) * t30 AS s30, ($x - ${t(-1)}) * t31 AS s31, ($x - ${t(0)}) * t32 AS b3v",
      s"s30 + (${t(2)} - $x) * t31 AS b1v, s31 + (${t(3)} - $x) * t32 AS b2v")
  }

  private def layered(inner: String, layers: Seq[String]): String =
    layers.foldLeft(s"($inner)")((acc, l) => s"(SELECT *, $l FROM $acc)")

  /** q66: scipy-faithful cubic B-spline interpolation oracle —
    * replays [[Dsp.notAKnotCubicSpline]]'s `make_interp_spline(k=3)`
    * algorithm in the kernel's exact IEEE op order: the not-a-knot
    * knot vector (quadruple end knots, interior knots = data sites
    * minus the two nearest each end), banded collocation rows
    * (kl = ku = 2, identity end rows), an unpivoted banded-LU
    * forward sweep carrying two U rows of state and a two-ahead back
    * substitution as recursive CTEs, and BSPLVB evaluation of the
    * four nonzero basis splines against the solved coefficients.
    * Lists are 1-based (DuckDB); `i`/`j0` are 0-based row / interval
    * indices like the Scala arrays. Two knots replay the secant,
    * three the Lagrange parabola — the kernel's graceful
    * degradations below scipy's k+1 minimum.
    */
  def cubicSplineOracle(seriesSql: String): String = {
    val siteJ = "least(greatest(len(list_filter(tq, e -> e <= xc)) - 1, 3), kn - 1)"
    val colloc = layered(
      s"""SELECT user_id, i, kn, lts, lxs, tq, lts[i + 1] AS xc
         |    FROM (SELECT *, unnest(range(1, kn - 1)) AS i FROM klq WHERE kn >= 4) u0""".stripMargin,
      s"$siteJ AS jc" +: cubicBasisLayers("jc", "xc"))
    val evalB = layered("SELECT * FROM ei", cubicBasisLayers("j0", "tc"))
    s"""WITH RECURSIVE s AS (SELECT *, t - min(t) OVER (PARTITION BY user_id) AS tn
       |FROM ($seriesSql)),
       |r AS MATERIALIZED (SELECT user_id, event_id, tn,
       |  CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v
       |  FROM s),
       |k AS MATERIALIZED (SELECT user_id, tn, v,
       |  row_number() OVER (PARTITION BY user_id ORDER BY tn) - 1 AS j
       |  FROM r WHERE v IS NOT NULL),
       |kl AS MATERIALIZED (SELECT user_id, list(tn ORDER BY j) AS lts,
       |    list(v ORDER BY j) AS lxs, count(*) AS kn
       |  FROM k GROUP BY user_id),
       |-- scipy not-a-knot knot vector for k=3: quadruple end knots +
       |-- the data sites minus the two nearest each end
       |klq AS MATERIALIZED (SELECT user_id, lts, lxs, kn,
       |  [lts[1], lts[1], lts[1], lts[1]]
       |    || list_transform(range(1, kn - 3), g -> lts[g + 2])
       |    || [lts[kn], lts[kn], lts[kn], lts[kn]] AS tq
       |  FROM kl),
       |-- banded collocation rows (columns i-2..i+2): interior site
       |-- lts[i+1] lives on interval jc = i+2 (strictly inside: slots
       |-- e1..u2) or jc = i+1 (left knot, where B_jc vanishes: slots
       |-- e0..u1); rows 0 and kn-1 are identities
       |rows_ct AS MATERIALIZED (
       |  SELECT user_id, 0 AS i, kn, 0e0 AS e0, 0e0 AS e1, 1e0 AS d0,
       |    0e0 AS u1, 0e0 AS u2, lxs[1] AS rhs FROM klq WHERE kn >= 4
       |  UNION ALL
       |  SELECT user_id, i, kn,
       |    CASE WHEN jc = i + 2 THEN 0e0 ELSE b0v END AS e0,
       |    CASE WHEN jc = i + 2 THEN b0v ELSE b1v END AS e1,
       |    CASE WHEN jc = i + 2 THEN b1v ELSE b2v END AS d0,
       |    CASE WHEN jc = i + 2 THEN b2v ELSE b3v END AS u1,
       |    CASE WHEN jc = i + 2 THEN b3v ELSE 0e0 END AS u2,
       |    lxs[i + 1] AS rhs
       |  FROM $colloc cb
       |  UNION ALL
       |  SELECT user_id, kn - 1 AS i, kn, 0e0, 0e0, 1e0, 0e0, 0e0, lxs[kn]
       |    FROM klq WHERE kn >= 4),
       |-- unpivoted banded-LU forward sweep, carrying the previous TWO
       |-- U rows: l2 eliminates against row i-2, l1 against row i-1
       |fwd AS (
       |  SELECT user_id, 0 AS i, d0 AS d, u1, u2, rhs AS r,
       |    1e0 AS pd, 0e0 AS pu1, 0e0 AS pu2, 0e0 AS pr
       |  FROM rows_ct WHERE i = 0
       |  UNION ALL
       |  SELECT user_id, i, db - l1 * fu1 AS d, u1r - l1 * fu2 AS u1,
       |    u2r AS u2, rb - l1 * fr AS r,
       |    fd AS pd, fu1 AS pu1, fu2 AS pu2, fr AS pr
       |  FROM (SELECT q.*, e1b / fd AS l1 FROM (
       |    SELECT f.user_id, rc.i,
       |      rc.e1 - (rc.e0 / f.pd) * f.pu1 AS e1b,
       |      rc.d0 - (rc.e0 / f.pd) * f.pu2 AS db,
       |      rc.rhs - (rc.e0 / f.pd) * f.pr AS rb,
       |      rc.u1 AS u1r, rc.u2 AS u2r,
       |      f.d AS fd, f.u1 AS fu1, f.u2 AS fu2, f.r AS fr
       |    FROM fwd f JOIN rows_ct rc ON rc.user_id = f.user_id AND rc.i = f.i + 1) q) q2),
       |fm AS MATERIALIZED (SELECT user_id, i, d, u1, u2, r FROM fwd),
       |-- back substitution with the U bandwidth-2 tail zero-padded:
       |-- c(i) = ((r - u1*c(i+1)) - u2*c(i+2)) / d
       |bwd AS (
       |  SELECT f.user_id, f.i, ((f.r - f.u1 * 0e0) - f.u2 * 0e0) / f.d AS c, 0e0 AS cn
       |    FROM fm f JOIN klq ON klq.user_id = f.user_id WHERE f.i = klq.kn - 1
       |  UNION ALL
       |  SELECT f.user_id, f.i, ((f.r - f.u1 * b.c) - f.u2 * b.cn) / f.d AS c, b.c AS cn
       |    FROM bwd b JOIN fm f ON f.user_id = b.user_id AND f.i = b.i - 1
       |    WHERE b.i >= 1),
       |coef AS MATERIALIZED (SELECT user_id, i, c FROM bwd),
       |ev AS MATERIALIZED (
       |  SELECT r.user_id, r.event_id, r.tn, r.v, klq.lts, klq.lxs, klq.kn, klq.tq,
       |    CASE WHEN klq.kn >= 2
       |      THEN greatest(klq.lts[1], least(klq.lts[klq.kn], r.tn)) END AS tc
       |  FROM r JOIN klq ON klq.user_id = r.user_id),
       |-- rightmost knot interval containing tc, clamped to [3, kn-1]
       |ei AS MATERIALIZED (
       |  SELECT *, CASE WHEN kn >= 4 THEN
       |      least(greatest(len(list_filter(tq, e -> e <= tc)) - 1, 3), kn - 1)
       |    END AS j0
       |  FROM ev),
       |eb AS MATERIALIZED (SELECT * FROM $evalB q3)
       |SELECT eb.user_id, eb.event_id, eb.tn,
       |  round(CASE
       |    WHEN v IS NOT NULL THEN v
       |    WHEN kn < 2 THEN 'NaN'::DOUBLE
       |    WHEN kn = 2 THEN lxs[1] + ((lxs[2] - lxs[1]) / (lts[2] - lts[1])) * (tc - lts[1])
       |    WHEN kn = 3 THEN
       |      lxs[1] * ((tc - lts[2]) * (tc - lts[3])) / ((lts[1] - lts[2]) * (lts[1] - lts[3]))
       |      + lxs[2] * ((tc - lts[1]) * (tc - lts[3])) / ((lts[2] - lts[1]) * (lts[2] - lts[3]))
       |      + lxs[3] * ((tc - lts[1]) * (tc - lts[2])) / ((lts[3] - lts[1]) * (lts[3] - lts[2]))
       |    ELSE ((b0v * cm3.c + b1v * cm2.c) + b2v * cm1.c) + b3v * cm0.c
       |  END, 6) AS vc
       |FROM eb
       |LEFT JOIN coef cm3 ON cm3.user_id = eb.user_id AND cm3.i = eb.j0 - 3
       |LEFT JOIN coef cm2 ON cm2.user_id = eb.user_id AND cm2.i = eb.j0 - 2
       |LEFT JOIN coef cm1 ON cm1.user_id = eb.user_id AND cm1.i = eb.j0 - 1
       |LEFT JOIN coef cm0 ON cm0.user_id = eb.user_id AND cm0.i = eb.j0
       |ORDER BY eb.user_id, eb.event_id""".stripMargin
  }
}
