package graft.operators

import graft.functions.Dsp
import graft.operators.SeriesOps.Series
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-series sequential kernels that are NOT window-expressible —
  * IIR recurrences need a forward+backward scan over the whole series
  * (reference `butter_lowpass`/`butter_bandpass`,
  * filter_engine.py:50-58, 115-134, zero-phase `filtfilt`), and exact
  * Savitzky–Golay needs the scipy edge polynomial refit
  * (filter_engine.py:94-113).
  *
  * Spark shape: `groupByKey(seriesKey).flatMapGroups` — the idiomatic
  * distributed form for per-key sequential scans. Parallelism is
  * across series (millions of keys at 100 TB); each series' samples
  * are gathered and scanned in one task. The per-series memory bound
  * (a trial is minutes–hours at ≤ kHz ⇒ ≤ a few 1e7 doubles) is the
  * documented domain bound, same as the reference's in-memory frame.
  *
  * The runner is schema-generic: the series key and (time, tie)
  * ordering are string-encoded, all original columns ride through the
  * per-key scan, and the kernel output is appended — one shuffle, no
  * join-back — so any [[Series]] works, including a key-less trial.
  */
object SignalKernels {

  private val Sep = "\u0001"

  /** Run an in-memory whole-series kernel over `src`, writing `out`.
    * Rows are ordered by (timeCol, tieCols); the kernel receives the
    * series' values in that order and must return one output per
    * input. Null inputs pass through as NaN.
    */
  def applyKernel(spark: SparkSession, df: DataFrame, s: Series, src: String,
      out: String)(kernel: Array[Double] => Array[Double]): DataFrame =
    applyKernelWithTime(spark, df, s, src, out)((_, xs) => kernel(xs))

  /** Zero-phase Butterworth low-pass, normalized cutoff `wn` ∈ (0,1)
    * (fraction of Nyquist) — `butter(order, wn)` + `filtfilt(b, a, x)`
    * exactly as the reference (filter_engine.py:115-123).
    */
  def butterLowpass(spark: SparkSession, df: DataFrame, s: Series, src: String,
      out: String, order: Int, wn: Double): DataFrame = {
    val tf = Dsp.butterLowpassTf(order, wn)
    applyKernel(spark, df, s, src, out)(Dsp.filtfiltTf(tf, _))
  }

  /** Zero-phase Butterworth band-pass — `butter(order, [low, high],
    * btype='band')` + `filtfilt(b, a, x)` exactly as the reference
    * (filter_engine.py:125-134).
    */
  def butterBandpass(spark: SparkSession, df: DataFrame, s: Series, src: String,
      out: String, order: Int, wnLow: Double, wnHigh: Double): DataFrame = {
    val tf = Dsp.butterBandpassTf(order, wnLow, wnHigh)
    applyKernel(spark, df, s, src, out)(Dsp.filtfiltTf(tf, _))
  }

  /** Reference sample-rate inference over one series' time axis
    * (data_model.py:116-126): `round(1/median(positive Δt), 2)`,
    * fallback 120 Hz — the pure in-kernel form of
    * [[graft.sources.TrialReader.inferSampleRate]], same op order
    * (`rint(100/median)/100`, exact interpolating median).
    */
  private[graft] def inferFsLocal(ts: Array[Double]): Double = {
    if (ts.length < 2) return 120.0
    val d = new Array[Double](ts.length - 1)
    var n = 0
    var i = 1
    while (i < ts.length) {
      val dt = ts(i) - ts(i - 1)
      if (dt > 0) { d(n) = dt; n += 1 }
      i += 1
    }
    if (n == 0) return 120.0
    java.util.Arrays.sort(d, 0, n)
    val med = if (n % 2 == 1) d(n / 2) else (d(n / 2 - 1) + d(n / 2)) / 2.0
    if (med <= 0) 120.0 else math.rint(100.0 / med) / 100.0
  }

  /** Hz-parameterized Butterworth low-pass: the reference dialect
    * carries `cutoff` in Hz and normalizes it against the TRIAL'S
    * inferred sample rate (filter_engine.py:115-118 via
    * data_model.sample_rate). Here the rate is inferred per series
    * INSIDE the kernel, so one job replays a Hz recipe faithfully
    * over a multi-trial frame of MIXED rates — the scalar-fs
    * limitation a single pre-converted Wn cannot avoid. (Under a
    * time selection the group's axis is the selection slice; on the
    * uniform axes the reference targets, median Δt — hence fs — is
    * identical to the full-trial value.)
    */
  def butterLowpassHz(spark: SparkSession, df: DataFrame, s: Series, src: String,
      out: String, order: Int, cutoffHz: Double): DataFrame =
    applyKernelWithTime(spark, df, s, src, out) { (ts, xs) =>
      val fs = inferFsLocal(ts)
      // rint(100/median)/100 rounds to 0.0 for median Δt > 200 s; a
      // zero rate would design Wn = ∞ → all-NaN output, so fail loud
      // (scipy's butter raises for the same degenerate input)
      require(fs > 0, s"inferred sample rate $fs must be positive for a $cutoffHz Hz cutoff")
      Dsp.filtfiltTf(Dsp.butterLowpassTf(order, cutoffHz / (0.5 * fs)), xs)
    }

  /** Hz-parameterized Butterworth band-pass — per-series rate
    * inference like [[butterLowpassHz]] (filter_engine.py:125-130).
    */
  def butterBandpassHz(spark: SparkSession, df: DataFrame, s: Series, src: String,
      out: String, order: Int, lowHz: Double, highHz: Double): DataFrame =
    applyKernelWithTime(spark, df, s, src, out) { (ts, xs) =>
      val fs = inferFsLocal(ts)
      require(fs > 0, s"inferred sample rate $fs must be positive for a $lowHz-$highHz Hz band")
      val nyq = 0.5 * fs
      Dsp.filtfiltTf(Dsp.butterBandpassTf(order, lowHz / nyq, highHz / nyq), xs)
    }

  /** Reference integrate: `np.cumsum(x) · dt` with
    * `dt = 1/max(fs, 1)` from the series' OWN inferred rate
    * (filter_engine.py:63-65) — cumsum first, multiply after, NaNs
    * poison the running sum exactly like numpy.
    */
  def integrateAuto(spark: SparkSession, df: DataFrame, s: Series, src: String,
      out: String): DataFrame =
    applyKernelWithTime(spark, df, s, src, out) { (ts, xs) =>
      val dt = 1.0 / math.max(inferFsLocal(ts), 1.0)
      val y = new Array[Double](xs.length)
      var acc = 0.0
      var i = 0
      while (i < xs.length) { acc += xs(i); y(i) = acc * dt; i += 1 }
      y
    }

  /** EWMA smoothing — `y_0 = x_0; y_i = α·x_i + (1−α)·y_{i−1}`
    * (pandas `ewm(alpha).mean()` with `adjust=False`): a first-order
    * IIR, so it rides the same per-series sequential-kernel runner as
    * the Butterworth filters. Op order (mul, mul, add) is mirrored
    * verbatim by [[graft.functions.KernelOracles.ewmaOracle]] for
    * bit-exact parity.
    */
  def ewma(spark: SparkSession, df: DataFrame, s: Series, src: String,
      out: String, alpha: Double): DataFrame = {
    val beta = 1.0 - alpha
    applyKernel(spark, df, s, src, out) { x =>
      val y = new Array[Double](x.length)
      if (x.nonEmpty) {
        y(0) = x(0)
        var i = 1
        while (i < x.length) { y(i) = alpha * x(i) + beta * y(i - 1); i += 1 }
      }
      y
    }
  }

  /** Scalar Kalman local-level filter — the adaptive-gain
    * generalization of [[ewma]] (the gain `K` anneals from 1 toward
    * the steady-state EWMA weight as covariance `P` converges):
    * `P⁻ = P + Q;  K = P⁻/(P⁻+R);  x̂ᵢ = x̂ᵢ₋₁ + K·(zᵢ−x̂ᵢ₋₁);
    * P = (1−K)·P⁻`, seeded `x̂₀ = z₀, P₀ = R`. First-order state ⇒
    * the same per-series sequential-kernel runner as the IIR filters.
    * IEEE op order is mirrored verbatim by
    * [[graft.functions.KernelOracles.kalmanOracle]].
    */
  def kalmanLevel(spark: SparkSession, df: DataFrame, s: Series, src: String,
      out: String, q: Double, r: Double): DataFrame =
    applyKernel(spark, df, s, src, out) { x =>
      val y = new Array[Double](x.length)
      if (x.nonEmpty) {
        y(0) = x(0)
        var p = r
        var i = 1
        while (i < x.length) {
          val pp = p + q
          val k = pp / (pp + r)
          y(i) = y(i - 1) + k * (x(i) - y(i - 1))
          p = (1.0 - k) * pp
          i += 1
        }
      }
      y
    }

  /** Running Goertzel power at normalized frequency `freq`
    * (cycles/sample): the single-bin sliding DFT statistic used for
    * tone/oscillation detection without paying a full FFT. Second-
    * order recurrence `s_i = x_i + c·s_{i-1} − s_{i-2}` with
    * `c = 2·cos(2πf)`; the emitted per-row power
    * `s1² + s2² − c·s1·s2` is the bin magnitude of the prefix ending
    * at row i. IEEE op order is mirrored verbatim by
    * [[graft.functions.KernelOracles.goertzelOracle]].
    */
  def goertzelPower(spark: SparkSession, df: DataFrame, s: Series, src: String,
      out: String, freq: Double): DataFrame = {
    val c = 2.0 * math.cos(2.0 * math.Pi * freq)
    applyKernel(spark, df, s, src, out) { x =>
      val y = new Array[Double](x.length)
      var s1 = 0.0; var s2 = 0.0
      var i = 0
      while (i < x.length) {
        val s0 = x(i) + c * s1 - s2
        s2 = s1; s1 = s0
        y(i) = s1 * s1 + s2 * s2 - c * s1 * s2
        i += 1
      }
      y
    }
  }

  /** Cubic-spline interpolation of missing samples (`method='cubic'`,
    * dialogs.py:49): scipy's not-a-knot cubic B-spline
    * ([[Dsp.notAKnotCubicSpline]], `make_interp_spline(k=3)` — what
    * pandas dispatches to) through the non-NaN knots fills NaN rows;
    * outside the knot range values clamp to the edge knots. Series
    * with fewer than 2 valid samples pass through.
    */
  def interpolateCubic(spark: SparkSession, df: DataFrame, s: Series, src: String,
      out: String): DataFrame =
    applyKernelWithTime(spark, df, s, src, out) { (ts, xs) =>
      val valid = ts.indices.filter(i => !xs(i).isNaN)
      if (valid.length < 2) xs
      else {
        val f = Dsp.notAKnotCubicSpline(valid.map(ts).toArray, valid.map(xs).toArray)
        Array.tabulate(xs.length)(i => if (xs(i).isNaN) f(ts(i)) else xs(i))
      }
    }

  /** C1 quadratic-spline interpolation of missing samples
    * (`method='quadratic'`, dialogs.py:49) — same knot/edge/fallback
    * semantics as [[interpolateCubic]] with [[Dsp.quadraticSpline]]
    * as the evaluator.
    */
  def interpolateQuadratic(spark: SparkSession, df: DataFrame, s: Series, src: String,
      out: String): DataFrame =
    applyKernelWithTime(spark, df, s, src, out) { (ts, xs) =>
      val valid = ts.indices.filter(i => !xs(i).isNaN)
      if (valid.length < 2) xs
      else {
        val f = Dsp.quadraticSpline(valid.map(ts).toArray, valid.map(xs).toArray)
        Array.tabulate(xs.length)(i => if (xs(i).isNaN) f(ts(i)) else xs(i))
      }
    }

  /** [[applyKernel]] variant whose kernel also sees the time axis.
    * All original columns ride along through the per-key scan and the
    * kernel output is appended as `out` — ONE shuffle by series key,
    * no join-back (an earlier join-on-row-identity variant tripled
    * the kernel queries' wall time).
    */
  def applyKernelWithTime(spark: SparkSession, df: DataFrame, s: Series, src: String,
      out: String)(kernel: (Array[Double], Array[Double]) => Array[Double]): DataFrame = {
    val base = if (df.columns.contains(out)) df.drop(out) else df
    val keyExpr =
      if (s.keyCols.isEmpty) lit("")
      else concat_ws(Sep, s.keyCols.map(c => col(c).cast("string")): _*)
    val ridExpr = concat_ws(Sep,
      (s.timeCol +: s.tieCols).map(c => col(c).cast("string")): _*)
    val withAux = base
      .withColumn("__k", keyExpr)
      .withColumn("__rid", ridExpr)
      .withColumn("__t", org.apache.spark.sql.functions.col(s.timeCol).cast("double"))
      .withColumn("__v", coalesce(col(src).cast("double"), lit(Double.NaN)))
    val n = withAux.schema.size
    val (ki, ri, ti, vi) = (n - 4, n - 3, n - 2, n - 1)
    val outSchema = org.apache.spark.sql.types.StructType(
      withAux.schema.fields :+
        org.apache.spark.sql.types.StructField(out, org.apache.spark.sql.types.DoubleType))
    val result = withAux
      .groupByKey((r: org.apache.spark.sql.Row) => r.getString(ki))(
        org.apache.spark.sql.Encoders.STRING)
      .flatMapGroups { (_: String, it: Iterator[org.apache.spark.sql.Row]) =>
        val rows = it.toArray
        java.util.Arrays.sort(rows,
          Ordering.by((r: org.apache.spark.sql.Row) => (r.getDouble(ti), r.getString(ri))))
        val y = kernel(rows.map(_.getDouble(ti)), rows.map(_.getDouble(vi)))
        require(y.length == rows.length, "kernel must preserve length")
        rows.iterator.zip(y.iterator).map { case (r, v) =>
          org.apache.spark.sql.Row.fromSeq(r.toSeq :+ v)
        }
      }(org.apache.spark.sql.Encoders.row(outSchema))
    result.drop("__k", "__rid", "__t", "__v")
  }

  /** Exact Savitzky–Golay including scipy's edge semantics: interior
    * points use the precomputed FIR; the first/last `window/2` points
    * re-fit the polynomial on the shrunken edge window.
    */
  def savgolExact(spark: SparkSession, df: DataFrame, s: Series, src: String,
      out: String, window: Int, polyorder: Int): DataFrame = {
    val coefs = Dsp.savgolCoefficients(window, polyorder)
    val h = window / 2
    // The LS polynomial fit is linear in the samples, so each edge
    // position is a fixed dot product; precomputing the weight rows
    // once (driver-side) lets the DuckDB oracle embed the identical
    // literals and replay the identical fold — bit-exact parity
    // (graft.functions.KernelOracles.savgolExactOracle).
    val headW = Array.tabulate(h)(i =>
      graft.functions.KernelOracles.savgolEdgeWeights(polyorder, i + h + 1, i))
    val tailW = Array.tabulate(h)(j =>
      graft.functions.KernelOracles.savgolEdgeWeights(polyorder, h + j + 1, h))
    applyKernel(spark, df, s, src, out) { x =>
      val n = x.length
      val y = new Array[Double](n)
      var i = 0
      while (i < n) {
        if (i >= h && i < n - h) {
          var acc = 0.0
          var k = 0
          while (k < window) { acc += coefs(k) * x(i - h + k); k += 1 }
          y(i) = acc
        } else if (n >= window) {
          val wv = if (i < h) headW(i) else tailW(n - 1 - i)
          val lo = if (i < h) 0 else i - h
          var acc = 0.0
          var k = 0
          while (k < wv.length) { acc += wv(k) * x(lo + k); k += 1 }
          y(i) = acc
        } else if (n >= polyorder + 1) {
          // series shorter than the window: runtime re-fit on the
          // clipped window (not oracle-covered; none in the test data)
          val lo = math.max(0, i - h); val hi = math.min(n - 1, i + h)
          val ts = (lo to hi).map(_.toDouble).toArray
          val xs = (lo to hi).map(x(_)).toArray
          val deg = math.min(polyorder, ts.length - 1)
          y(i) = Dsp.polyfitAt(ts, xs, deg, i.toDouble)
        } else y(i) = x(i)
        i += 1
      }
      y
    }
  }
}
