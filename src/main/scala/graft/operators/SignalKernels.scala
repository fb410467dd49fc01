package graft.operators

import graft.functions.Dsp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Per-series sequential kernels that are NOT window-expressible —
  * IIR recurrences need a forward+backward scan over the whole series
  * (reference `butter_lowpass`/`butter_bandpass`,
  * filter_engine.py:50-58, 115-134, zero-phase `filtfilt`).
  *
  * Spark shape: `groupByKey(seriesKey).flatMapGroups` — the idiomatic
  * distributed form for per-key sequential scans. Parallelism is
  * across series (millions of keys at 100 TB), each series' samples
  * are gathered and scanned in one task. The per-series memory bound
  * (a trial is minutes–hours at ≤ kHz ⇒ ≤ a few 1e7 doubles) is the
  * documented domain bound, same as the reference's in-memory frame.
  */
object SignalKernels {

  final case class SeriesPoint(user_id: Long, event_id: Long, tn: Double, value: Double)
  final case class FilteredPoint(user_id: Long, event_id: Long, tn: Double, filtered: Double)

  private def sortedSeries(it: Iterator[SeriesPoint]): Array[SeriesPoint] = {
    val pts = it.toArray
    java.util.Arrays.sort(pts, Ordering.by((p: SeriesPoint) => (p.tn, p.event_id)))
    pts
  }

  /** Zero-phase Butterworth low-pass, normalized cutoff `wn` ∈ (0,1)
    * (fraction of Nyquist), matching the reference's
    * `butter_lowpass` semantics with scipy-style odd-reflection
    * padding.
    */
  def butterLowpass(spark: SparkSession, series: DataFrame, order: Int, wn: Double): Dataset[FilteredPoint] = {
    import spark.implicits._
    val sos = Dsp.butterLowpassSos(order, wn)
    series.selectExpr("user_id", "event_id", "tn", "value").as[SeriesPoint]
      .groupByKey(_.user_id)
      .flatMapGroups { (_, it) =>
        val pts = sortedSeries(it)
        val y = Dsp.filtfilt(sos, pts.map(_.value))
        pts.iterator.zip(y.iterator).map { case (p, v) =>
          FilteredPoint(p.user_id, p.event_id, p.tn, v)
        }
      }
  }

  /** Zero-phase band-pass as the reference's fallback composition
    * (filter_engine.py:125-134): detrend then low-pass the high cut,
    * minus low-pass of the low cut (subtracting the slow component).
    */
  def butterBandpass(spark: SparkSession, series: DataFrame, order: Int,
      wnLow: Double, wnHigh: Double): Dataset[FilteredPoint] = {
    import spark.implicits._
    val sosHigh = Dsp.butterLowpassSos(order, wnHigh)
    val sosLow = Dsp.butterLowpassSos(order, wnLow)
    series.selectExpr("user_id", "event_id", "tn", "value").as[SeriesPoint]
      .groupByKey(_.user_id)
      .flatMapGroups { (_, it) =>
        val pts = sortedSeries(it)
        val x = pts.map(_.value)
        val lo = Dsp.filtfilt(sosHigh, x)
        val slow = Dsp.filtfilt(sosLow, x)
        pts.iterator.zipWithIndex.map { case (p, i) =>
          FilteredPoint(p.user_id, p.event_id, p.tn, lo(i) - slow(i))
        }
      }
  }

  /** Exact Savitzky–Golay including scipy's edge semantics: interior
    * points use the precomputed FIR; the first/last `window/2` points
    * re-fit the polynomial on the shrunken edge window
    * (filter_engine.py:94-113 fallback path).
    */
  def savgolExact(spark: SparkSession, series: DataFrame, window: Int, polyorder: Int): Dataset[FilteredPoint] = {
    import spark.implicits._
    val coefs = Dsp.savgolCoefficients(window, polyorder)
    val h = window / 2
    series.selectExpr("user_id", "event_id", "tn", "value").as[SeriesPoint]
      .groupByKey(_.user_id)
      .flatMapGroups { (_, it) =>
        val pts = sortedSeries(it)
        val x = pts.map(_.value)
        val n = x.length
        val y = new Array[Double](n)
        var i = 0
        while (i < n) {
          if (i >= h && i < n - h) {
            var acc = 0.0
            var k = 0
            while (k < window) { acc += coefs(k) * x(i - h + k); k += 1 }
            y(i) = acc
          } else if (n >= polyorder + 1) {
            // shrunken edge window: fit on available neighbors
            val lo = math.max(0, i - h); val hi = math.min(n - 1, i + h)
            val ts = (lo to hi).map(_.toDouble).toArray
            val xs = (lo to hi).map(x(_)).toArray
            val deg = math.min(polyorder, ts.length - 1)
            y(i) = Dsp.polyfitAt(ts, xs, deg, i.toDouble)
          } else y(i) = x(i)
          i += 1
        }
        pts.iterator.zipWithIndex.map { case (p, j) =>
          FilteredPoint(p.user_id, p.event_id, p.tn, y(j))
        }
      }
  }
}
