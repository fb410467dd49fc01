package graft

import org.scalatest.funsuite.AnyFunSuite

/** The engine's central float policy claims every declared query is
  * REDUCTION-ORDER-INDEPENDENT (integer quantization before sums,
  * exact dyadic percentiles, shared IEEE trees over exact inputs).
  * This spec tests the claim directly: running a query under
  * different shuffle-partition counts changes Spark's partial-
  * aggregation merge order, and the collected results must be
  * IDENTICAL — not approximately equal. These are the queries whose
  * r01/r02 cousins flaked before the quantization work.
  */
class DeterminismSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private val sensitive = Seq(
    "q30_sessionize",       // micro-quantized session sums
    "q31_spike_islands",    // integer-moment threshold comparison
    "q61_episode_overlay",  // min_by mode key
    "q71_seasonal_fold",    // per-season stats
    "q78_mixture_report",   // quality micro-sums + share window
    "q86_hist_quantile",    // binned percentile crossing
    "q95_surprisal_bits",   // integer floor-log2 bits
    "q232_dsir_weights",    // integer floor-log2 LLR ranking
    "q96_mixture_sample",   // fixed-point sqrt weights
    "q98_autocorr",         // integer-moment Pearson
    "q101_robust_zscore",   // dyadic median/MAD
    "q103_cusum",           // integer cumsum/running-min
    "q105_kmeans_train",    // integer Lloyd iterations
    "q107_quality_rank",    // percent_rank over float-equal quality
    "q108_interarrival",    // dyadic p50 + interpolated p90 on milli ints
    "q109_length_hist")     // integer floor-log2 buckets

  private def collectWith(name: String, parts: Int): Seq[Seq[Any]] = {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    spark.conf.set(key, parts.toString)
    try SparkEntry.queries(name)(spark, sfDir).collect().toSeq.map(_.toSeq)
    finally spark.conf.set(key, prev)
  }

  sensitive.foreach { name =>
    test(s"$name is bit-identical under different reduction orders") {
      val a = collectWith(name, 2)
      val b = collectWith(name, 7)
      assert(a.length == b.length, s"row counts ${a.length} vs ${b.length}")
      a.zip(b).zipWithIndex.foreach { case ((x, y), i) =>
        assert(x == y, s"row $i diverged:\n  parts=2: $x\n  parts=7: $y")
      }
    }
  }
}
