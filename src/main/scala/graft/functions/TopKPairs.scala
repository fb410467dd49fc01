package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** Bounded "k smallest (major, minor) pairs" typed aggregate — the
  * order-statistic cousin of [[KmvSketchAgg]].
  *
  * State is the k lexicographically-smallest `(major, minor)` long
  * pairs seen so far, kept sorted — O(k) bytes regardless of group
  * size, so the map-side partial ships a bounded buffer per group
  * instead of sorting the whole group on one reducer (the
  * `row_number().over(partitionBy(lowCardKey))` anti-pattern this
  * replaces: a per-stratum top-k is an AGGREGATE, not a window).
  * `reduce` inserts in order; `merge` is a sorted merge capped at k;
  * both keep duplicates, exactly like `row_number` would count them.
  * The final state is the global k minima under ANY partitioning or
  * reduction order, so the result is deterministic and
  * oracle-checkable against a sequential `row_number` evaluation.
  *
  * Preference-order (b) from the build plan — a custom typed
  * aggregate — because no built-in composition keeps per-group state
  * bounded: `collect_list` + `sort_array` + `slice` buffers every
  * row of the stratum.
  */
class TopKPairsAgg(k: Int) extends Aggregator[(Long, Long), Array[(Long, Long)], Array[(Long, Long)]] {

  private def lt(a: (Long, Long), b: (Long, Long)): Boolean =
    a._1 < b._1 || (a._1 == b._1 && a._2 < b._2)

  override def zero: Array[(Long, Long)] = Array.empty

  override def reduce(b: Array[(Long, Long)], v: (Long, Long)): Array[(Long, Long)] = {
    if (b.length == k && !lt(v, b(k - 1))) return b
    var ins = 0
    while (ins < b.length && !lt(v, b(ins))) ins += 1
    val n = math.min(b.length + 1, k)
    val out = new Array[(Long, Long)](n)
    System.arraycopy(b, 0, out, 0, ins)
    out(ins) = v
    System.arraycopy(b, ins, out, ins + 1, n - ins - 1)
    out
  }

  override def merge(a: Array[(Long, Long)], b: Array[(Long, Long)]): Array[(Long, Long)] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    val out = new Array[(Long, Long)](math.min(a.length + b.length, k))
    var i = 0; var j = 0; var n = 0
    while (n < out.length) {
      out(n) =
        if (j >= b.length || (i < a.length && !lt(b(j), a(i)))) { val x = a(i); i += 1; x }
        else { val x = b(j); j += 1; x }
      n += 1
    }
    out
  }

  override def finish(reduction: Array[(Long, Long)]): Array[(Long, Long)] = reduction

  override def bufferEncoder: Encoder[Array[(Long, Long)]] =
    ExpressionEncoder[Array[(Long, Long)]]()
  override def outputEncoder: Encoder[Array[(Long, Long)]] =
    ExpressionEncoder[Array[(Long, Long)]]()
}
