package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** K-Minimum-Values distinct-count sketch as a typed Spark aggregate.
  *
  * State is the k smallest DISTINCT 32-bit hash values seen, kept as
  * a sorted long array — a few hundred bytes regardless of input
  * cardinality, so map-side partial aggregation ships a bounded
  * buffer per group instead of the full value set. `reduce`/`merge`
  * are set operations (insert / sorted-merge, dedup, cap k), so the
  * final state is the set of k global minima — identical under ANY
  * partitioning or reduction order, which is what makes the sketch
  * oracle-checkable bit-for-bit against a sequential SQL evaluation.
  *
  * Estimator (the standard KMV unbiased form): with the k-th smallest
  * of n >> k uniform hashes at H, the distinct count is
  * ~ (k-1) * 2^32 / H; when fewer than k distinct hashes exist the
  * sketch IS the value set and the count is exact.
  *
  * This is preference-order (b) from the build plan — a custom typed
  * aggregate — because no composition of built-in operators keeps the
  * per-group state bounded: `collect_set` + `slice` would shuffle
  * every distinct hash.
  */
class KmvSketchAgg(k: Int) extends Aggregator[Long, Array[Long], Array[Long]] {

  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(b: Array[Long], h: Long): Array[Long] = {
    val pos = java.util.Arrays.binarySearch(b, h)
    if (pos >= 0) b // already present
    else {
      val ins = -pos - 1
      if (b.length < k) {
        val out = new Array[Long](b.length + 1)
        System.arraycopy(b, 0, out, 0, ins)
        out(ins) = h
        System.arraycopy(b, ins, out, ins + 1, b.length - ins)
        out
      } else if (ins < k) {
        val out = new Array[Long](k)
        System.arraycopy(b, 0, out, 0, ins)
        out(ins) = h
        System.arraycopy(b, ins, out, ins + 1, k - ins - 1)
        out
      } else b // larger than the current k minima
    }
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    val out = new Array[Long](math.min(a.length + b.length, k))
    var i = 0; var j = 0; var n = 0
    while (n < out.length && (i < a.length || j < b.length)) {
      val v =
        if (j >= b.length || (i < a.length && a(i) <= b(j))) { val x = a(i); i += 1; x }
        else { val x = b(j); j += 1; x }
      if (n == 0 || out(n - 1) != v) { out(n) = v; n += 1 }
    }
    if (n == out.length) out else java.util.Arrays.copyOf(out, n)
  }

  override def finish(reduction: Array[Long]): Array[Long] = reduction

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}
