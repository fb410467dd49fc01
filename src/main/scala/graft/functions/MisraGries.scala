package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** Misra-Gries heavy-hitters summary: ≤ k counters + the exact item
  * total, the classic frequent-items sketch (Misra & Gries 1982;
  * mergeability per Agarwal et al., PODS'12).
  */
final case class MgState(counters: Map[String, Long], n: Long)

/** Misra-Gries frequent-items sketch as a typed Spark aggregate.
  *
  * State is ≤ k (item, count) counters plus the exact element total —
  * bounded bytes per group regardless of cardinality, so map-side
  * partial aggregation ships k counters instead of the full
  * vocabulary. `reduce` is the textbook step (increment / install /
  * decrement-all); `merge` sums counter maps then subtracts the
  * (k+1)-st largest count from every counter (the PODS'12 merge),
  * preserving the deficit bound `true − n/(k+1) ≤ est ≤ true`.
  *
  * The SUMMARY is order-dependent (which below-threshold stragglers
  * hold counters depends on partitioning), so it is never emitted as
  * a result. Its guarantee IS order-independent: any item with true
  * count > n/(k+1) must hold a counter in the final merged state.
  * Callers therefore use it as the bounded CANDIDATE stage of a
  * two-pass exact query (sketch → exact recount of ≤ k candidates →
  * threshold) — deterministic output, sketch-bounded shuffles; the
  * same candidates-then-verify shape as the LSH dedup pipeline.
  *
  * Preference-order (b) — custom typed aggregate — because no
  * built-in composition keeps per-group state bounded: `groupBy(item)`
  * materializes the full vocabulary before any top-k prune.
  */
class MisraGriesAgg(k: Int) extends Aggregator[String, MgState, MgState] {

  override def zero: MgState = MgState(Map.empty, 0L)

  override def reduce(b: MgState, w: String): MgState = {
    val c = b.counters
    c.get(w) match {
      case Some(v) => MgState(c.updated(w, v + 1), b.n + 1)
      case None if c.size < k => MgState(c.updated(w, 1L), b.n + 1)
      case None =>
        // decrement-all; evict zeros (the new item's +1 cancels too)
        val dec = c.view.mapValues(_ - 1).filter(_._2 > 0).toMap
        MgState(dec, b.n + 1)
    }
  }

  override def merge(a: MgState, b: MgState): MgState = {
    if (a.counters.isEmpty) return MgState(b.counters, a.n + b.n)
    if (b.counters.isEmpty) return MgState(a.counters, a.n + b.n)
    val summed = b.counters.foldLeft(a.counters) { case (acc, (w, v)) =>
      acc.updated(w, acc.getOrElse(w, 0L) + v)
    }
    val kept =
      if (summed.size <= k) summed
      else {
        // subtract the (k+1)-st largest count from all, keep positives
        val cut = summed.valuesIterator.toArray.sortBy(-_).apply(k)
        summed.view.mapValues(_ - cut).filter(_._2 > 0).toMap
      }
    MgState(kept, a.n + b.n)
  }

  override def finish(reduction: MgState): MgState = reduction

  override def bufferEncoder: Encoder[MgState] = ExpressionEncoder[MgState]()
  override def outputEncoder: Encoder[MgState] = ExpressionEncoder[MgState]()
}
