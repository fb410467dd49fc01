package graft

import org.apache.spark.SparkContext
import org.apache.spark.sql.Dataset

/** Owner-scoped cache lifecycle for lazy query builders.
  *
  * Operator builders (Similarity, Dedup, Graphs, …) persist
  * intermediates that are probed more than once, but they return an
  * UNEXECUTED DataFrame — the persist must stay alive until the
  * caller's action completes, so the builder itself can never
  * unpersist. Before this existed, cleanup leaned on Bench/Verify's
  * blanket "unpersist everything" between queries, which a library
  * caller going through api.Vectors/api.Corpus doesn't have: every
  * facade call accumulated cached relations for the session.
  *
  * The contract:
  *   - builders register each persisted relation with the innermost
  *     active scope via [[persist]] (persist + track) or [[track]]
  *     (already-persisted relations, e.g. the surviving label relation
  *     of an iterative loop);
  *   - the ACTION-OWNING caller wraps build + action in [[run]]; at
  *     exit every tracked dataset is unpersisted through the catalog
  *     (so CacheManager entries are removed, not just RDD blocks), and
  *     any persistent RDD that appeared during the scope but was never
  *     tracked is swept by id — in practice only `localCheckpoint`
  *     lineage cuts, which have no catalog entry to clean.
  *
  * Outside any scope, [[persist]] degrades to a plain `persist()` —
  * ad-hoc callers keep today's behavior and own the cleanup.
  *
  * The sweep is SCOPED, not global: RDDs already persistent at scope
  * entry (a user's own cached tables) are untouched — the difference
  * between this and the harness's unpersist-all.
  */
object CacheScope {

  private final class Frame(val baseline: Set[Int]) {
    val tracked = scala.collection.mutable.ArrayBuffer.empty[Dataset[_]]
  }

  // Thread-local so concurrent sessions/test suites can't drain each
  // other's scopes; all graft builders construct plans on the calling
  // thread, so the innermost frame is always the right owner.
  private val frames = new ThreadLocal[List[Frame]] {
    override def initialValue: List[Frame] = Nil
  }

  /** Persist `ds` (default storage level) and register it with the
    * innermost active scope, if any.
    */
  def persist[T](ds: Dataset[T]): Dataset[T] = track(ds.persist())

  /** Register an already-persisted dataset with the innermost active
    * scope (no-op outside a scope).
    */
  def track[T](ds: Dataset[T]): Dataset[T] = {
    frames.get() match {
      case f :: _ => f.tracked += ds
      case Nil    => ()
    }
    ds
  }

  /** Diagnostics from the most recent [[run]] on this thread: how many
    * persistent RDDs appeared during the scope without being tracked,
    * split by whether they were localCheckpoint lineage cuts (expected
    * — no catalog entry exists to unpersist through) or untracked
    * dataset persists (a lifecycle bug: the catalog entry goes stale).
    * The no-leaked-cache suite guard asserts the latter is zero.
    */
  final case class SweepDiag(sweptCheckpoints: Int, sweptUntracked: Int)
  private val lastDiag = new ThreadLocal[SweepDiag] {
    override def initialValue: SweepDiag = SweepDiag(0, 0)
  }
  def lastSweep: SweepDiag = lastDiag.get()

  /** Run `body` in a fresh cache scope and release everything the
    * scope created: tracked datasets unpersist through the catalog;
    * scope-new untracked RDDs (localCheckpoints) unpersist by id.
    * Safe to nest — an inner scope only releases its own relations.
    * After exit the returned value must not trigger recomputation of
    * scope-cached lineage (checkpoint data is gone), so materialize
    * inside the scope.
    */
  def run[A](sc: SparkContext)(body: => A): A = {
    val frame = new Frame(sc.getPersistentRDDs.keySet.toSet)
    frames.set(frame :: frames.get())
    try body
    finally {
      frames.set(frames.get().tail)
      frame.tracked.foreach { ds =>
        try ds.unpersist(blocking = false) catch { case _: Throwable => () }
      }
      val leftovers = sc.getPersistentRDDs
        .filter { case (id, _) => !frame.baseline.contains(id) }.values.toSeq
      // isCheckpointed is the public probe (covers eager
      // localCheckpoint, the only checkpoint form graft uses)
      lastDiag.set(SweepDiag(
        leftovers.count(_.isCheckpointed),
        leftovers.count(!_.isCheckpointed)))
      leftovers.foreach { r =>
        try r.unpersist(blocking = false) catch { case _: Throwable => () }
      }
    }
  }

  /** `df.scopedPersist()` chaining syntax for builder pipelines. */
  implicit final class ScopedDataset[T](private val ds: Dataset[T]) extends AnyVal {
    def scopedPersist(): Dataset[T] = CacheScope.persist(ds)
  }
}
