package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Backward as-of join as a FIRST-CLASS physical operator — the full
  * custom-operator tier (SURVEY §4.2 tier c): logical node →
  * SparkStrategy → SparkPlan, installed through
  * `spark.experimental.extraStrategies`.
  *
  * Semantics: for each probe (left) row, attach the LATEST sample
  * (right) row of the same key with `sample.time <= probe.time`
  * (ties among equal sample times resolved by the trailing
  * `rightTies` ordering — last wins), or nulls when no sample
  * precedes. This is the reference's nearest-previous-value lookup
  * (SURVEY §2.6) in operator form; DuckDB's native `ASOF JOIN` is the
  * same operation, so oracle parity is direct.
  *
  * Scale shape: both sides hash-cluster on the key and sort
  * per-partition — the same two exchanges a sort-merge join would
  * need, declared via `requiredChildDistribution` /
  * `requiredChildOrdering` so EnsureRequirements plans (and AQE
  * tunes) them. Execution is then ONE streaming merge pass per
  * partition: O(|probes| + |samples|), one buffered candidate row of
  * state, no window function, no union, no row expansion. Contrast
  * the union-trick form ([[graft.operators.Resample.asofBackward]]),
  * which pays a union plus a running `last(ignoreNulls)` window over
  * the combined relation — same asymptotics but ~2× the sorted bytes
  * and a window buffer; the dedicated exec is the shape a 100 TB
  * backfill wants.
  */
case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    rightTies: Seq[Expression]) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override lazy val resolved: Boolean = childrenResolved
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, ties) =>
      AsOfJoinExec(lk, rk, lt, rt, ties, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression, rightTies: Seq[Expression],
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    ((rightKeys :+ rightTime) ++ rightTies).map(SortOrder(_, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending))

  override def outputPartitioning = left.outputPartitioning

  protected override def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val keyTypes = leftKeys.map(_.dataType)
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val lTimeExpr = leftTime
    val rTimeExpr = rightTime
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeyExprs, lOut)
      val rKeyProj = UnsafeProjection.create(rKeyExprs, rOut)
      val lTimeProj = UnsafeProjection.create(Seq(lTimeExpr), lOut)
      val rTimeProj = UnsafeProjection.create(Seq(rTimeExpr), rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      // bind against the NULLABLE right schema: the null-filled row
      // for probe rows with no preceding sample must project as nulls,
      // not as zero-value primitives
      val resultProj =
        UnsafeProjection.create(outAttrs, lOut ++ rOut.map(_.withNullability(true)))
      val nullRight = new GenericInternalRow(rOut.size)
      val joined = new JoinedRow
      val rBuf = rIter.buffered
      // ONE row of merge state: the latest at-or-before sample of the
      // current key group (rows arrive key-then-time sorted)
      var candidate: InternalRow = null
      var candidateKey: UnsafeRow = null
      lIter.map { lrow =>
        val lk = lKeyProj(lrow)
        if (candidateKey != null && keyOrd.compare(candidateKey, lk) != 0) {
          candidate = null; candidateKey = null // new key group
        }
        val ltRow = lTimeProj(lrow)
        val ltNull = ltRow.isNullAt(0)
        val lt = if (ltNull) 0.0 else ltRow.getDouble(0)
        var scanning = true
        while (scanning && rBuf.hasNext) {
          val cmp = keyOrd.compare(rKeyProj(rBuf.head), lk)
          if (cmp < 0) rBuf.next() // key already passed; never matches again
          else if (cmp > 0) scanning = false
          else {
            val rtRow = rTimeProj(rBuf.head)
            if (rtRow.isNullAt(0)) rBuf.next() // unusable sample time
            else if (!ltNull && rtRow.getDouble(0) <= lt) {
              candidate = rBuf.next().copy()
              if (candidateKey == null) candidateKey = lk.copy()
            } else scanning = false
          }
        }
        resultProj(
          if (candidate != null) joined(lrow, candidate)
          else joined(lrow, nullRight))
      }
    }
  }
}

/** Public entry: `AsOfJoin.backward(probes, samples, ...)`. Keys and
  * time are given per side by NAME (rename upstream when the sides
  * share names — the operator's output concatenates both schemas).
  * The probe side's time column must be double seconds (cast
  * upstream), matching the engine's series axis.
  */
object AsOfJoin {
  def backward(probes: DataFrame, samples: DataFrame,
      leftKeys: Seq[String], rightKeys: Seq[String],
      leftTime: String, rightTime: String,
      rightTies: Seq[String] = Nil): DataFrame = {
    val spark = probes.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    val lp = probes.queryExecution.analyzed
    val rp = samples.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"no column '$n' in ${p.output.map(_.name)}"))
    // the exec reads times with getDouble: a raw long epoch column
    // would silently reinterpret bits — fail fast instead
    Seq(attr(lp, leftTime), attr(rp, rightTime)).foreach { t =>
      require(t.dataType == org.apache.spark.sql.types.DoubleType,
        s"as-of time column '${t.name}' must be double seconds, got ${t.dataType} — cast upstream")
    }
    org.apache.spark.sql.graft.bridge.ofRows(spark,
      AsOfJoinPlan(lp, rp,
        leftKeys.map(attr(lp, _)), rightKeys.map(attr(rp, _)),
        attr(lp, leftTime), attr(rp, rightTime), rightTies.map(attr(rp, _))))
  }
}
