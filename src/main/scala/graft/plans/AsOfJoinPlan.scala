package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.RowOrdering
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graftbridge.PlanBridge

/** The whole-operator extension stack (SURVEY.md §2 preference order (c)):
  * a custom logical node + planner strategy + physical operator for the
  * backward as-of join, registered through `SparkSessionExtensions`
  * (`injectPlannerStrategy` in [[graft.GraftExtensions]]).
  *
  * Semantics: for each left row, the most recent right row with the same
  * key and `rightTime <= leftTime` (ties visible), optionally within
  * `toleranceUs` microseconds; unmatched left rows carry nulls (left-outer).
  *
  * Physical shape — the plan you want at 100 TB:
  *  - `requiredChildDistribution` clusters BOTH sides on the key, so
  *    EnsureRequirements inserts exactly one co-partitioning exchange per
  *    side (same cost as any join on the key, and satisfied for free if a
  *    prior stage already partitioned on it);
  *  - `requiredChildOrdering` asks for (key, time) sort within partitions,
  *    so the merge is a single forward pass — no per-row candidate range,
  *    no window buffer, O(1) state (one candidate row) per key group.
  * The union+window form ([[graft.operators.AsOfJoin.asofBackward]]) stays
  * as the pure-DataFrame expression of the same semantics; `AsOfExecSpec`
  * asserts row-for-row equivalence between the two on real data.
  *
  * Measured honestly: at sf0.1 on local[32] the codegen'd union+window form
  * is ~2x faster (0.37 s vs 0.68 s) — this exec's merge is interpreted
  * row-at-a-time (doExecute, no doProduce/doConsume), while window exec is
  * whole-stage generated. The exec's advantages are structural: O(1) state
  * per key group vs the window's running buffer, the right side is never
  * unioned into the left's shuffle, and a tolerance bound is native. Codegen
  * for the merge is the known next step if it ever dominates a profile.
  */
case class AsOfJoinNode(
    left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    rightValues: Seq[Attribute], toleranceUs: Option[Long]) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ rightValues.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, rk, lt, rt, rv, tol) =>
      AsOfJoinExec(lk, rk, lt, rt, rv, tol, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    rightValues: Seq[Attribute], toleranceUs: Option[Long],
    left: SparkPlan, right: SparkPlan) extends SparkPlan with BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ rightValues.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending))

  protected override def doExecute(): RDD[InternalRow] = {
    val leftOut = left.output
    val rightOut = right.output
    val keyTypes = leftKeys.map(_.dataType)
    val tolUs = toleranceUs
    val rightVals = rightValues
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // Per-partition single forward merge over the two (key, time)-sorted
      // streams. State: one buffered right row (read-ahead) + one candidate
      // (last right row visible to the current left key) — O(1) memory.
      val lKeyProj = UnsafeProjection.create(leftKeys, leftOut)
      val rKeyProj = UnsafeProjection.create(rightKeys, rightOut)
      val lTimeProj = UnsafeProjection.create(Seq(leftTime), leftOut)
      val rTimeProj = UnsafeProjection.create(Seq(rightTime), rightOut)
      val valProj = UnsafeProjection.create(rightVals, rightOut)
      val outProj = UnsafeProjection.create(output, leftOut ++ rightVals)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val nullVals = new GenericInternalRow(rightVals.length)
      val joined = new JoinedRow

      var pending: InternalRow = null // read-ahead right row (copied)
      var candRow: InternalRow = null // latest visible right row for candKey
      var candKey: UnsafeRow = null
      var candTime: Long = 0L

      def nextRight(): InternalRow =
        if (pending != null) { val r = pending; pending = null; r }
        else if (rIter.hasNext) rIter.next().copy()
        else null

      lIter.map { lRow =>
        val lKey = lKeyProj(lRow)
        val lt = lTimeProj(lRow)
        val lTimeVal = if (lt.isNullAt(0)) Long.MinValue else lt.getLong(0)
        // SQL equi-key semantics: a null key never equals anything — a
        // left row with a null key cannot match, and null-key right rows
        // are discarded (the natural row ordering would otherwise compare
        // null == null, which is a sort order, not a join predicate).
        var advance = lTimeVal != Long.MinValue && !lKey.anyNull
        while (advance) {
          val r = nextRight()
          if (r == null) advance = false
          else {
            val rKey = rKeyProj(r)
            val c = keyOrd.compare(rKey, lKey)
            if (c < 0 || rKey.anyNull) () // behind the left key, or null key: discard
            else if (c > 0) { pending = r; advance = false }
            else {
              val rt = rTimeProj(r)
              if (rt.isNullAt(0)) () // null time never matches
              else if (rt.getLong(0) <= lTimeVal) {
                candRow = r; candKey = rKey.copy(); candTime = rt.getLong(0)
              } else { pending = r; advance = false }
            }
          }
        }
        val matched = candRow != null && !lKey.anyNull &&
          keyOrd.compare(candKey, lKey) == 0 &&
          lTimeVal != Long.MinValue &&
          tolUs.forall(t => candTime >= lTimeVal - t)
        outProj(joined(lRow, if (matched) valProj(candRow) else nullVals))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Column-API builder: resolves names against the analyzed child plans and
  * wraps the node back into a DataFrame. Right value columns must not
  * collide with left column names (rename on the right side first). */
object AsOfJoinPlan {
  def asofExec(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTimeCol: String, rightTimeCol: String, valueCols: Seq[String],
      toleranceUs: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.Alias
    import org.apache.spark.sql.catalyst.plans.logical.Project
    val lp = left.queryExecution.analyzed
    // Re-alias every right column under a FRESH exprId. When both inputs
    // descend from the same scan (the common events self-as-of), the
    // re-analysis DeduplicateRelations pass re-instances the right
    // subtree's attribute ids — it can rewrite the subtree but not this
    // node's key/time expressions, which would still name the old ids (or
    // worse, ids now owned by the left side). With the alias layer, the
    // node references only the alias ids, which dedup preserves while
    // remapping everything beneath them.
    val rp0 = right.queryExecution.analyzed
    val rp: LogicalPlan = Project(rp0.output.map(a => Alias(a, a.name)()), rp0)
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(
          s"asofExec: no column '$n' in [${p.output.map(_.name).mkString(", ")}]"))
    val clash = valueCols.toSet.intersect(lp.output.map(_.name).toSet)
    require(clash.isEmpty, s"asofExec: value columns collide with left side: $clash")
    // The exec reads event times through UnsafeRow.getLong — anything not
    // long-backed (DateType stores an int; a pre-1970 date would read as a
    // huge positive long) must be rejected here, at analysis time.
    Seq(attr(lp, leftTimeCol), attr(rp, rightTimeCol)).foreach { a =>
      require(a.dataType == org.apache.spark.sql.types.TimestampType ||
        a.dataType == org.apache.spark.sql.types.LongType,
        s"asofExec: time column '${a.name}' must be TIMESTAMP or BIGINT, got ${a.dataType}")
    }
    PlanBridge.ofRows(left.sparkSession,
      AsOfJoinNode(lp, rp,
        keys.map(attr(lp, _)), keys.map(attr(rp, _)),
        attr(lp, leftTimeCol), attr(rp, rightTimeCol),
        valueCols.map(attr(rp, _)), toleranceUs))
  }
}
