package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator Catalyst integration of the greedy cooldown dedup —
  * the SURVEY §7.3 tier (c) route (custom LogicalPlan + Strategy +
  * physical node), used where composition genuinely can't express the
  * execution we want: the array-fold formulation
  * (`Timeseries.cooldownDedup`) materializes each key's full event list
  * in an aggregation buffer, so one pathologically hot key holds its
  * whole history in memory. This node instead REQUIRES clustering by
  * key and (key, ts, id) ordering from the planner — EnsureRequirements
  * inserts exactly one hash exchange + sort — and then streams each
  * partition with O(1) state (current key, last kept timestamp),
  * emitting kept rows with all their columns. Same greedy semantics,
  * bounded memory at any key skew.
  */
case class CooldownDedup(groupKeys: Seq[Attribute], ts: Attribute,
    rowId: Attribute, cooldownUs: Long, child: LogicalPlan)
    extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(c: LogicalPlan): CooldownDedup =
    copy(child = c)
}

/** Filter pushdown THROUGH the custom node — the piece Catalyst cannot
  * infer for an opaque operator: a predicate referencing only the group
  * keys selects or drops WHOLE keys, and per-key greedy dedup commutes
  * with whole-key selection, so such conjuncts move below the node
  * (reaching the scan as PushedFilters); conjuncts touching other
  * columns must stay above — filtering an event before the fold would
  * change which later events are suppressed. Registered via
  * `injectOptimizerRule` ([[GraftExtensions]]) and
  * `experimental.extraOptimizations` (plain sessions).
  */
object PushFilterThroughCooldown
    extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan]
    with org.apache.spark.sql.catalyst.expressions.PredicateHelper {
  import org.apache.spark.sql.catalyst.expressions.{And, AttributeSet}
  import org.apache.spark.sql.catalyst.plans.logical.Filter

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, cd: CooldownDedup) =>
      val keyAttrs = AttributeSet(cd.groupKeys)
      val (push, keep) = splitConjunctivePredicates(cond)
        .partition(p => p.references.nonEmpty &&
          p.references.subsetOf(keyAttrs) && p.deterministic)
      if (push.isEmpty) f
      else {
        val below = cd.copy(child = Filter(push.reduce(And), cd.child))
        keep.reduceOption(And).map(Filter(_, below)).getOrElse(below)
      }
  }
}

/** Plans [[CooldownDedup]] to [[CooldownDedupExec]]; injected via
  * [[GraftExtensions]] (`injectPlannerStrategy`) or added idempotently
  * to `spark.experimental.extraStrategies` by the API wrapper.
  */
object CooldownStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case CooldownDedup(keys, ts, rid, cd, child) =>
      CooldownDedupExec(keys, ts, rid, cd, planLater(child)) :: Nil
    case _ => Nil
  }
}

// fields are Expression, not Attribute: Spark's preparation rules
// (AQE, EnsureRequirements) transformExpressions over the node and may
// rewrite references to BoundReference — Attribute-typed fields would
// ClassCastException on makeCopy
case class CooldownDedupExec(groupKeys: Seq[Expression], ts: Expression,
    rowId: Expression, cooldownUs: Long, child: SparkPlan)
    extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output

  // all rows of a key in one partition, sorted by (key, ts, id): the
  // greedy scan is then a single streaming pass
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(groupKeys) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(groupKeys.map(SortOrder(_, Ascending)) ++
      Seq(SortOrder(ts, Ascending), SortOrder(rowId, Ascending)))
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def doExecute(): RDD[InternalRow] = {
    val keyExprs = groupKeys
    val tsExpr = ts
    val childOutput = child.output
    val cd = cooldownUs
    child.execute().mapPartitions({ it =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val tsBound = BindReferences.bindReference(tsExpr, childOutput)
      var curKey: UnsafeRow = null
      var lastKept = 0L
      it.filter { row =>
        // null event-times are suppressed (the fold-based cooldownDedup's
        // null comparisons drop them too); checked before any key-state
        // update so a leading null row can't initialize the key
        val tv = tsBound.eval(row)
        if (tv == null) false else {
        val k = keyProj(row)
        // TimestampType is micros-as-long in InternalRow
        val t = tv.asInstanceOf[Long]
        if (curKey == null || !k.equals(curKey)) {
          curKey = k.copy() // keyProj reuses its buffer
          lastKept = t
          true
        } else if (t - lastKept >= cd) {
          lastKept = t
          true
        } else false
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(c: SparkPlan): CooldownDedupExec =
    copy(child = c)
}
