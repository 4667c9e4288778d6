package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.LongType

/** The as-of join as a FIRST-CLASS operator — custom `LogicalPlan` +
  * `SparkStrategy` + physical `SparkPlan` (the (c)-tier extension
  * path, used only here because composition genuinely can't express
  * the plan): `graft.ext.AsOfJoin.asOfJoin` already delivers as-of
  * semantics by union + window carry-forward, but that shape must
  * materialize L+R rows through one window; the native operator is
  * the plan a warehouse engine runs — co-partition both sides on the
  * key (`ClusteredDistribution`, so EnsureRequirements inserts/reuses
  * hash exchanges), sort each side by (key, ts)
  * (`requiredChildOrdering` — the sorts ride the exchange), then ONE
  * STREAMING MERGE per partition: a single right-side lookahead row
  * plus one buffered "latest right ≤ current left ts" row per key —
  * O(1) state, no row buffered twice, no window machinery. Each left
  * row emits exactly once (left-outer: misses join a null right).
  *
  * Both key and ts must be non-null LONG attributes (the engine's
  * canonical id/µs types); null key or ts left rows emit as misses,
  * null right rows never match. Output ordering (key, ts) is
  * preserved and advertised, so a downstream window over the same key
  * plans with zero additional exchanges.
  */
case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
    leftKey: Attribute, rightKey: Attribute,
    leftTs: Attribute, rightTs: Attribute) extends BinaryNode {
  require(Seq(leftKey, rightKey, leftTs, rightTs).forall(_.dataType == LongType),
    "asOfNative requires LONG key and ts columns on both sides")
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      l: LogicalPlan, r: LogicalPlan): AsOfJoinPlan = copy(left = l, right = r)
}

/** Planner strategy: inject via `spark.experimental.extraStrategies`
  * (done lazily by [[graft.ext.AsOfJoin.asOfNative]]) or
  * spark.sql.extensions → graft.sql.GraftExtensions. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
    leftKey: Attribute, rightKey: Attribute,
    leftTs: Attribute, rightTs: Attribute) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def withNewChildrenInternal(
      l: SparkPlan, r: SparkPlan): AsOfJoinExec = copy(left = l, right = r)

  override protected def doExecute(): RDD[InternalRow] = {
    val lk = left.output.indexWhere(_.exprId == leftKey.exprId)
    val lt = left.output.indexWhere(_.exprId == leftTs.exprId)
    val rk = right.output.indexWhere(_.exprId == rightKey.exprId)
    val rt = right.output.indexWhere(_.exprId == rightTs.exprId)
    require(lk >= 0 && lt >= 0 && rk >= 0 && rt >= 0,
      "as-of key/ts attributes must be direct child outputs")
    val nRight = right.output.size
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val joiner = new JoinedRow
      val proj = UnsafeProjection.create(outAttrs, outAttrs)
      val nullRight = new GenericInternalRow(nRight)
      new Iterator[InternalRow] {
        // one lookahead right row (not yet consumed) + one buffered
        // best-so-far per current key — the O(1) merge state
        private var rNext: InternalRow = _
        private var best: InternalRow = _
        private var bestKey = 0L
        override def hasNext: Boolean = lIter.hasNext
        override def next(): InternalRow = {
          val l = lIter.next()
          if (l.isNullAt(lk) || l.isNullAt(lt)) return proj(joiner(l, nullRight))
          val lKey = l.getLong(lk)
          val lTime = l.getLong(lt)
          if (best != null && bestKey != lKey) best = null
          var scanning = true
          while (scanning) {
            if (rNext == null && rIter.hasNext) rNext = rIter.next()
            if (rNext == null) scanning = false
            else if (rNext.isNullAt(rk) || rNext.isNullAt(rt)) rNext = null
            else {
              val rKey = rNext.getLong(rk)
              val rTime = rNext.getLong(rt)
              if (rKey < lKey || (rKey == lKey && rTime <= lTime)) {
                if (rKey == lKey) {
                  // iterator rows are reused buffers — copy the keeper
                  best = rNext.copy(); bestKey = rKey
                }
                rNext = null
              } else scanning = false
            }
          }
          proj(joiner(l, if (best != null && bestKey == lKey) best else nullRight))
        }
      }
    }
  }
}
