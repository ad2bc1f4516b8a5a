package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graftshim.PlanBridge
import org.apache.spark.sql.types.LongType

/** Native as-of join — the whole-operator extension path ((c) in the
  * design hierarchy): a custom `LogicalPlan` + `SparkStrategy` +
  * `SparkPlan`, registered through
  * `SparkSessionExtensions.injectPlannerStrategy` in
  * [[graft.GraftExtensions]].
  *
  * Semantics: for every left row, attach the right row with the same
  * key and the greatest right timestamp ≤ the left timestamp (nulls
  * on no match — a LEFT OUTER as-of). Among equal maximal right
  * timestamps the retained row is the last in partition sort order
  * (callers needing a total tie-break should disambiguate the
  * timestamp, e.g. `ts*1000 + id%1000`).
  *
  * Why a custom operator when the engine already composes as-of from
  * union + last(ignoreNulls) window (rel_q12): the composed form
  * funnels BOTH tables through one union + one window — every right
  * row is re-emitted per left partition pass and the window state
  * carries the union's full width. This operator instead asks
  * Catalyst for `ClusteredDistribution` on each side's key and a
  * per-partition (key, ts) sort — EnsureRequirements inserts exactly
  * one exchange per side (reused if the data is already bucketed) —
  * then streams a per-partition merge holding ONE buffered right row:
  * O(1) state, no union blow-up, no window buffer. At 100 TB this is
  * the difference between shuffling the union and shuffling each
  * side once.
  *
  * Keys and timestamps are `bigint` (epoch-µs convention used across
  * the engine); null keys/timestamps never match, mirroring equi-join
  * null semantics.
  */
case class AsofJoin(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTs: Expression, rightTs: Expression,
    tolerance: Long = Long.MaxValue)
  extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      l: LogicalPlan, r: LogicalPlan): AsofJoin = copy(left = l, right = r)
}

class AsofStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoin(l, r, lk, rk, lts, rts, tol) =>
      AsofJoinExec(planLater(l), planLater(r), lk, rk, lts, rts, tol) :: Nil
    case _ => Nil
  }
}

case class AsofJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftTs: Expression, rightTs: Expression,
    tolerance: Long = Long.MaxValue)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override def outputPartitioning: Partitioning = left.outputPartitioning

  // co-partition on the key, sort (key, ts) within partitions —
  // EnsureRequirements materializes these as at most one exchange +
  // sort per side
  override def requiredChildDistribution: Seq[Distribution] = Seq(
    ClusteredDistribution(Seq(leftKey)),
    ClusteredDistribution(Seq(rightKey)))
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))
  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lk = BindReferences.bindReference(leftKey, lOut)
    val lt = BindReferences.bindReference(leftTs, lOut)
    val rk = BindReferences.bindReference(rightKey, rOut)
    val rt = BindReferences.bindReference(rightTs, rOut)
    val rArity = rOut.length
    val outAttrs = output
    // bind against nullability-adjusted right attributes: the
    // unmatched null row must project as nulls, not as zeros
    val inAttrs = lOut ++ rOut.map(_.withNullability(true))
    left.execute().zipPartitions(right.execute()) { (li, ri) =>
      val nullRight = new GenericInternalRow(rArity)
      val joined = new JoinedRow
      val proj = UnsafeProjection.create(outAttrs, inAttrs)
      new Iterator[InternalRow] {
        // one-row lookahead into the right side; valid until the next
        // ri.next() call (we never call next() while rHead is live)
        private var rHead: InternalRow = _
        // best match for the CURRENT left key (copied: unsafe rows
        // are reused by the underlying iterator)
        private var best: InternalRow = _
        private var bestKey = 0L
        private var bestTs = 0L

        override def hasNext: Boolean = li.hasNext

        override def next(): InternalRow = {
          val l = li.next()
          val lkv = lk.eval(l)
          val ltv = lt.eval(l)
          if (lkv == null || ltv == null) return proj(joined(l, nullRight))
          val lKey = lkv.asInstanceOf[Long]
          val lTime = ltv.asInstanceOf[Long]
          if (best != null && bestKey != lKey) best = null
          var advance = true
          while (advance) {
            if (rHead == null) {
              if (ri.hasNext) rHead = ri.next() else advance = false
            }
            if (rHead != null) {
              val rkv = rk.eval(rHead)
              val rtv = rt.eval(rHead)
              if (rkv == null || rtv == null) rHead = null // never matches
              else {
                val rKey = rkv.asInstanceOf[Long]
                val rTime = rtv.asInstanceOf[Long]
                if (rKey < lKey) rHead = null // key already passed
                else if (rKey == lKey && rTime <= lTime) {
                  best = rHead.copy(); bestKey = rKey; bestTs = rTime
                  rHead = null
                } else advance = false // right side is ahead; stop
              }
            }
          }
          // tolerance gates EMISSION only: `best` stays buffered (a
          // later left row of the same key may be near enough).
          // bestTs <= lTime always holds, so the true age fits in
          // UNSIGNED 64-bit even when the signed subtraction wraps
          // (lTime huge positive, bestTs huge negative) — compare
          // unsigned so a wrapped age cannot sneak under the bound
          if (best != null && bestKey == lKey &&
              java.lang.Long.compareUnsigned(lTime - bestTs, tolerance) <= 0)
            proj(joined(l, best))
          else proj(joined(l, nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      l: SparkPlan, r: SparkPlan): AsofJoinExec = copy(left = l, right = r)
}

/** Public DataFrame API for the native as-of join. */
object AsofJoinOps {
  /** `asof(left, right, "user_id", "ts_us", "click_us")`: left outer
    * as-of on equal key and greatest right ts ≤ left ts. Key and ts
    * columns must be `bigint`. Right-side columns keep their names
    * (disambiguate beforehand if they clash with left). `tolerance`
    * bounds the match age (pandas merge_asof-style): a maximal match
    * older than `tolerance` ts units yields nulls instead. The
    * default caps the age at 2^63-1 units — effectively unbounded
    * for real timestamps, but note a left/right pair spanning more
    * than half the full Long range is treated as out of tolerance. */
  def asof(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String,
      tolerance: Long = Long.MaxValue): DataFrame = {
    val lp = left.queryExecution.analyzed
    // Re-alias the right side with FRESH exprIds: when both inputs
    // derive from the same scan (self-as-of), left and right would
    // otherwise share attribute ids, and the analyzer's relation
    // dedup cannot know this node's right-bound expressions refer to
    // the right child — column pruning then drops the "duplicate"
    // key under us. Fresh aliases make the right output globally
    // unique, like Spark's own join API does on self-joins.
    val rp0 = right.queryExecution.analyzed
    val rAliases = rp0.output.map(a =>
      org.apache.spark.sql.catalyst.expressions.Alias(a, a.name)())
    val rp = org.apache.spark.sql.catalyst.plans.logical.Project(
      rAliases, rp0)
    def col(plan: LogicalPlan, name: String, side: String): Attribute = {
      val found = plan.output.filter(_.name == name)
      require(found.length == 1,
        s"asof: $side column '$name' ${
          if (found.isEmpty) "not found" else "is ambiguous"}")
      require(found.head.dataType == LongType,
        s"asof: $side column '$name' must be bigint, " +
          s"got ${found.head.dataType.simpleString}")
      found.head
    }
    require(tolerance >= 0, s"asof: tolerance must be >= 0, got $tolerance")
    val node = AsofJoin(lp, rp,
      col(lp, key, "left"), col(rp, key, "right"),
      col(lp, leftTs, "left"), col(rp, rightTs, "right"), tolerance)
    PlanBridge.ofRows(left.sparkSession, node)
  }
}
