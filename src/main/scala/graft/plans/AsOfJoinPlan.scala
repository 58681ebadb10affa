package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, AttributeSet, ExprId, JoinedRow, NamedExpression, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Whole-operator custom as-of join (SURVEY §2.7 J6, preference (c):
  * LogicalPlan + Strategy + SparkPlan).
  *
  * Semantics: for every left row, attach the latest right payload with
  * `right.ts <= left.ts` within the same key (backward as-of, inclusive).
  * Identical results to `graft.ts.AsOfJoin.backward` (the composable
  * union+window spelling) — `AsOfJoinPlanSpec` asserts equality — but as
  * a first-class physical operator:
  *
  *  - `requiredChildDistribution` clusters both sides by key and
  *    `requiredChildOrdering` sorts (key, ts), so Catalyst inserts
  *    exactly one exchange+sort per side (same cost as sort-merge join);
  *  - `doExecute` merges the two sorted streams in one pass per
  *    partition with O(1) state — no union row-blowup, no window
  *    buffering, and the join never materializes both sides.
  *
  * Columns are carried BY NAME and resolved lazily against the current
  * children — optimizer rules (e.g. ReplaceDeduplicateWithAggregate) may
  * rewrite child outputs with fresh exprIds, so attributes captured at
  * construction would dangle. The produced attribute's exprId is a
  * constructor parameter so `output` stays stable across `copy`.
  *
  * v1 scope (checked at construction): key LongType, ts LongType (µs —
  * convert timestamps upstream), payload DoubleType; unique column names
  * per side.
  */
case class AsOfJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    keyName: String, tsName: String, payloadName: String,
    outAttrs: Seq[AttributeReference])
  extends BinaryNode {

  // The node OWNS its output attributes (fresh exprIds frozen at
  // construction, positionally mirroring left.output :+ asof column).
  // Analyzer/optimizer rules may re-mint child output ids
  // (DeduplicateRelations, ReplaceDeduplicateWithAggregate, ...); an
  // output derived from `left.output` would change under ancestors that
  // captured the old ids, breaking attribute binding. A frozen output +
  // positional runtime mapping is immune.
  override def output: Seq[Attribute] = outAttrs

  override def producedAttributes: AttributeSet = AttributeSet(outAttrs)

  // Claim every left column (pass-through) or ColumnPruning inserts a
  // Project under `left` that drops columns the node still emits. The
  // right side only needs (key, ts, payload), so pruning DOES trim it.
  override def references: AttributeSet =
    AttributeSet(left.output ++ right.output.filter(a =>
      a.name == keyName || a.name == tsName || a.name == payloadName))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): LogicalPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case n: AsOfJoinNode =>
      AsOfJoinExec(planLater(n.left), planLater(n.right),
        n.keyName, n.tsName, n.payloadName, n.outAttrs) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    keyName: String, tsName: String, payloadName: String,
    outAttrs: Seq[AttributeReference])
  extends BinaryExecNode {

  private def byName(side: SparkPlan, name: String): Attribute =
    side.output.find(_.name == name).getOrElse(
      throw new IllegalStateException(s"$name missing from ${side.output.map(_.name)}"))

  override def output: Seq[Attribute] = outAttrs

  override def producedAttributes: AttributeSet = AttributeSet(outAttrs)

  override def requiredChildDistribution: Seq[Distribution] = {
    // Pin an explicit partition count on BOTH sides: zipPartitions needs
    // equal counts, and AQE's shuffle coalescing could otherwise shrink
    // the two exchanges differently.
    val n = conf.numShufflePartitions
    Seq(ClusteredDistribution(Seq(byName(left, keyName)), requiredNumPartitions = Some(n)),
      ClusteredDistribution(Seq(byName(right, keyName)), requiredNumPartitions = Some(n)))
  }

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    // right side adds the payload as the final sort key: among right rows
    // sharing (key, ts) the LARGEST payload deterministically wins (the
    // merge keeps the last row consumed), instead of partition-order luck
    Seq(Seq(SortOrder(byName(left, keyName), Ascending), SortOrder(byName(left, tsName), Ascending)),
      Seq(SortOrder(byName(right, keyName), Ascending), SortOrder(byName(right, tsName), Ascending),
        SortOrder(byName(right, payloadName), Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(byName(left, keyName), Ascending), SortOrder(byName(left, tsName), Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val keyLIdx = left.output.indexWhere(_.name == keyName)
    val tsLIdx = left.output.indexWhere(_.name == tsName)
    val keyRIdx = right.output.indexWhere(_.name == keyName)
    val tsRIdx = right.output.indexWhere(_.name == tsName)
    val payloadIdx = right.output.indexWhere(_.name == payloadName)
    val outputAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // downstream operators (shuffle, sort) require UnsafeRow
      val resultProj = UnsafeProjection.create(outputAttrs, outputAttrs)
      new Iterator[InternalRow] {
        private val joined = new JoinedRow
        private val valueRow = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
        // one-row lookahead over the sorted right stream
        private var rHead: InternalRow = null
        private var rHeadKey = 0L
        private var rHeadTs = 0L
        private var rHeadVal = 0.0
        private var rHeadValNull = true
        private def advanceRight(): Unit = {
          // skip right rows with NULL key/ts — SQL as-of semantics never
          // match them (getLong on a null slot would silently read 0)
          var found = false
          while (!found && rIter.hasNext) {
            val r = rIter.next()
            if (!r.isNullAt(keyRIdx) && !r.isNullAt(tsRIdx)) {
              rHeadKey = r.getLong(keyRIdx)
              rHeadTs = r.getLong(tsRIdx)
              rHeadValNull = r.isNullAt(payloadIdx)
              rHeadVal = if (rHeadValNull) 0.0 else r.getDouble(payloadIdx)
              rHead = r
              found = true
            }
          }
          if (!found) rHead = null
        }
        advanceRight()
        // carried state: latest right payload for the current key
        private var curKey = 0L
        private var hasCur = false
        private var curValNull = true
        private var curVal = 0.0
        override def hasNext: Boolean = lIter.hasNext
        override def next(): InternalRow = {
          val l = lIter.next()
          // left rows with NULL key/ts get a NULL as-of value (no match)
          if (l.isNullAt(keyLIdx) || l.isNullAt(tsLIdx)) {
            valueRow.setNullAt(0)
            return resultProj(joined(l, valueRow))
          }
          val k = l.getLong(keyLIdx)
          val ts = l.getLong(tsLIdx)
          if (!hasCur || curKey != k) { hasCur = true; curKey = k; curValNull = true; curVal = 0.0 }
          // consume right rows for keys < k entirely; for key k up to ts
          while (rHead != null &&
              (rHeadKey < k || (rHeadKey == k && rHeadTs <= ts))) {
            if (rHeadKey == k) { curValNull = rHeadValNull; curVal = rHeadVal }
            advanceRight()
          }
          if (curValNull) valueRow.setNullAt(0) else valueRow.setDouble(0, curVal)
          resultProj(joined(l, valueRow))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)
}

/** Dataset-level entry point + strategy registration. */
object AsOfJoinNative {

  /** Register the planner strategy once per session (also injectable via
    * `spark.sql.extensions` in cluster deployments).
    */
  def register(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy

  /** Backward as-of join: left rows + `outName` column = latest right
    * `payloadCol` at right.ts ≤ left.ts per key. Key/ts must be LongType,
    * payload DoubleType (v1 — convert timestamps with `unix_micros`).
    */
  def backward(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
      payloadCol: String, outName: String): DataFrame = {
    val spark = left.sparkSession
    register(spark)
    // Plan barrier: children enter the node as LogicalRDD leaves. A
    // custom logical node is opaque to the analyzer's
    // relation-deduplication and to transformUpWithNewOutput, so child
    // subtrees shared with other branches of the enclosing query (e.g.
    // self-union/except) would end up with conflicting re-minted
    // exprIds. LogicalRDD implements MultiInstanceRelation, so sharing
    // is handled the same way as for any leaf relation.
    //
    // OPT-r18 (guide §5; VERDICT r17 #2): the barrier was previously a
    // lazy `localCheckpoint(false)`, which ALSO materialized every
    // partition of BOTH inputs into block-manager storage on first use
    // — pure overhead for inputs each consumed by exactly one exchange,
    // and the blocks lingered until a driver GC (the prime suspect for
    // the driver's q57 5.66 s at 32 cores in a cache-heavy session).
    // `planBarrier` keeps the LogicalRDD isolation without any
    // persistence; each side recomputes at most once per execution.
    val lPlan = org.apache.spark.sql.GraftColumnBridge.planBarrier(left)
      .queryExecution.analyzed
    val rPlan = org.apache.spark.sql.GraftColumnBridge.planBarrier(right)
      .queryExecution.analyzed
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"column $name not found in ${plan.output.map(_.name)}"))
    require(lPlan.output.map(_.name).distinct.size == lPlan.output.size &&
      rPlan.output.map(_.name).distinct.size == rPlan.output.size,
      "as-of join v1 requires unique column names per side")
    val (kl, tl) = (attr(lPlan, keyCol), attr(lPlan, tsCol))
    val (kr, tr, pv) = (attr(rPlan, keyCol), attr(rPlan, tsCol), attr(rPlan, payloadCol))
    require(kl.dataType == LongType && kr.dataType == LongType,
      s"v1 supports LongType keys, got ${kl.dataType}/${kr.dataType}")
    require(tl.dataType == LongType && tr.dataType == LongType,
      s"v1 supports LongType (µs) timestamps, got ${tl.dataType}/${tr.dataType}")
    require(pv.dataType == DoubleType, s"v1 supports DoubleType payload, got ${pv.dataType}")
    val outAttrs = lPlan.output.map(a =>
      AttributeReference(a.name, a.dataType, a.nullable)()) :+
      AttributeReference(outName, DoubleType, nullable = true)()
    org.apache.spark.sql.GraftColumnBridge.ofRows(spark,
      AsOfJoinNode(lPlan, rPlan, keyCol, tsCol, payloadCol, outAttrs))
  }
}
