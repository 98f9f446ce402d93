package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, AttributeSet, JoinedRow, SortOrder, SpecificInternalRow, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.graftbridge.Bridge

/** Native Catalyst as-of join: logical node + planner strategy + a
  * single-pass sort-merge-carry physical operator (SURVEY.md §7.3 tier c —
  * built after profiling showed the union+window rewrite pays for buffering
  * every entity group in WindowExec).
  *
  * Semantics identical to graft.operators.AsOf.join (property-tested):
  * for each left row, the value columns of the latest right row with
  * rightTs <= leftTs (strict: <) on the same entity, plus matched_ts;
  * zero temporal leakage by construction — the merge NEVER reads a right
  * row past the current left timestamp.
  *
  * Physical properties: both children clustered on the entity key and
  * sorted by (entity, ts) — EnsureRequirements inserts exactly one
  * exchange + one sort per side (same as a SortMergeJoin); the merge is
  * O(1) state per row: one carried value row, no per-group buffering.
  *
  * Key/ts/value columns are held as real Attributes so column pruning and
  * the optimizer see this node's references.
  */
case class AsOfJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftEntity: Attribute,
    leftTs: Attribute,
    rightEntity: Attribute,
    rightTs: Attribute,
    rightValues: Seq[Attribute],
    strict: Boolean,
    // constructor param so copy()/withNewChildren keep the exprId stable
    matchedTs: AttributeReference) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ rightValues.map(_.withNullability(true)) :+ matchedTs

  // matched_ts is minted by this operator, not derived from children
  override def producedAttributes: AttributeSet = AttributeSet(Seq(matchedTs))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

case class AsOfJoinExec(
    leftEntity: Attribute,
    leftTs: Attribute,
    rightEntity: Attribute,
    rightTs: Attribute,
    rightValues: Seq[Attribute],
    strict: Boolean,
    matchedTs: AttributeReference,
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ rightValues.map(_.withNullability(true)) :+ matchedTs

  override def producedAttributes: AttributeSet = AttributeSet(Seq(matchedTs))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftEntity)) ::
      ClusteredDistribution(Seq(rightEntity)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftEntity, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightEntity, Ascending), SortOrder(rightTs, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override lazy val metrics = Map(
    "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"),
    "numMatched" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "left rows with a matched feature"))

  private def ordinal(out: Seq[Attribute], a: Attribute): Int = {
    val i = out.indexWhere(_.exprId == a.exprId)
    require(i >= 0, s"attribute $a missing from ${out.mkString(",")}")
    i
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val numMatched = longMetric("numMatched")
    val leftOut = left.output
    val rightOut = right.output
    val entityOrd0 = org.apache.spark.sql.catalyst.util.TypeUtils
      .getInterpretedOrdering(leftEntity.dataType)
    // ts columns are REQUIRED LongType (AsOfNative.join enforces it; the
    // merge below reads them with primitive getLong — no per-row boxing)
    require(leftTs.dataType == org.apache.spark.sql.types.LongType &&
      rightTs.dataType == org.apache.spark.sql.types.LongType,
      "AsOfJoinExec requires LongType ts columns")
    // null-safe, NULLS FIRST (matching requiredChildOrdering's default):
    // the interpreted ordering NPEs on null operands, and the batch
    // window rewrite groups null keys rather than crashing — parity
    // demands null==null matches here too
    def nullsFirst(ord: Ordering[Any]): (Any, Any) => Int = (a, b) =>
      if (a == null && b == null) 0
      else if (a == null) -1
      else if (b == null) 1
      else ord.compare(a, b)
    val entityOrd = nullsFirst(entityOrd0)
    // primitive null-first ts compare (ts is LongType by the require)
    def tsCmp(aNull: Boolean, a: Long, bNull: Boolean, b: Long): Int =
      if (aNull && bNull) 0 else if (aNull) -1 else if (bNull) 1
      else java.lang.Long.compare(a, b)
    val strictB = strict
    val lEntityIdx = ordinal(leftOut, leftEntity)
    val lTsIdx = ordinal(leftOut, leftTs)
    val rEntityIdx = ordinal(rightOut, rightEntity)
    val rTsIdx = ordinal(rightOut, rightTs)
    val rValIdx = rightValues.map(a => ordinal(rightOut, a))
    // hoisted primitive arrays: the absorb loop runs once per RIGHT row,
    // and a per-row Seq.zipWithIndex would allocate a list + tuples for
    // every one of them
    val rValIdxArr = rValIdx.toArray
    val rValTypesArr = rightValues.map(_.dataType).toArray
    // primitive-copy codes for the hot absorb loop: 0=double, 1=long,
    // 2=int, 3=float, -1=generic copyValue (boxes)
    val rValCodeArr = rValTypesArr.map {
      case org.apache.spark.sql.types.DoubleType => 0
      case org.apache.spark.sql.types.LongType => 1
      case org.apache.spark.sql.types.IntegerType => 2
      case org.apache.spark.sql.types.FloatType => 3
      case _ => -1
    }
    val entityType = leftEntity.dataType
    val tsType = leftTs.dataType
    val rValTypes = rightValues.map(_.dataType)
    val carrySchema = rValTypes :+ rightTs.dataType
    val outAttrs = output
    val joinedSchema = leftOut ++ (rightValues.map(_.withNullability(true)) :+ matchedTs)

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val joined = new JoinedRow
      val project = UnsafeProjection.create(outAttrs, joinedSchema)
      // carry row layout: value columns ++ matched_ts; null row when no match
      val carry = new SpecificInternalRow(carrySchema)
      val nullCarry = new SpecificInternalRow(carrySchema)
      carrySchema.indices.foreach(nullCarry.setNullAt)
      var carryEntity: Any = null
      var carryTsNull = true
      var carryTs = 0L
      var hasCarry = false
      var rHead: InternalRow = null
      var rHeadDone = !rIter.hasNext
      if (!rHeadDone) rHead = rIter.next()

      def rightApplies(le: Any, ltNull: Boolean, lt: Long): Boolean = {
        val ec = entityOrd(rHead.get(rEntityIdx, entityType), le)
        if (ec < 0) true
        else if (ec > 0) false
        else {
          val rNull = rHead.isNullAt(rTsIdx)
          val tc = tsCmp(rNull, if (rNull) 0L else rHead.getLong(rTsIdx),
            ltNull, lt)
          if (strictB) tc < 0 else tc <= 0
        }
      }

      // Input-ordering verification: the merge is only correct over
      // (entity, ts)-sorted children. The planner usually guarantees that
      // via requiredChildOrdering, but a child may satisfy it through an
      // ordering-CLAIM node ([[AssumeOrderedExec]]) whose promise the
      // planner cannot check — so the merge verifies as it streams (one
      // compare per consumed row, no copies beyond the existing carry)
      // and throws instead of silently emitting wrong matches.
      var prevLe: Any = null
      var prevLtNull = true
      var prevLt = 0L
      var haveLPrev = false
      def orderViolation(side: String, e: Any, t: Any): Nothing =
        throw new IllegalStateException(
          s"as-of merge: $side side not sorted by (entity, ts) — saw " +
            s"($e, $t) after a later row; an ordering claim " +
            "(AsOfNative.assumeSorted) on unsorted data?")
      lIter.map { lRow =>
        val le = lRow.get(lEntityIdx, entityType)
        val ltNull = lRow.isNullAt(lTsIdx)
        val lt = if (ltNull) 0L else lRow.getLong(lTsIdx)
        if (haveLPrev) {
          val ec = entityOrd(le, prevLe)
          if (ec < 0 || (ec == 0 && tsCmp(ltNull, lt, prevLtNull, prevLt) < 0))
            orderViolation("left", le, if (ltNull) null else lt)
          // copy the held entity only when it CHANGES (same rule as the
          // carry below) — one clone per entity, not one per left row
          if (ec != 0) prevLe = InternalRow.copyValue(le)
        } else prevLe = InternalRow.copyValue(le)
        prevLtNull = ltNull
        prevLt = lt
        haveLPrev = true
        while (!rHeadDone && rightApplies(le, ltNull, lt)) {
          // absorb this right row into the carry (copies — the sorter
          // reuses row objects); first verify the right stream really is
          // non-decreasing vs the previous absorbed row
          val rtNull = rHead.isNullAt(rTsIdx)
          val rt = if (rtNull) 0L else rHead.getLong(rTsIdx)
          val re = rHead.get(rEntityIdx, entityType)
          val reCmp = if (hasCarry) entityOrd(re, carryEntity) else 1
          if (hasCarry &&
              (reCmp < 0 || (reCmp == 0 &&
                tsCmp(rtNull, rt, carryTsNull, carryTs) < 0)))
            orderViolation("right", re, if (rtNull) null else rt)
          // copy the entity only when it CHANGES (the sorter reuses row
          // buffers, so a held reference must be a copy — but one copy
          // per entity, not one per absorbed row)
          if (reCmp != 0) carryEntity = InternalRow.copyValue(re)
          var vi = 0
          while (vi < rValIdxArr.length) {
            val ri = rValIdxArr(vi)
            if (rHead.isNullAt(ri)) carry.setNullAt(vi)
            else rValCodeArr(vi) match {
              case 0 => carry.setDouble(vi, rHead.getDouble(ri))
              case 1 => carry.setLong(vi, rHead.getLong(ri))
              case 2 => carry.setInt(vi, rHead.getInt(ri))
              case 3 => carry.setFloat(vi, rHead.getFloat(ri))
              case _ => carry.update(vi,
                InternalRow.copyValue(rHead.get(ri, rValTypesArr(vi))))
            }
            vi += 1
          }
          if (rtNull) carry.setNullAt(carrySchema.length - 1)
          else carry.setLong(carrySchema.length - 1, rt)
          carryTsNull = rtNull
          carryTs = rt
          hasCarry = true
          if (rIter.hasNext) rHead = rIter.next() else { rHeadDone = true; rHead = null }
        }
        val matches = hasCarry && entityOrd(carryEntity, le) == 0
        numOutputRows += 1
        if (matches) numMatched += 1
        project(joined(lRow, if (matches) carry else nullCarry))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Ordering CLAIM: pass-through node declaring that its child's rows are
  * already sorted by `orderCols` within each partition — problem
  * knowledge the optimizer cannot derive (guide §8), e.g. "a per-doc
  * frame array explodes in frame order, so sorting the COMPACT doc rows
  * by key makes the exploded stream (key, ts)-sorted" — which lets
  * EnsureRequirements skip a full sort of the exploded timeline.
  *
  * A false claim CANNOT silently corrupt an as-of join: AsOfJoinExec
  * verifies both input streams' ordering as it merges and throws. */
case class AssumeOrderedNode(child: LogicalPlan, orderCols: Seq[Attribute])
    extends org.apache.spark.sql.catalyst.plans.logical.UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(c: LogicalPlan): AssumeOrderedNode =
    copy(child = c)
}

case class AssumeOrderedExec(child: SparkPlan, orderCols: Seq[Attribute])
    extends org.apache.spark.sql.execution.UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    orderCols.map(a => SortOrder(a, Ascending))
  override protected def doExecute(): RDD[InternalRow] = child.execute()
  override protected def withNewChildInternal(c: SparkPlan): AssumeOrderedExec =
    copy(child = c)
}

/** Planner strategy lowering the logical node; injected per-session via
  * spark.experimental.extraStrategies (no session-construction-time
  * extension needed). */
object AsOfJoinStrategy extends SparkStrategy {
  def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case n: AsOfJoinNode =>
      AsOfJoinExec(n.leftEntity, n.leftTs, n.rightEntity, n.rightTs,
        n.rightValues, n.strict, n.matchedTs,
        planLater(n.left), planLater(n.right)) :: Nil
    case n: AssumeOrderedNode =>
      AssumeOrderedExec(planLater(n.child), n.orderCols) :: Nil
    case _ => Nil
  }
}

/** Optimizer BARRIER: [[AssumeOrderedNode]] with no ordering claim — a
  * pass-through the optimizer cannot push predicates or pruning through.
  * Use it between an expensive aliased array computation and an explode:
  * InferFiltersFromGenerate adds a size(child)>0 filter above every
  * explode, and predicate pushdown substitutes the full expression into
  * it (evaluating e.g. a frame loop 3x per row); above the barrier the
  * filter tests the already-computed column. Project exactly the needed
  * columns BELOW the barrier — column pruning stops at it too. */
object PlanBarrier {
  def apply(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    AsOfNative.install(spark)
    Bridge.ofRows(spark, AssumeOrderedNode(df.queryExecution.analyzed, Nil))
  }
}

object AsOfNative {

  /** Register the strategy on the session (idempotent). */
  def install(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraStrategies
    if (!cur.exists(_.isInstanceOf[AsOfJoinStrategy.type]))
      spark.experimental.extraStrategies = cur :+ AsOfJoinStrategy
  }

  /** Declare `df` already sorted by `cols` within each partition (see
    * [[AssumeOrderedNode]]); feed the result to [[join]] to skip the
    * planner's sort on that side. The claim is VERIFIED row-by-row by
    * the merge — unsorted data fails loudly, never silently. */
  def assumeSorted(df: DataFrame, cols: String*): DataFrame = {
    val spark = df.sparkSession
    install(spark)
    val lp = df.queryExecution.analyzed
    val attrs = cols.map(c => lp.output.find(_.name == c).getOrElse(
      throw new IllegalArgumentException(
        s"no column $c in ${lp.output.map(_.name)}")))
    Bridge.ofRows(spark, AssumeOrderedNode(lp, attrs))
  }

  /** Native as-of join; same contract as graft.operators.AsOf.join. */
  def join(queries: DataFrame, features: DataFrame, entityCol: String,
      tsCol: String, valueCols: Seq[String], strict: Boolean = false): DataFrame = {
    require(features.schema(tsCol).dataType ==
      org.apache.spark.sql.types.LongType &&
      queries.schema(tsCol).dataType ==
      org.apache.spark.sql.types.LongType,
      "native as-of join requires LongType ts columns (integer ns/us) on BOTH sides")
    // the exec reads right-side fields with the LEFT side's data types —
    // a silent cross-side dtype mismatch would read wrong bytes from the
    // UnsafeRow, not error
    require(queries.schema(entityCol).dataType ==
      features.schema(entityCol).dataType,
      s"entity dtype mismatch: queries ${queries.schema(entityCol).dataType} " +
        s"vs features ${features.schema(entityCol).dataType}")
    val spark = queries.sparkSession
    install(spark)
    val lp = queries.queryExecution.analyzed
    val rp0 = features.queryExecution.analyzed
    // self-join hygiene: custom nodes bypass the analyzer's
    // DeduplicateRelations, so shared exprIds between the sides (queries
    // and features derived from one table) would confuse column pruning —
    // re-alias the right side with fresh exprIds when outputs overlap
    val rp: LogicalPlan =
      if (rp0.outputSet.intersect(lp.outputSet).isEmpty) rp0
      else org.apache.spark.sql.catalyst.plans.logical.Project(
        rp0.output.map(a =>
          org.apache.spark.sql.catalyst.expressions.Alias(a, a.name)()), rp0)
    def attr(p: LogicalPlan, name: String): Attribute =
      p.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"no column $name in ${p.output.map(_.name)}"))
    Bridge.ofRows(spark, AsOfJoinNode(lp, rp,
      attr(lp, entityCol), attr(lp, tsCol),
      attr(rp, entityCol), attr(rp, tsCol),
      valueCols.map(c => attr(rp, c)), strict,
      AttributeReference("matched_ts",
        org.apache.spark.sql.types.LongType, nullable = true)()))
  }
}
