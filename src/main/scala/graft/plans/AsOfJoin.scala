package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, AttributeSet, GenericInternalRow, JoinedRow,
  RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{
  BinaryExecNode, CodegenSupport, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.SQLMetrics

/** Whole-operator Catalyst extension for the event-time as-of join: a
  * custom logical node ([[AsOfJoinNode]]), a planner strategy
  * ([[AsOfJoinStrategy]], injected via `SparkSessionExtensions` /
  * `spark.experimental.extraStrategies`) and a sort-merge physical
  * operator ([[AsOfJoinExec]]).
  *
  * [[graft.operators.AsOf.asOfJoin]] expresses the same semantics
  * compositionally (union + running `last(ignoreNulls)` window); that form
  * shuffles and window-scans the UNION of both sides and materializes a
  * carried-payload column per window step. This operator is the
  * preference-order-(c) escalation: the merge is a single forward pass per
  * partition with one held dim row of state — no union materialization, no
  * window frame machinery — while keeping EXACTLY the planner contracts a
  * built-in join has:
  *
  *  - `requiredChildDistribution` = `ClusteredDistribution(keys)` on both
  *    children, so EnsureRequirements co-partitions the sides (and AQE can
  *    still coalesce the exchanges);
  *  - `requiredChildOrdering` = (keys…, ts) ascending, so the sort is
  *    planned (and elided when a child is already sorted, e.g. a bucketed
  *    sorted table — the compositional form can never skip its window
  *    sort);
  *  - `outputPartitioning`/`outputOrdering` forward the left child's, so a
  *    downstream per-key aggregation or another as-of join on the same key
  *    reuses the exchange and sort instead of re-shuffling.
  *
  * Join semantics (identical to the compositional form): for every fact
  * row, attach the payload of the LATEST dim row with the same key and
  * `dim.ts <= fact.ts` (ties match); facts with no such dim row keep null
  * payloads (LEFT as-of). Dim rows with null key or null ts never match;
  * facts with null key or ts emit unmatched.
  */
case class AsOfJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTs: Attribute,
    rightTs: Attribute,
    rightCarried: Seq[Attribute],
    outAttrs: Seq[Attribute],
    direction: String = "backward",
    tolerance: Long = -1L,
    allowExact: Boolean = true)
  extends BinaryNode {

  override def output: Seq[Attribute] = left.output ++ outAttrs
  override def producedAttributes: AttributeSet = AttributeSet(outAttrs)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinNode]] as [[AsOfJoinExec]]; a no-op for every other
  * node. Registered by [[graft.functions.GraftExtensions]] and
  * idempotently via `spark.experimental.extraStrategies` in
  * [[graft.operators.AsOf.asOfJoinNative]].
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case n: AsOfJoinNode =>
      AsOfJoinExec(planLater(n.left), planLater(n.right),
        n.leftKeys, n.rightKeys, n.leftTs, n.rightTs,
        n.rightCarried, n.outAttrs, n.direction, n.tolerance,
        n.allowExact) :: Nil
    case _ => Nil
  }
}

/** The per-partition as-of merge, factored out of the exec so BOTH
  * execution paths share it: the interpreted `doExecute` builds it inside
  * `zipPartitions`, and the whole-stage-codegen path ships it to the
  * generated class via `references` and drives it from the fused
  * `processNext()` loop. Holds only serializable expression metadata; the
  * non-serializable codegen'd projections/orderings are built per
  * partition on the executor (same as SortMergeJoinExec).
  *
  * The returned iterator yields a reused [[JoinedRow]] over
  * `(fact, carried)` — field ordinals line up with
  * `left.output ++ outAttrs` — so the fused parent reads columns straight
  * out of it with no per-row result projection; the interpreted path adds
  * its own `UnsafeProjection` on top.
  */
class AsOfMerger(
    leftOutput: Seq[Attribute],
    rightOutput: Seq[Attribute],
    lKeys: Seq[Attribute],
    rKeys: Seq[Attribute],
    lTs: Attribute,
    rTs: Attribute,
    carried: Seq[Attribute],
    direction: String = "backward",
    tolerance: Long = -1L,
    allowExact: Boolean = true) extends Serializable {

  require(rKeys.map(_.dataType) == lKeys.map(_.dataType) &&
    rTs.dataType == lTs.dataType,
    "as-of join sides disagree on key/ts types — cast upstream")
  require(Set("backward", "forward", "nearest")(direction),
    s"unknown as-of direction '$direction'")
  private val forward = direction == "forward"
  private val nearest = direction == "nearest"
  // strict (non-exact) matching would need a look PAST runs of equal-ts
  // dim rows for the nearest direction's forward candidate — unsupported;
  // backward/forward strictness is a one-comparison change
  require(allowExact || !nearest,
    "nearest as-of does not support allowExact = false")
  // `nearest` and `tolerance` need |delta| arithmetic, not just ordering:
  // restrict to ts types whose single-field row value is an integral we
  // can subtract (tolerance is in the ts column's raw units — µs for
  // timestamps, days for dates)
  if (nearest || tolerance >= 0L) {
    import org.apache.spark.sql.types._
    require(Seq(LongType, IntegerType, TimestampType, TimestampNTZType, DateType)
      .exists(_ == lTs.dataType),
      s"nearest/tolerance as-of needs an integral/timestamp ts, got ${lTs.dataType}")
  }
  private val needTsState = nearest || tolerance >= 0L

  def create(
      factIter: Iterator[InternalRow],
      dimIter: Iterator[InternalRow]): Iterator[InternalRow] = {
    val keyTypes = lKeys.map(_.dataType)
    val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
    val tsOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lTs.dataType))
    val tsType = lTs.dataType
    // nearest-direction delta arithmetic (types pre-checked in the ctor)
    def tsValue(r: InternalRow): Long = tsType match {
      case org.apache.spark.sql.types.LongType |
           org.apache.spark.sql.types.TimestampType |
           org.apache.spark.sql.types.TimestampNTZType => r.getLong(0)
      case _ => r.getInt(0).toLong
    }
    val factKeyProj = UnsafeProjection.create(lKeys, leftOutput)
    val factTsProj = UnsafeProjection.create(Seq(lTs), leftOutput)
    val dimKeyProj = UnsafeProjection.create(rKeys, rightOutput)
    val dimTsProj = UnsafeProjection.create(Seq(rTs), rightOutput)
    val carriedProj = UnsafeProjection.create(carried, rightOutput)
    val nullCarried = new GenericInternalRow(carried.length)
    val joined = new JoinedRow

    new Iterator[InternalRow] {
      private var nextDim: InternalRow = if (dimIter.hasNext) dimIter.next() else null
      // the held row survives across next() calls while its key keeps
      // matching — both pieces must be copies (projection buffers are
      // reused on the next dim row)
      private var heldKey: UnsafeRow = null
      private var heldCarried: UnsafeRow = null
      private var heldTs: UnsafeRow = null // nearest mode only

      override def hasNext: Boolean = factIter.hasNext

      override def next(): InternalRow = {
        val fact = factIter.next()
        val fKey = factKeyProj(fact)
        val fTs = factTsProj(fact)
        val factUnmatchable = fKey.anyNull || fTs.anyNull
        if (forward) {
          // FORWARD direction (earliest dim at-or-after): no held state at
          // all - advance past dims before (fKey, fTs); the lookahead dim
          // IS the candidate, and it is not consumed (later facts with the
          // same key and larger ts may need it too, facts arrive ascending)
          var fwdMatched = false
          if (!factUnmatchable) {
            var scanning = nextDim != null
            while (scanning) {
              val dKey = dimKeyProj(nextDim)
              if (dKey.anyNull || dimTsProj(nextDim).anyNull) {
                advance()
              } else {
                val c = keyOrd.compare(dKey, fKey)
                val cTs =
                  if (c == 0) tsOrd.compare(dimTsProj(nextDim), fTs) else 0
                if (c < 0 || (c == 0 && (cTs < 0 || (!allowExact && cTs == 0)))) {
                  advance()
                } else {
                  fwdMatched = c == 0
                  scanning = false
                }
              }
              if (nextDim == null) scanning = false
            }
          }
          val fwdOk = fwdMatched && (tolerance < 0L ||
            tsValue(dimTsProj(nextDim)) - tsValue(fTs) <= tolerance)
          return joined(fact, if (fwdOk) carriedProj(nextDim) else nullCarried)
        }
        if (!factUnmatchable) {
          var scanning = nextDim != null
          while (scanning) {
            val dKey = dimKeyProj(nextDim)
            if (dKey.anyNull || dimTsProj(nextDim).anyNull) {
              advance()
            } else {
              val c = keyOrd.compare(dKey, fKey)
              val cTs =
                if (c == 0) tsOrd.compare(dimTsProj(nextDim), fTs) else 0
              if (c < 0) {
                advance()
              } else if (c == 0 && (cTs < 0 || (allowExact && cTs == 0))) {
                heldKey = dKey.copy()
                heldCarried = carriedProj(nextDim).copy()
                if (needTsState) heldTs = dimTsProj(nextDim).copy()
                advance()
              } else {
                scanning = false
              }
            }
            if (nextDim == null) scanning = false
          }
        }
        val matched = !factUnmatchable && heldKey != null &&
          keyOrd.compare(heldKey, fKey) == 0
        if (nearest) {
          // the backward scan stopped exactly at the first dim AFTER the
          // fact, so the lookahead row (if the key matches) is the forward
          // candidate; pick the smaller |delta|, ties to backward (pandas)
          val fwdOk = !factUnmatchable && nextDim != null && {
            val dKey = dimKeyProj(nextDim)
            !dKey.anyNull && !dimTsProj(nextDim).anyNull &&
              keyOrd.compare(dKey, fKey) == 0
          }
          val ft = if (factUnmatchable) 0L else tsValue(fTs)
          val bOk = matched &&
            (tolerance < 0L || ft - tsValue(heldTs) <= tolerance)
          val fOk = fwdOk &&
            (tolerance < 0L || tsValue(dimTsProj(nextDim)) - ft <= tolerance)
          val pick: InternalRow =
            if (bOk && fOk) {
              if (ft - tsValue(heldTs) <= tsValue(dimTsProj(nextDim)) - ft)
                heldCarried
              else carriedProj(nextDim)
            } else if (bOk) heldCarried
            else if (fOk) carriedProj(nextDim)
            else nullCarried
          joined(fact, pick)
        } else {
          val ok = matched && (tolerance < 0L ||
            tsValue(fTs) - tsValue(heldTs) <= tolerance)
          joined(fact, if (ok) heldCarried else nullCarried)
        }
      }

      private def advance(): Unit =
        nextDim = if (dimIter.hasNext) dimIter.next() else null
    }
  }
}

/** Sort-merge as-of join: both sides clustered on the key and sorted by
  * (keys…, ts); one forward pass per partition holding at most ONE dim
  * row of state (the latest at-or-before candidate). Linear in rows,
  * constant memory — and because the planner contracts above are
  * declared, Spark still handles exchange planning, sort elision, AQE
  * coalescing and metrics exactly as for built-ins.
  *
  * Implements [[CodegenSupport]] the way SortMergeJoinExec does: the exec
  * STARTS a whole-stage-codegen region (both children arrive as the
  * stage's two input RDDs — `inputRDDs()`; their produce chain is not
  * fused into this node) and every parent operator above fuses over its
  * output. The generated `processNext()` drives the shared
  * [[AsOfMerger]] and hands each merged row straight to the parent's
  * consume code, so no per-row `UnsafeProjection` materialization happens
  * between the merge and the fused parents (the interpreted path pays
  * one). `needCopyResult` is true because the merger reuses its
  * [[JoinedRow]] across rows.
  */
case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTs: Attribute,
    rightTs: Attribute,
    rightCarried: Seq[Attribute],
    outAttrs: Seq[Attribute],
    direction: String = "backward",
    tolerance: Long = -1L,
    allowExact: Boolean = true)
  extends BinaryExecNode with CodegenSupport {

  override def output: Seq[Attribute] = left.output ++ outAttrs
  override def producedAttributes: AttributeSet = AttributeSet(outAttrs)

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTs, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTs, Ascending))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  private def merger = new AsOfMerger(
    left.output, right.output, leftKeys, rightKeys, leftTs, rightTs,
    rightCarried, direction, tolerance, allowExact)

  protected override def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val m = merger
    val leftOutput = left.output
    val oAttrs = outAttrs
    val outputAttrs = output

    left.execute().zipPartitions(right.execute()) { (factIter, dimIter) =>
      val resultProj = UnsafeProjection.create(outputAttrs, leftOutput ++ oAttrs)
      m.create(factIter, dimIter).map { r =>
        numOutputRows += 1
        resultProj(r)
      }
    }
  }

  // ---- whole-stage codegen ------------------------------------------------

  override def inputRDDs(): Seq[RDD[InternalRow]] =
    left.execute() :: right.execute() :: Nil

  override def needCopyResult: Boolean = true

  protected override def doProduce(ctx: CodegenContext): String = {
    val mergerRef = ctx.addReferenceObj("asofMerger", merger, classOf[AsOfMerger].getName)
    val iterTerm = ctx.addMutableState("scala.collection.Iterator", "asofIter",
      v => s"$v = $mergerRef.create(inputs[0], inputs[1]);")
    val numOutput = metricTerm(ctx, "numOutputRows")
    val row = ctx.freshName("asofRow")
    // bind output columns as vars off the merged row (never hand the reused
    // JoinedRow itself downstream — the stage top must build an UnsafeRow)
    ctx.INPUT_ROW = row
    ctx.currentVars = null
    val outputVars = output.zipWithIndex.map { case (a, i) =>
      org.apache.spark.sql.catalyst.expressions.BoundReference(
        i, a.dataType, a.nullable).genCode(ctx)
    }
    // No `limitNotReachedCond` here: that guard is reserved for leaf and
    // blocking nodes (calling it from a binary node logs Spark's "[BUG]"
    // warning — and throws under spark.testing). SortMergeJoinExec's own
    // produce loop has the same shape and relies on `shouldStop()` alone;
    // a limit above this node still terminates the stage through it.
    s"""
       |while ($iterTerm.hasNext()) {
       |  InternalRow $row = (InternalRow) $iterTerm.next();
       |  $numOutput.add(1);
       |  ${consume(ctx, outputVars).trim}
       |  $shouldStopCheckCode
       |}
     """.stripMargin
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
