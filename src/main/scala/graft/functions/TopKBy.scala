package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.trees.TernaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType, StructField, StructType}

/** Bounded per-group top-k aggregate: `graft_top_k_by(score, id, k)` keeps
  * the k largest `(score DESC, id ASC)` pairs per group in a fixed-size
  * buffer and returns them as an ordered `array<struct<score,id>>`.
  *
  * This is the per-group analogue of TakeOrderedAndProject, and the
  * scale-correct alternative to the two usual formulations:
  *   - a window `row_number() <= k` sorts EVERY row of every group
  *     (full shuffle + sort of the fact table);
  *   - `slice(array_sort(collect_list(struct(...))), 1, k)` buffers an
  *     UNBOUNDED array per group in one task (a hot group OOMs it).
  * As a [[TypedImperativeAggregate]] it partial-aggregates: each map task
  * reduces its slice of a group to ≤ k pairs before the exchange, so the
  * shuffle carries at most `k × partitions` rows per group no matter how
  * many rows the group has. Runs under ObjectHashAggregate.
  *
  * Determinism: ties in score break on the smaller id, so the result is
  * identical under any partitioning and reproducible by an ANSI
  * `row_number() OVER (ORDER BY score DESC, id)` oracle.
  *
  * The buffer appends until 4k then compacts (sort + truncate to k):
  * amortized O(log k) comparisons per row, exactly k pairs serialized per
  * partial result.
  */
case class TopKBy(
    score: Expression,
    id: Expression,
    kExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer]
  with TernaryLike[Expression] {

  private lazy val k: Int = kExpr match {
    case Literal(v: Int, IntegerType) if v > 0 => v
    case other => throw new IllegalArgumentException(
      s"$prettyName requires a positive integer literal k, got $other")
  }

  override def first: Expression = score
  override def second: Expression = id
  override def third: Expression = kExpr

  override def checkInputDataTypes(): TypeCheckResult =
    if (score.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs a double score, got ${score.dataType.catalogString}")
    else if (id.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs a bigint id, got ${id.dataType.catalogString}")
    else if (!kExpr.foldable || kExpr.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs an integer literal k")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = false
  override def prettyName: String = "graft_top_k_by"

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buffer: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    // null and NaN scores are ignored (NaN sorts above every real score
    // in Double.compare and would poison the top-k with unrankable rows)
    if (s != null && i != null && !s.asInstanceOf[Double].isNaN) {
      buffer.add(s.asInstanceOf[Double], i.asInstanceOf[Long])
    }
    buffer
  }

  override def merge(buffer: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    buffer.addAll(other)
    buffer
  }

  override def eval(buffer: TopKBuffer): Any = {
    val top = buffer.sortedTop()
    new GenericArrayData(top.map { case (s, i) =>
      InternalRow(s, i)
    })
  }

  override def serialize(buffer: TopKBuffer): Array[Byte] = {
    val top = buffer.sortedTop()
    val bb = ByteBuffer.allocate(4 + top.length * 16)
    bb.putInt(top.length)
    top.foreach { case (s, i) => bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKBuffer(k)
    var j = 0
    while (j < n) { buf.add(bb.getDouble, bb.getLong); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKBy =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKBy =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): TopKBy =
    copy(score = newFirst, id = newSecond, kExpr = newThird)
}

/** Growable pair store capped at 4k entries; compaction sorts by
  * (score DESC, id ASC) and truncates to k. Plain arrays of primitives —
  * no boxing in the hot add path beyond the compaction sort.
  */
final class TopKBuffer(val k: Int) {
  private val cap = math.max(4 * k, 16)
  private var scores = new Array[Double](cap)
  private var ids = new Array[Long](cap)
  private var n = 0
  // once full at least once, the smallest kept (score,id) lets us skip
  // rows that can't enter the top-k without a sort
  private var hasFloor = false
  private var floorScore = 0.0
  private var floorId = 0L

  private def beats(s: Double, i: Long, s2: Double, i2: Long): Boolean =
    s > s2 || (s == s2 && i < i2)

  def add(s: Double, i: Long): Unit = {
    if (hasFloor && !beats(s, i, floorScore, floorId)) return
    if (n == cap) compact()
    scores(n) = s
    ids(n) = i
    n += 1
  }

  def addAll(other: TopKBuffer): Unit = {
    var j = 0
    while (j < other.n) { add(other.scores(j), other.ids(j)); j += 1 }
  }

  private def compact(): Unit = {
    val top = sortedTop()
    n = top.length
    var j = 0
    while (j < n) { scores(j) = top(j)._1; ids(j) = top(j)._2; j += 1 }
    if (n == k) {
      hasFloor = true
      floorScore = scores(n - 1)
      floorId = ids(n - 1)
    }
  }

  /** The final (score DESC, id ASC) top-k as an array of pairs. */
  def sortedTop(): Array[(Double, Long)] = {
    val pairs = Array.tabulate(n)(j => (scores(j), ids(j)))
    java.util.Arrays.sort(pairs, new java.util.Comparator[(Double, Long)] {
      override def compare(a: (Double, Long), b: (Double, Long)): Int = {
        val c = java.lang.Double.compare(b._1, a._1)
        if (c != 0) c else java.lang.Long.compare(a._2, b._2)
      }
    })
    pairs.take(math.min(n, k))
  }
}

object TopKBy {
  private[functions] val descriptor = (
    FunctionIdentifier("graft_top_k_by"),
    new ExpressionInfo(classOf[TopKBy].getName, "graft_top_k_by"),
    (children: Seq[Expression]) =>
      TopKBy(children(0), children(1), children(2)): Expression,
  )
}
