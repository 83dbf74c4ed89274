package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{
  BaseOrdering, BoundReference, Expression, Literal, NullOrdering, RowOrdering,
  SortDirection, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.trees.TernaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{
  ArrayType, DataType, IntegerType, StructField, StructType}

/** Bounded per-group `rank() <= k` (or, with `dense = true`,
  * `dense_rank() <= k`) retention: keeps every row whose rank under the
  * sort order is ≤ k — tie groups at the boundary are kept WHOLE (that
  * is what distinguishes the rank family from `row_number`) — and
  * returns them ordered, each with its rank, as
  * `array<struct<…payload…, __graft_rank>>`. `rank` counts ROWS before
  * a tie group; `dense_rank` counts DISTINCT KEYS, so dense retention
  * keeps the k smallest distinct keys with all their rows.
  *
  * The [[TopKRows]] twin for [[graft.plans.WindowTopKRewrite]]'s
  * rank-family branch. Same partial-aggregation contract (map tasks
  * reduce their slice before the exchange); the buffer floor is the
  * LAST RETAINED key — candidates strictly past it can never reach
  * rank ≤ k and are dropped on arrival, ties with it join their group.
  * Worst-case memory is the result itself (an all-ties group keeps
  * every row — exactly what the window form would emit), so the
  * rewrite's maxK guard bounds the intent, not the tie width.
  */
case class RankKRows(
    sortKey: Expression,
    payload: Expression,
    kExpr: Expression,
    dirs: Seq[SortDirection],
    nullOrds: Seq[NullOrdering],
    dense: Boolean = false,
    withPeers: Boolean = false,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[RankKRowsBuffer]
  with TernaryLike[Expression] {

  /** Some(k) for the literal form; None = learn k per group from kExpr
    * (any integer expression constant within each group — the
    * `percent_rank()` rewrite joins a per-group count onto the input and
    * derives the rank cutoff from it).
    */
  private lazy val staticK: Option[Int] = kExpr match {
    case Literal(v: Int, IntegerType) if v > 0 => Some(v)
    case Literal(_, _) => throw new IllegalArgumentException(
      s"$prettyName requires a positive integer literal k, got $kExpr")
    case _ => None
  }

  private def keyType: StructType = sortKey.dataType.asInstanceOf[StructType]
  private def payloadType: StructType = payload.dataType.asInstanceOf[StructType]

  override def first: Expression = sortKey
  override def second: Expression = payload
  override def third: Expression = kExpr

  override def checkInputDataTypes(): TypeCheckResult = sortKey.dataType match {
    case s: StructType if s.fields.map(_.dataType).forall(RowOrdering.isOrderable) =>
      if (!payload.dataType.isInstanceOf[StructType])
        TypeCheckResult.TypeCheckFailure(s"$prettyName needs a struct payload")
      else if (s.length != dirs.length || s.length != nullOrds.length)
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName: ${s.length} sort columns but ${dirs.length} directions")
      else if (kExpr.dataType != IntegerType)
        TypeCheckResult.TypeCheckFailure(s"$prettyName needs an integer k")
      else TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs an orderable struct sort key, got ${other.catalogString}")
  }

  /** Payload fields plus the computed rank (and, with `withPeers`, the
    * row's full tie-group size — retained tie groups are always complete,
    * so the count is the ORIGINAL peer count; the `cume_dist` rewrite
    * derives the group-end position rank − 1 + peers from it).
    */
  def outType: StructType = {
    val base = payloadType.fields :+
      StructField("__graft_rank", IntegerType, nullable = false)
    StructType(
      if (withPeers) base :+ StructField("__graft_peers", IntegerType, nullable = false)
      else base)
  }

  override def dataType: DataType = ArrayType(outType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String =
    if (dense) "graft_dense_rank_k_rows" else "graft_rank_k_rows"

  @transient private lazy val pairProj =
    UnsafeProjection.create(Seq(sortKey, payload))
  @transient private lazy val ordering: BaseOrdering = {
    val bound = keyType.fields.zipWithIndex.map { case (f, i) =>
      SortOrder(BoundReference(i, f.dataType, f.nullable), dirs(i), nullOrds(i), Seq.empty)
    }
    RowOrdering.create(bound.toIndexedSeq, Nil)
  }

  private def mkBuffer(initialK: Int): RankKRowsBuffer =
    new RankKRowsBuffer(initialK, keyType.length, ordering, dense)

  override def createAggregationBuffer(): RankKRowsBuffer =
    mkBuffer(staticK.getOrElse(-1))

  override def update(buffer: RankKRowsBuffer, input: InternalRow): RankKRowsBuffer = {
    if (staticK.isEmpty) {
      val kv = kExpr.eval(input)
      if (kv == null) throw new IllegalArgumentException(s"$prettyName: k is null")
      buffer.ensureK(math.max(kv.asInstanceOf[Int], 0))
    }
    buffer.add(pairProj(input))
    buffer
  }

  override def merge(buffer: RankKRowsBuffer, other: RankKRowsBuffer): RankKRowsBuffer = {
    if (other.k >= 0) buffer.ensureK(other.k)
    buffer.addAll(other)
    buffer
  }

  override def eval(buffer: RankKRowsBuffer): Any = {
    val (rows, ranks, peers) = buffer.rankedTopWithPeers()
    val nPay = payloadType.length
    new GenericArrayData(rows.indices.map { j =>
      val pay = rows(j).getStruct(1, nPay)
      val base = payloadType.fields.indices.map(i =>
        pay.get(i, payloadType.fields(i).dataType)) :+ ranks(j)
      InternalRow.fromSeq(if (withPeers) base :+ peers(j) else base)
    }.toArray[InternalRow])
  }

  override def serialize(buffer: RankKRowsBuffer): Array[Byte] = {
    val rows = buffer.current()
    val bytes = rows.map(_.getBytes)
    val bb = ByteBuffer.allocate(8 + bytes.map(_.length + 4).sum)
    bb.putInt(buffer.k)
    bb.putInt(rows.length)
    bytes.foreach { b => bb.putInt(b.length); bb.put(b) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): RankKRowsBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val kRead = bb.getInt
    val n = bb.getInt
    val buf = mkBuffer(kRead)
    var j = 0
    while (j < n) {
      val len = bb.getInt
      val arr = new Array[Byte](len)
      bb.get(arr)
      val row = new UnsafeRow(2)
      row.pointTo(arr, len)
      buf.addOwned(row)
      j += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): RankKRows =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): RankKRows =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): RankKRows =
    copy(sortKey = newFirst, payload = newSecond, kExpr = newThird)
}

/** Growable (key, payload) store with rank-≤-k compaction: sort, walk tie
  * groups, retain groups whose START index < k (`rank`) or whose GROUP
  * index < k (`dense_rank`); the rank carried per row is start + 1 or
  * group index + 1 respectively. The floor is the key of the last
  * retained group — later candidates strictly past it are dropped
  * without sorting; ties join their group.
  */
final class RankKRowsBuffer(
    initialK: Int, keyFields: Int, ordering: BaseOrdering, dense: Boolean = false) {
  private var kVar = initialK // -1 = dynamic k not yet learned: keep all
  private var rows = new Array[UnsafeRow](
    if (initialK > 0) math.max(4 * initialK, 16) else 16)
  private var n = 0
  private var floor: UnsafeRow = null

  def k: Int = kVar

  /** Learn k once (dynamic mode); later calls are no-ops. */
  def ensureK(v: Int): Unit = if (kVar < 0) kVar = v

  private def keyOf(row: UnsafeRow): InternalRow = row.getStruct(0, keyFields)

  def add(candidate: UnsafeRow): Unit = {
    if (kVar == 0) return
    if (floor != null && ordering.compare(keyOf(candidate), keyOf(floor)) > 0) return
    if (n == rows.length) compact()
    rows(n) = candidate.copy()
    n += 1
  }

  def addOwned(candidate: UnsafeRow): Unit = {
    if (kVar == 0) return
    if (floor != null && ordering.compare(keyOf(candidate), keyOf(floor)) > 0) return
    if (n == rows.length) compact()
    rows(n) = candidate
    n += 1
  }

  def addAll(other: RankKRowsBuffer): Unit = {
    var j = 0
    while (j < other.n) { addOwned(other.rows(j)); j += 1 }
  }

  def current(): Array[UnsafeRow] = {
    compact()
    java.util.Arrays.copyOfRange(rows, 0, n)
  }

  private def sortInPlace(): Unit =
    java.util.Arrays.sort(rows, 0, n, new java.util.Comparator[UnsafeRow] {
      override def compare(a: UnsafeRow, b: UnsafeRow): Int =
        ordering.compare(keyOf(a), keyOf(b))
    })

  /** Sort, drop every tie group whose start index ≥ k, refresh the floor.
    * If nothing can be dropped (one giant boundary tie group), the store
    * grows instead — that group IS the result.
    */
  private def compact(): Unit = {
    sortInPlace()
    // k unset (dynamic mode, nothing learned yet): keep everything
    val kEff = if (kVar < 0) n else kVar
    var cut = 0
    var groups = 0
    while (cut < n && (if (dense) groups < kEff else cut < kEff)) {
      // advance past the whole tie group starting at `cut`
      var end = cut + 1
      while (end < n && ordering.compare(keyOf(rows(end)), keyOf(rows(cut))) == 0) end += 1
      cut = end
      groups += 1
    }
    // cut = end of the last retained group
    java.util.Arrays.fill(rows.asInstanceOf[Array[AnyRef]], cut, n, null)
    n = cut
    val saturated = kVar >= 0 && (if (dense) groups >= kVar else n >= kVar)
    if (n > 0 && saturated) floor = rows(n - 1)
    if (n == rows.length) rows = java.util.Arrays.copyOf(rows, rows.length * 2)
  }

  /** Final (rows ascending, rank per row) with rank ≤ k enforced. */
  def rankedTop(): (Array[UnsafeRow], Array[Int]) = {
    val (out, ranks, _) = rankedTopWithPeers()
    (out, ranks)
  }

  /** [[rankedTop]] plus each row's tie-group size. Retained groups are
    * always whole (the floor admits ties), so the size is the original
    * peer count, not a truncated one.
    */
  def rankedTopWithPeers(): (Array[UnsafeRow], Array[Int], Array[Int]) = {
    compact()
    val out = java.util.Arrays.copyOfRange(rows, 0, n)
    val ranks = new Array[Int](n)
    val peers = new Array[Int](n)
    var i = 0
    var groupStart = 0
    var groupIdx = 0
    while (i < n) {
      if (i > 0 && ordering.compare(keyOf(out(i)), keyOf(out(i - 1))) != 0) {
        var j = groupStart
        while (j < i) { peers(j) = i - groupStart; j += 1 }
        groupStart = i
        groupIdx += 1
      }
      ranks(i) = if (dense) groupIdx + 1 else groupStart + 1
      i += 1
    }
    var j = groupStart
    while (j < n) { peers(j) = n - groupStart; j += 1 }
    (out, ranks, peers)
  }
}
