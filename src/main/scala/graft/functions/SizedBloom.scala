package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.trees.TernaryLike
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, BooleanType, DataType, DoubleType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Per-group-sized Bloom filter aggregate:
  * `graft_sized_bloom(hash, n, fpp)` builds one Bloom filter per group,
  * sized for THAT group's expected item count `n` (a column — typically a
  * pre-computed per-group row count joined back in), not a global literal.
  *
  * Catalyst's own `BloomFilterAggregate` sizes from a foldable literal, so
  * a per-file manifest built with it must size EVERY file's bloom for the
  * largest file — at 10^5–10^6 lake files that multiplies manifest bytes
  * by the file-size skew. This aggregate defers allocation to the first
  * row of each group and reads the size from the row, so each file pays
  * only for its own rows.
  *
  * Contract: `n` must be constant within a group (it is a per-group
  * statistic by construction); partial buffers of one group then allocate
  * identically-shaped filters and `mergeInPlace` is exact. Like every
  * [[TypedImperativeAggregate]] it partial-aggregates under
  * ObjectHashAggregate: map tasks reduce their slice of a group to one
  * filter before the exchange.
  */
case class SizedBloom(
    hash: Expression,
    nExpr: Expression,
    fppExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SizedBloomBuffer]
  with TernaryLike[Expression] {

  private lazy val fpp: Double = fppExpr match {
    case Literal(v: Double, DoubleType) if v > 0 && v < 1 => v
    case other => throw new IllegalArgumentException(
      s"$prettyName requires a double literal fpp in (0,1), got $other")
  }

  override def first: Expression = hash
  override def second: Expression = nExpr
  override def third: Expression = fppExpr

  override def checkInputDataTypes(): TypeCheckResult =
    if (hash.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs a bigint hash, got ${hash.dataType.catalogString}")
    else if (nExpr.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs a bigint expected-item count, got ${nExpr.dataType.catalogString}")
    else if (!fppExpr.foldable || fppExpr.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(s"$prettyName needs a double literal fpp")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_sized_bloom"

  override def createAggregationBuffer(): SizedBloomBuffer =
    new SizedBloomBuffer(fpp)

  override def update(buffer: SizedBloomBuffer, input: InternalRow): SizedBloomBuffer = {
    val h = hash.eval(input)
    val n = nExpr.eval(input)
    if (h != null && n != null) {
      buffer.add(h.asInstanceOf[Long], n.asInstanceOf[Long])
    }
    buffer
  }

  override def merge(buffer: SizedBloomBuffer, other: SizedBloomBuffer): SizedBloomBuffer = {
    buffer.mergeWith(other)
    buffer
  }

  override def eval(buffer: SizedBloomBuffer): Any = buffer.toBytes

  // partial buffers round-trip exactly: a rowless buffer is empty bytes
  // (never a placeholder filter, whose shape couldn't merge with the
  // group's real one)
  override def serialize(buffer: SizedBloomBuffer): Array[Byte] =
    buffer.toPartialBytes

  override def deserialize(bytes: Array[Byte]): SizedBloomBuffer =
    SizedBloomBuffer.fromBytes(fpp, bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): SizedBloom =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SizedBloom =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): SizedBloom =
    copy(hash = newFirst, nExpr = newSecond, fppExpr = newThird)
}

/** Lazily-allocated Bloom buffer: the filter is created on the first row
  * using that row's expected-item count, so its size is a per-group value.
  */
final class SizedBloomBuffer(fpp: Double) {
  private[functions] var filter: BloomFilter = null

  def add(h: Long, n: Long): Unit = {
    if (filter == null) filter = BloomFilter.create(math.max(n, 1L), fpp)
    filter.putLong(h): Unit
  }

  def mergeWith(other: SizedBloomBuffer): Unit = {
    if (other.filter != null) {
      if (filter == null) filter = other.filter
      else filter.mergeInPlace(other.filter): Unit
    }
  }

  private def write(f: BloomFilter): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    f.writeTo(out)
    out.toByteArray
  }

  /** Final value: a rowless group still yields a real (minimal empty)
    * filter so downstream probes never see null bytes.
    */
  def toBytes: Array[Byte] =
    write(if (filter != null) filter else BloomFilter.create(1L, fpp))

  /** Partial-buffer form: rowless → empty bytes (round-trips to a rowless
    * buffer, which merges as a no-op with any filter shape).
    */
  def toPartialBytes: Array[Byte] =
    if (filter == null) Array.emptyByteArray else write(filter)
}

object SizedBloomBuffer {
  def fromBytes(fpp: Double, bytes: Array[Byte]): SizedBloomBuffer = {
    val buf = new SizedBloomBuffer(fpp)
    if (bytes.nonEmpty) {
      buf.filter = BloomFilter.readFrom(new ByteArrayInputStream(bytes))
    }
    buf
  }
}

object SizedBloom {
  private[functions] val descriptor = (
    FunctionIdentifier("graft_sized_bloom"),
    new ExpressionInfo(classOf[SizedBloom].getName, "graft_sized_bloom"),
    (children: Seq[Expression]) =>
      SizedBloom(children(0), children(1), children(2)): Expression,
  )
}

/** `graft_bloom_any(bloomBytes, hashes)` — true when the serialized Bloom
  * filter might contain ANY of the long hashes. The executor-side probe
  * behind [[graft.operators.Layout.bloomPrunedRead]]: Catalyst's own
  * `BloomFilterMightContain` requires a foldable/subquery filter, so it
  * cannot probe a PER-ROW bloom column (one row per manifest file); this
  * expression deserializes the row's filter and tests the (tiny, literal)
  * hash array against it. Deserialization per row is the right trade on a
  * manifest: one row per data file, probed where the bytes already live —
  * the driver never sees a bloom.
  */
case class BloomMightContainAny(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs serialized bloom bytes, got ${left.dataType.catalogString}")
    else if (!right.dataType.isInstanceOf[ArrayType] ||
      right.dataType.asInstanceOf[ArrayType].elementType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs an array<bigint> of hashes, got ${right.dataType.catalogString}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_any"

  override def nullSafeEval(bloom: Any, hashes: Any): Any =
    BloomProbe.mightContainAny(
      bloom.asInstanceOf[Array[Byte]], hashes.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, h) =>
      s"graft.functions.BloomProbe.mightContainAny($b, $h)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContainAny =
    copy(left = newLeft, right = newRight)
}

/** Static kernel (separate object so codegen sees a Java static call). */
object BloomProbe {
  def mightContainAny(bytes: Array[Byte], hashes: ArrayData): Boolean = {
    val bf = BloomFilter.readFrom(new ByteArrayInputStream(bytes))
    var i = 0
    while (i < hashes.numElements()) {
      if (bf.mightContainLong(hashes.getLong(i))) return true
      i += 1
    }
    false
  }
}

object BloomMightContainAny {
  private[functions] val descriptor = (
    FunctionIdentifier("graft_bloom_any"),
    new ExpressionInfo(classOf[BloomMightContainAny].getName, "graft_bloom_any"),
    (children: Seq[Expression]) =>
      BloomMightContainAny(children(0), children(1)): Expression,
  )
}
