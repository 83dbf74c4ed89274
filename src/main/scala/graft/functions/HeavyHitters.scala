package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitter summary as a native aggregate:
  * `graft_heavy_hitters(item, k)` keeps AT MOST k (item, counter) pairs
  * per group and returns them as `array<struct<item, contagem>>` ordered
  * (contagem DESC, item ASC).
  *
  * Guarantees (Misra & Gries 1982; merge per Agarwal et al. 2012,
  * "Mergeable Summaries"):
  *   - every item with true frequency > N/(k+1) IS retained;
  *   - a retained counter NEVER overcounts, and undercounts by at most
  *     N/(k+1) (N = rows aggregated into the summary, decrement mass
  *     adds across merges).
  *
  * This completes the engine's mergeable-sketch family — HLL for
  * distincts (row 108), count-min for point frequency (row 149), MG for
  * the frequent-item SET: exact heavy hitters (row 70) hold the full
  * gram table in the aggregation; MG holds k counters NO MATTER the
  * vocabulary, which is what a 100 TB boilerplate/contamination monitor
  * can afford. The COUNTERS are order-dependent (any MG is), so this is
  * a spec-only surface like the other sketches: the retained SET and
  * error bounds are the contract, not bit-stable counts.
  *
  * Update cost is amortized O(1): an overflow decrement removes k+1
  * units of counted mass (k counters + the unstored arrival), so at most
  * N/(k+1) overfull events occur, each O(k). Runs under
  * ObjectHashAggregate with map-side partials like the TopK aggregates.
  */
case class HeavyHitters(
    item: Expression,
    kExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MgBuffer]
  with BinaryLike[Expression] {

  // eval() after the foldable check, not a Literal pattern-match: a
  // foldable non-Literal (2+3, CAST('5' AS INT)) passes analysis and a
  // Literal-only match would then throw on the EXECUTORS at buffer
  // creation instead of failing analysis on the driver
  private lazy val k: Int = kExpr.eval() match {
    case v: Int if v > 0 => v
    case other => throw new IllegalArgumentException(
      s"$prettyName requires a positive integer k, got $other")
  }

  override def left: Expression = item
  override def right: Expression = kExpr

  override def checkInputDataTypes(): TypeCheckResult =
    if (item.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs a string item, got ${item.dataType.catalogString}")
    else if (!kExpr.foldable || kExpr.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure(s"$prettyName needs an integer literal k")
    else kExpr.eval() match {
      case v: Int if v > 0 => TypeCheckResult.TypeCheckSuccess
      case v => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs k > 0, got $v")
    }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("contagem", LongType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = false
  override def prettyName: String = "graft_heavy_hitters"

  override def createAggregationBuffer(): MgBuffer = new MgBuffer(k)

  override def update(buffer: MgBuffer, input: InternalRow): MgBuffer = {
    val v = item.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[UTF8String].toString, 1L)
    buffer
  }

  override def merge(buffer: MgBuffer, other: MgBuffer): MgBuffer = {
    buffer.mergeIn(other)
    buffer
  }

  override def eval(buffer: MgBuffer): Any =
    new GenericArrayData(buffer.sorted.map { case (it, c) =>
      InternalRow(UTF8String.fromString(it), c)
    })

  override def serialize(buffer: MgBuffer): Array[Byte] = {
    val entries = buffer.sorted
    val bytes = entries.map(_._1.getBytes(StandardCharsets.UTF_8))
    val bb = ByteBuffer.allocate(
      4 + bytes.map(_.length + 12).sum)
    bb.putInt(entries.length)
    entries.zip(bytes).foreach { case ((_, c), b) =>
      bb.putInt(b.length); bb.put(b); bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MgBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new MgBuffer(k)
    var j = 0
    while (j < n) {
      val len = bb.getInt
      val b = new Array[Byte](len)
      bb.get(b)
      buf.add(new String(b, StandardCharsets.UTF_8), bb.getLong)
      j += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HeavyHitters =
    copy(item = newLeft, kExpr = newRight)
}

/** k-counter Misra–Gries store. `add(item, w)` counts a weighted arrival
  * (w > 0); overflow subtracts the capacity-restoring amount from every
  * counter and discards the remainder of the arrival, which is exactly
  * the weighted MG step. `mergeIn` adds the other summary's counters
  * (each an underestimate — addition preserves that) then trims back to
  * k by subtracting the (k+1)-th largest counter, the Agarwal et al.
  * mergeable-summaries rule.
  */
final class MgBuffer(val k: Int) {
  private val counts = new java.util.HashMap[String, java.lang.Long]()

  def add(item: String, w: Long): Unit = {
    val cur = counts.get(item)
    if (cur != null) counts.put(item, cur + w)
    else if (counts.size < k) counts.put(item, w)
    else {
      // weighted decrement: remove min(w, current minimum) from all —
      // repeat until the arrival is absorbed or a slot frees
      var remaining = w
      while (remaining > 0 && counts.size >= k && !counts.containsKey(item)) {
        var minC = Long.MaxValue
        val it0 = counts.values().iterator()
        while (it0.hasNext) minC = math.min(minC, it0.next())
        val dec = math.min(remaining, minC)
        val it = counts.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          val nv = e.getValue - dec
          if (nv <= 0) it.remove() else e.setValue(nv)
        }
        remaining -= dec
      }
      if (remaining > 0) {
        if (counts.size < k) counts.put(item, remaining)
        // else: arrival fully absorbed by decrements (classic MG drop)
      }
    }
  }

  def mergeIn(other: MgBuffer): Unit = {
    val it = other.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = counts.get(e.getKey)
      counts.put(e.getKey,
        if (cur == null) e.getValue else cur + e.getValue)
    }
    if (counts.size > k) {
      // subtract the (k+1)-th largest counter from all, keep positive
      val vals = new Array[Long](counts.size)
      var j = 0
      val vi = counts.values().iterator()
      while (vi.hasNext) { vals(j) = vi.next(); j += 1 }
      java.util.Arrays.sort(vals)
      val cut = vals(vals.length - (k + 1)) // (k+1)-th largest
      val ei = counts.entrySet().iterator()
      while (ei.hasNext) {
        val e = ei.next()
        val nv = e.getValue - cut
        if (nv <= 0) ei.remove() else e.setValue(nv)
      }
    }
  }

  /** Counters ordered (contagem DESC, item ASC). */
  def sorted: Array[(String, Long)] = {
    val arr = new Array[(String, Long)](counts.size)
    var j = 0
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      arr(j) = (e.getKey, e.getValue.longValue())
      j += 1
    }
    java.util.Arrays.sort(arr, new java.util.Comparator[(String, Long)] {
      override def compare(a: (String, Long), b: (String, Long)): Int = {
        val c = java.lang.Long.compare(b._2, a._2)
        if (c != 0) c else a._1.compareTo(b._1)
      }
    })
    arr
  }
}

object HeavyHitters {
  private[functions] val descriptor = (
    FunctionIdentifier("graft_heavy_hitters"),
    new ExpressionInfo(classOf[HeavyHitters].getName, "graft_heavy_hitters"),
    (children: Seq[Expression]) =>
      HeavyHitters(children(0), children(1)): Expression,
  )
}
