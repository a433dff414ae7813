package graft.plans

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, GenericInternalRow, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries frequent-items summary as a custom
  * TypedImperativeAggregate — the bounded-state heavy-hitter detector
  * (Misra & Gries 1982; mergeable form: Agarwal et al., "Mergeable
  * Summaries", PODS 2012). The streaming/large-scale replacement for
  * an exact word-count table when only the heavy tail matters:
  * boilerplate phrases, dominant hosts, hot join keys.
  *
  * `mg_topk(value, k)` keeps AT MOST k (item, counter) pairs per
  * aggregation buffer regardless of input cardinality:
  *  - update: hit → +1; miss with room → insert 1; miss when full →
  *    decrement ALL counters (dropping zeros) — the classic rule;
  *  - merge: sum counters of the union; if over k entries, subtract
  *    the (k+1)-th largest counter from all and keep positives —
  *    exactly the PODS'12 mergeable reduction, so partial aggregation
  *    (Catalyst's map-side combine) ships ≤ k pairs per group through
  *    the shuffle.
  *
  * Guarantees (tested in SketchSpec): for every item,
  * `est(x) ≤ freq(x)` and `freq(x) − est(x) ≤ n/(k+1)`; hence every
  * item with `freq > n/(k+1)` is IN the summary. Estimates (unlike
  * the KMV/CMS/hist sketches here) are arrival-order-dependent, so
  * this one is guarantee-tested rather than oracle-hashed — same
  * contract as the DataSketches HLL line.
  *
  * Output: array<struct<item string, est bigint>>, est desc / item asc.
  */
case class MgTopK(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(k >= 1 && k <= 65536, s"mg_topk needs 1 <= k <= 65536, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("est", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "mg_topk"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"mg_topk expects a string value column, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buffer: mutable.HashMap[String, Long],
    input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.toString
      buffer.get(s) match {
        case Some(c) => buffer.update(s, c + 1)
        case None if buffer.size < k => buffer.update(s, 1L)
        case None =>
          // decrement-all: amortized O(1) per row — each decrement
          // cancels k+1 prior increments
          val snapshot = buffer.toList
          snapshot.foreach { case (key, c) =>
            if (c - 1 <= 0) buffer.remove(key) else buffer.update(key, c - 1)
          }
      }
    }
    buffer
  }

  override def merge(buffer: mutable.HashMap[String, Long],
    other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (s, c) =>
      buffer.update(s, buffer.getOrElse(s, 0L) + c)
    }
    if (buffer.size > k) {
      // subtract the (k+1)-th largest counter, keep positives
      val counts = buffer.values.toArray
      java.util.Arrays.sort(counts)
      val cut = counts(counts.length - k - 1)
      val snapshot = buffer.toList
      snapshot.foreach { case (key, c) =>
        if (c - cut <= 0) buffer.remove(key) else buffer.update(key, c - cut)
      }
    }
    buffer
  }

  override def eval(buffer: mutable.HashMap[String, Long]): Any = {
    val sorted = buffer.toSeq.sortBy { case (item, est) => (-est, item) }
    new GenericArrayData(sorted.map { case (item, est) =>
      new GenericInternalRow(Array[Any](UTF8String.fromString(item), est))
    }.toArray[Any])
  }

  override def serialize(buffer: mutable.HashMap[String, Long]): Array[Byte] = {
    val entries = buffer.toSeq.map { case (s, c) =>
      (s.getBytes(StandardCharsets.UTF_8), c)
    }
    val bb = ByteBuffer.allocate(4 + entries.map(_._1.length + 12).sum)
    bb.putInt(entries.size)
    entries.foreach { case (b, c) =>
      bb.putInt(b.length); bb.put(b); bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val out = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val b = new Array[Byte](len)
      bb.get(b)
      out.update(new String(b, StandardCharsets.UTF_8), bb.getLong)
      i += 1
    }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MgTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MgTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
    newChildren: IndexedSeq[Expression]): MgTopK =
    copy(child = newChildren.head)
}

object MgTopK {

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[MgTopK].getName, null, "mg_topk",
    "_FUNC_(v, k) - Misra-Gries frequent-items summary: <= k (item, est) pairs, " +
      "est <= freq <= est + n/(k+1).",
    "", "", "", "agg_funcs", "4.0.0", "", "built-in")

  val builder: Seq[Expression] => Expression = { children =>
    require(children.length == 2, "mg_topk takes (value, k)")
    val k = children(1) match {
      case Literal(v: Int, IntegerType) => v
      case other => throw new IllegalArgumentException(
        s"mg_topk k must be an int literal, got $other")
    }
    MgTopK(children.head, k).toAggregateExpression()
  }
}
