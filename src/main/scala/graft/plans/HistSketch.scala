package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** Fixed-boundary histogram quantile sketch as a custom
  * TypedImperativeAggregate — the mergeable, bounded-state scale path
  * for percentiles (the KMV treatment applied to quantiles; ref
  * analog: the reference's histogram-style aggregate jobs,
  * src/mapred/org/apache/hadoop/mapred/lib/aggregate/
  * ValueHistogram.java:1, which roll partial histograms up the same
  * way).
  *
  * `hist_sketch(v, width, nbuckets)` buckets each non-null bigint
  * value at `least(nbuckets - 1, greatest(0, v div width))` and keeps
  * one count per bucket: state is exactly `nbuckets` longs per group
  * regardless of input size, merge is element-wise addition, so
  * partial aggregation and shuffle combine like any algebraic
  * aggregate — a 1000-executor roll-up ships KBs, not values.
  *
  * The zero clamp makes truncating (JVM `/`) and flooring (SQL `//`)
  * division agree for every input: they differ only on negative
  * values, where both results are <= 0 and clamp to bucket 0 — the
  * SQL replay must clamp with greatest(0, ...) the same way.
  *
  * Everything is exact integer arithmetic on fixed boundaries, so
  * unlike t-digest/KLL the sketch is DETERMINISTIC given the data —
  * insertion and merge order cannot change the result — and any
  * engine reproduces it bit-for-bit (the DuckDB oracle rebuilds the
  * same histogram with a grouped count — q_sketch_percentiles).
  * Quantile estimates derived downstream (first bucket whose
  * cumulative count reaches ceil(p·n)) carry bounded error `width`,
  * the classic fixed-histogram trade-off.
  *
  * Output: array<bigint> of the nbuckets counts.
  */
case class HistSketch(
    child: Expression,
    width: Long,
    buckets: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(width >= 1, s"hist_sketch width must be >= 1, got $width")
  require(buckets >= 1 && buckets <= 65536,
    s"hist_sketch needs 1 <= nbuckets <= 65536, got $buckets")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hist_sketch"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hist_sketch expects a bigint value column, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](buckets)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val idx = math.min(buckets - 1L, math.max(0L, v.asInstanceOf[Long] / width)).toInt
      buffer(idx) += 1L
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buckets) { buffer(i) += other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any =
    UnsafeArrayData.fromPrimitiveArray(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buckets * 8)
    var i = 0
    while (i < buckets) { bb.putLong(buffer(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val out = new Array[Long](buckets)
    var i = 0
    while (i < buckets) { out(i) = bb.getLong(); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HistSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HistSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
    newChildren: IndexedSeq[Expression]): HistSketch =
    copy(child = newChildren.head)
}

object HistSketch {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[HistSketch].getName, null, "hist_sketch",
    "_FUNC_(v, width, nbuckets) - fixed-boundary histogram sketch: array of bucket counts.",
    "", "", "", "agg_funcs", "4.0.0", "", "built-in")

  /** `hist_sketch(value, width, nbuckets)` — width/nbuckets must be
    * foldable integer literals. */
  val builder: Seq[Expression] => Expression = { children =>
    require(children.length == 3, "hist_sketch takes (value, width, nbuckets)")
    val width = children(1) match {
      case Literal(v: Long, LongType) => v
      case Literal(v: Int, IntegerType) => v.toLong
      case other => throw new IllegalArgumentException(
        s"hist_sketch width must be an integer literal, got $other")
    }
    val buckets = children(2) match {
      case Literal(v: Int, IntegerType) => v
      case other => throw new IllegalArgumentException(
        s"hist_sketch nbuckets must be an int literal, got $other")
    }
    HistSketch(children.head, width, buckets).toAggregateExpression()
  }
}
