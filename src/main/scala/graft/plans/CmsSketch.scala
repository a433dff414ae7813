package graft.plans

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** Count-min sketch as a custom TypedImperativeAggregate — the
  * bounded-state frequency table (Cormode & Muthukrishnan 2005) behind
  * heavy-hitter detection in training-data pipelines (boilerplate
  * phrases, dominant hosts) at cardinalities where an exact groupBy
  * count table no longer fits.
  *
  * `cms_sketch(value, depth, width)` keeps depth×width counters; each
  * value increments one cell per row, the cell being
  * `uint32(md5("r:" || value)[0:8]) % width`. State is depth×width
  * longs per group regardless of input, merge is element-wise
  * addition — partial aggregation and shuffle behave like any
  * algebraic aggregate. A point estimate (min over rows of the
  * value's cells) never underestimates and overestimates only by
  * collision mass.
  *
  * Unlike library CMS implementations (Spark's built-in
  * count_min_sketch hashes with implementation-defined seeds), the
  * cells here are pure md5 arithmetic, so the whole sketch is
  * DETERMINISTIC given the data and bitwise reproducible by any
  * engine: the DuckDB oracle rebuilds the identical counter table
  * with a grouped count and reads the same cells (q_sketch_cms).
  *
  * Output: array<bigint>, row-major (cell r·width + c).
  */
case class CmsSketch(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(depth >= 1 && depth <= 16, s"cms_sketch needs 1 <= depth <= 16, got $depth")
  require(width >= 2 && width <= (1 << 20),
    s"cms_sketch needs 2 <= width <= 2^20, got $width")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "cms_sketch"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cms_sketch expects a string value column, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.toString
      var r = 0
      while (r < depth) {
        buffer(r * width + CmsSketch.cell(r, s, width)) += 1L
        r += 1
      }
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buffer.length) { buffer(i) += other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any =
    UnsafeArrayData.fromPrimitiveArray(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buffer.length * 8)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val out = new Array[Long](depth * width)
    var i = 0
    while (i < out.length) { out(i) = bb.getLong(); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
    newChildren: IndexedSeq[Expression]): CmsSketch =
    copy(child = newChildren.head)
}

object CmsSketch {

  /** Row-r cell of `value`: uint32 of the first 8 md5 hex chars of
    * "r:value", mod width — the derivation the SQL sides replay
    * (`cellSql`). */
  def cell(r: Int, value: String, width: Int): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$r:$value".getBytes(StandardCharsets.UTF_8))
    var v = 0L
    var i = 0
    while (i < 4) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v % width).toInt
  }

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[CmsSketch].getName, null, "cms_sketch",
    "_FUNC_(v, depth, width) - deterministic count-min sketch: row-major counter array.",
    "", "", "", "agg_funcs", "4.0.0", "", "built-in")

  val builder: Seq[Expression] => Expression = { children =>
    require(children.length == 3, "cms_sketch takes (value, depth, width)")
    def intLit(e: Expression, what: String): Int = e match {
      case Literal(v: Int, IntegerType) => v
      case other => throw new IllegalArgumentException(
        s"cms_sketch $what must be an int literal, got $other")
    }
    CmsSketch(children.head, intLit(children(1), "depth"),
      intLit(children(2), "width")).toAggregateExpression()
  }
}
