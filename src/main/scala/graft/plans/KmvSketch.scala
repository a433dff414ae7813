package graft.plans

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** KMV (k-minimum-values) distinct-count sketch as a custom
  * TypedImperativeAggregate — the bounded-state, mergeable analog of
  * UniqValueCount (ref: src/mapred/org/apache/hadoop/mapred/lib/
  * aggregate/UniqValueCount.java:1) for 100 TB cardinalities
  * (Bar-Yossef et al. 2002; the θ-sketch family).
  *
  * State is the set of the k smallest DISTINCT md5 hex strings of the
  * values — at most k×32 bytes per group regardless of input size, and
  * merge is a set-union + trim, so partial aggregation and shuffle
  * behave exactly like any algebraic aggregate.
  *
  * Unlike HLL the estimator is fully DETERMINISTIC given the data: the
  * k-th smallest hash is a data property, not an implementation
  * artifact, so the estimate `(k-1) * 2^32 / uint32(kth[0:8])` is
  * bitwise reproducible by any engine (the DuckDB oracle reproduces it
  * with a rank window over md5 strings — q_sketch_kmv).
  *
  * Output: struct(est double, kth string) — kth is null (and est is
  * the exact count) when the group has fewer than k distinct values.
  */
case class KmvUniq(
    child: Expression,
    k: Int,
    emitSet: Boolean = false,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[String]] {

  require(k >= 2, s"kmv_uniq requires k >= 2, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType =
    if (emitSet) StructType(Seq(
      StructField("est", DoubleType, nullable = false),
      StructField("kth", StringType, nullable = true),
      StructField("hs", ArrayType(StringType, containsNull = false), nullable = false)))
    else StructType(Seq(
      StructField("est", DoubleType, nullable = false),
      StructField("kth", StringType, nullable = true)))
  override def prettyName: String = if (emitSet) "kmv_set" else "kmv_uniq"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"kmv_uniq expects the md5 hex string column, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): java.util.TreeSet[String] =
    new java.util.TreeSet[String]()

  override def update(
    buffer: java.util.TreeSet[String], input: InternalRow): java.util.TreeSet[String] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[UTF8String].toString
      // the serialized buffer is fixed-stride 32-byte entries; reject
      // anything that is not an md5 hex string rather than silently
      // re-chunking garbage after a shuffle
      if (h.length != 32)
        throw new IllegalArgumentException(
          s"$prettyName expects 32-char md5 hex strings (use md5(col)); got ${h.length} chars")
      // only insert if it could be among the k smallest
      if (buffer.size < k || h < buffer.last()) {
        buffer.add(h)
        if (buffer.size > k) buffer.pollLast()
      }
    }
    buffer
  }

  override def merge(
    buffer: java.util.TreeSet[String], other: java.util.TreeSet[String]): java.util.TreeSet[String] = {
    val it = other.iterator()
    while (it.hasNext) {
      val h = it.next()
      if (buffer.size < k || h < buffer.last()) {
        buffer.add(h)
        if (buffer.size > k) buffer.pollLast()
      }
    }
    buffer
  }

  override def eval(buffer: java.util.TreeSet[String]): Any = {
    val (est, kth): (Double, UTF8String) =
      if (buffer.size < k) (buffer.size.toDouble, null)
      else {
        val kh = buffer.last()
        // uint32 of the first 8 hex chars; integers < 2^32 are exact in
        // double, so the single division below is the only inexact op —
        // the oracle runs the identical sequence
        var v = 0L
        var i = 0
        while (i < 8) {
          v = (v << 4) | Character.digit(kh.charAt(i), 16).toLong
          i += 1
        }
        // an all-zero prefix (probability 2^-32 per group) would divide
        // by zero; clamp to 1 — the same greatest(1, v) convention the
        // SQL set-algebra path and the DuckDB oracles use, so all three
        // stay bitwise consistent even on that input
        (((k - 1).toDouble * 4294967296.0) / math.max(v, 1L).toDouble,
          UTF8String.fromString(kh))
      }
    if (!emitSet) new GenericInternalRow(Array[Any](est, kth))
    else {
      val hs = new Array[Any](buffer.size)
      val it = buffer.iterator()
      var i = 0
      while (it.hasNext) { hs(i) = UTF8String.fromString(it.next()); i += 1 }
      new GenericInternalRow(Array[Any](est, kth,
        new org.apache.spark.sql.catalyst.util.GenericArrayData(hs)))
    }
  }

  override def serialize(buffer: java.util.TreeSet[String]): Array[Byte] = {
    val sb = new java.lang.StringBuilder(buffer.size * 32)
    val it = buffer.iterator()
    while (it.hasNext) sb.append(it.next())
    sb.toString.getBytes(StandardCharsets.US_ASCII)
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[String] = {
    val s = new String(bytes, StandardCharsets.US_ASCII)
    val ts = new java.util.TreeSet[String]()
    var i = 0
    while (i + 32 <= s.length) {
      ts.add(s.substring(i, i + 32))
      i += 32
    }
    ts
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvUniq =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvUniq =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
    newChildren: IndexedSeq[Expression]): KmvUniq =
    copy(child = newChildren.head)
}

object KmvUniq {
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

  val uniqInfo: ExpressionInfo = new ExpressionInfo(
    classOf[KmvUniq].getName, null, "kmv_uniq",
    "_FUNC_(hex_hash, k) - KMV distinct-count sketch: struct(est, kth).",
    "", "", "", "agg_funcs", "4.0.0", "", "built-in")
  val setInfo: ExpressionInfo = new ExpressionInfo(
    classOf[KmvUniq].getName, null, "kmv_set",
    "_FUNC_(hex_hash, k) - KMV sketch with hash set: struct(est, kth, hs).",
    "", "", "", "agg_funcs", "4.0.0", "", "built-in")

  private def mk(name: String, emitSet: Boolean): Seq[Expression] => Expression = {
    children =>
      require(children.length == 2, s"$name takes (hash_column, k)")
      val k = children(1) match {
        case Literal(v: Int, IntegerType) => v
        case other => throw new IllegalArgumentException(
          s"$name k must be an int literal, got $other")
      }
      KmvUniq(children.head, k, emitSet).toAggregateExpression()
  }

  /** `kmv_uniq(hex_hash_col, k)` — k must be a foldable int literal. */
  val builder: Seq[Expression] => Expression = mk("kmv_uniq", emitSet = false)

  /** `kmv_set(hex_hash_col, k)` — also emits the hash set, enabling
    * sketch set algebra (union/intersection) downstream. */
  val setBuilder: Seq[Expression] => Expression = mk("kmv_set", emitSet = true)
}
