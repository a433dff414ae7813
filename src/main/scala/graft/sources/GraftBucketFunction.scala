package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Murmur3HashFunction
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The `bucket(n, col)` V2 function graft-tx's hash-bucketed layout
  * speaks: `pmod(murmur3_hash(col), n)` with Spark's own seed-42
  * Murmur3 — bitwise the engine's `hash()` SQL function, which is
  * exactly what [[TxTable.appendBucketedBy]] routes rows with, so the
  * write layout and the function the storage-partitioned-join planner
  * resolves can never disagree. Served by [[GraftCatalog]]'s
  * FunctionCatalog face; Catalyst binds it when a bucketed scan
  * reports `KeyGroupedPartitioning(bucket(n, col))`, compares both
  * join sides by its canonical name (type-qualified: an INT key and a
  * LONG key hash differently, so they must never report compatible),
  * and can evaluate it to shuffle a NON-bucketed join side into the
  * bucketed side's layout (`spark.sql.sources.v2.bucketing.shuffle
  * .enabled`) — the one-sided-shuffle join that keeps the 100 TB fact
  * table in place. (ref analog: the warehouse's "same partitioner,
  * same number of partitions" join contract, src/mapred/org/apache/
  * hadoop/mapred/join/CompositeInputFormat.java:1.) */
object GraftBucketFunction extends UnboundFunction {

  override def name(): String = "bucket"

  override def description(): String =
    "bucket(numBuckets, col) -> pmod(murmur3_hash(col), numBuckets); " +
      "the graft-tx hash-bucket routing function (int/long/short/" +
      "date/string keys)"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 2 &&
      inputType.fields(0).dataType == IntegerType,
      s"graft bucket(n, col) expects (int, col), got $inputType")
    inputType.fields(1).dataType match {
      case dt @ (LongType | IntegerType | ShortType | DateType |
        StringType) => new GraftBucketBound(dt)
      case other => throw new UnsupportedOperationException(
        s"graft bucket(n, col): unsupported key type $other " +
          "(int/long/short/date/string)")
    }
  }

  /** Bucket id of an EXTERNAL (JVM) key value — the runtime-pruning
    * helper: coerces to the column's internal representation first so
    * the hash matches what the write path computed over the rows. */
  def idOf(value: Any, dt: DataType, numBuckets: Int): Int = {
    val internal: Any = value match {
      case null => null
      case s: String => UTF8String.fromString(s)
      case u: UTF8String => u
      case d: java.sql.Date =>
        org.apache.spark.sql.catalyst.util.DateTimeUtils.fromJavaDate(d)
      case d: java.time.LocalDate => d.toEpochDay.toInt
      case n: Number => dt match {
        case LongType => n.longValue
        case IntegerType | DateType => n.intValue
        case ShortType => n.shortValue
        case _ => n
      }
      case x => x
    }
    hashToId(internal, dt, numBuckets)
  }

  private[sources] def hashToId(internal: Any, dt: DataType,
    numBuckets: Int): Int = {
    // a NULL key keeps the seed — exactly the hash() expression's
    // null semantics, so null rows route deterministically too
    val h =
      if (internal == null) 42
      else Murmur3HashFunction.hash(internal, dt, 42L).toInt
    ((h % numBuckets) + numBuckets) % numBuckets
  }
}

/** One key type's bound form. The canonical name is TYPE-QUALIFIED:
  * murmur3 of an int and of a long differ even for equal values, so
  * two scans are bucket-compatible only when their key types match. */
class GraftBucketBound(dt: DataType) extends ScalarFunction[Integer] {
  override def inputTypes(): Array[DataType] = Array(IntegerType, dt)
  override def resultType(): DataType = IntegerType
  override def isResultNullable: Boolean = false
  override def name(): String = "bucket"
  override def canonicalName(): String = s"graft.bucket(${dt.typeName})"
  override def produceResult(input: InternalRow): Integer = {
    val n = input.getInt(0)
    GraftBucketFunction.hashToId(input.get(1, dt), dt, n)
  }
}
