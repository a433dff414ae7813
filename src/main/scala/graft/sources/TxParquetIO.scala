package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.{ParquetReader, ParquetWriter}
import org.apache.parquet.hadoop.api.{InitContext, ReadSupport, WriteSupport}
import org.apache.parquet.hadoop.api.ReadSupport.ReadContext
import org.apache.parquet.hadoop.api.WriteSupport.WriteContext
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.parquet.io.api.{Binary, Converter, GroupConverter, PrimitiveConverter, RecordConsumer, RecordMaterializer}
import org.apache.parquet.schema.{GroupType, LogicalTypeAnnotation, MessageType, PrimitiveType, Type, Types}
import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.parquet.schema.Type.Repetition
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Executor-side parquet ↔ `InternalRow` without a Spark plan — the
  * record-level IO a DataSourceV2 `PartitionReader` / `DataWriter`
  * needs (those interfaces hand rows one at a time; there is no
  * DataFrame in an executor). Built on parquet-mr's PUBLIC
  * `ReadSupport`/`WriteSupport` API only — no Spark-internal parquet
  * classes — so the graft-tx streaming faces stay inside the
  * supported connector surface.
  *
  * Scope: the flat relational schemas a [[TxTable]] holds — all
  * primitive Spark types, strings, binary, decimals, dates,
  * timestamps (reading INT64 millis/micros/nanos AND legacy INT96),
  * plus one-level arrays of those. Nested structs/maps fail loudly:
  * the table format never writes them, and a clear error beats a
  * silently-wrong decode. */
private[sources] object TxParquetIO {

  // ---------------------------------------------------------- schema

  private def parquetTypeOf(f: StructField): Type = f.dataType match {
    case ArrayType(elem, _) =>
      Types.optionalGroup().as(LogicalTypeAnnotation.listType())
        .addField(Types.repeatedGroup()
          .addField(primitiveOf("element", elem)).named("list"))
        .named(f.name)
    case dt => primitiveOf(f.name, dt)
  }

  private def primitiveOf(name: String, dt: DataType): Type = {
    def p(tn: PrimitiveTypeName) = Types.primitive(tn, Repetition.OPTIONAL)
    dt match {
      case BooleanType => p(PrimitiveTypeName.BOOLEAN).named(name)
      case ByteType => p(PrimitiveTypeName.INT32)
        .as(LogicalTypeAnnotation.intType(8, true)).named(name)
      case ShortType => p(PrimitiveTypeName.INT32)
        .as(LogicalTypeAnnotation.intType(16, true)).named(name)
      case IntegerType => p(PrimitiveTypeName.INT32).named(name)
      case LongType => p(PrimitiveTypeName.INT64).named(name)
      case FloatType => p(PrimitiveTypeName.FLOAT).named(name)
      case DoubleType => p(PrimitiveTypeName.DOUBLE).named(name)
      case StringType => p(PrimitiveTypeName.BINARY)
        .as(LogicalTypeAnnotation.stringType()).named(name)
      case BinaryType => p(PrimitiveTypeName.BINARY).named(name)
      case DateType => p(PrimitiveTypeName.INT32)
        .as(LogicalTypeAnnotation.dateType()).named(name)
      case TimestampType => p(PrimitiveTypeName.INT64)
        .as(LogicalTypeAnnotation.timestampType(true, TimeUnit.MICROS))
        .named(name)
      case TimestampNTZType => p(PrimitiveTypeName.INT64)
        .as(LogicalTypeAnnotation.timestampType(false, TimeUnit.MICROS))
        .named(name)
      case d: DecimalType if d.precision <= 18 =>
        p(PrimitiveTypeName.INT64)
          .as(LogicalTypeAnnotation.decimalType(d.scale, d.precision))
          .named(name)
      case d: DecimalType =>
        Types.primitive(PrimitiveTypeName.FIXED_LEN_BYTE_ARRAY,
          Repetition.OPTIONAL).length(16)
          .as(LogicalTypeAnnotation.decimalType(d.scale, d.precision))
          .named(name)
      case other => throw new IllegalArgumentException(
        s"graft-tx streaming: unsupported type $other for column '$name' " +
          "(flat relational columns and primitive arrays only)")
    }
  }

  private[sources] def messageTypeOf(schema: StructType): MessageType = {
    val b = Types.buildMessage()
    schema.fields.foreach(f => b.addField(parquetTypeOf(f)))
    b.named("graft_row")
  }

  // ---------------------------------------------------------- reading

  /** Primitive parquet value → Catalyst value, steered by the SPARK
    * type (the parquet annotation only disambiguates timestamp units,
    * INT96 and decimal storage). */
  private def valueConverter(dt: DataType, pt: PrimitiveType,
    set: Any => Unit): PrimitiveConverter = new PrimitiveConverter {
    override def addBoolean(v: Boolean): Unit = set(v)
    override def addInt(v: Int): Unit = dt match {
      case ByteType => set(v.toByte)
      case ShortType => set(v.toShort)
      case IntegerType | DateType => set(v)
      case LongType => set(v.toLong)
      case d: DecimalType => set(Decimal(v.toLong, d.precision, d.scale))
      case DoubleType => set(v.toDouble)
      case other => throw typeClash(other, pt)
    }
    override def addLong(v: Long): Unit = dt match {
      case LongType => set(v)
      case TimestampType | TimestampNTZType =>
        set(timestampUnit(pt) match {
          case TimeUnit.MILLIS => Math.multiplyExact(v, 1000L)
          case TimeUnit.NANOS => Math.floorDiv(v, 1000L)
          case _ => v // micros
        })
      case d: DecimalType => set(Decimal(v, d.precision, d.scale))
      case DoubleType => set(v.toDouble)
      case other => throw typeClash(other, pt)
    }
    override def addFloat(v: Float): Unit = dt match {
      case FloatType => set(v)
      case DoubleType => set(v.toDouble)
      case other => throw typeClash(other, pt)
    }
    override def addDouble(v: Double): Unit = dt match {
      case DoubleType => set(v)
      case other => throw typeClash(other, pt)
    }
    override def addBinary(b: Binary): Unit = dt match {
      case StringType => set(UTF8String.fromBytes(b.getBytes))
      case BinaryType => set(b.getBytes)
      case d: DecimalType => set(Decimal(BigDecimal(
        new java.math.BigDecimal(new java.math.BigInteger(b.getBytes),
          d.scale)), d.precision, d.scale))
      case TimestampType | TimestampNTZType
        if pt.getPrimitiveTypeName == PrimitiveTypeName.INT96 =>
        // legacy INT96: 8-byte little-endian nanos-of-day then 4-byte
        // little-endian julian day (epoch julian day = 2440588)
        val bb = b.toByteBuffer.order(java.nio.ByteOrder.LITTLE_ENDIAN)
        val nanos = bb.getLong
        val julian = bb.getInt
        set((julian - 2440588L) * 86400000000L + nanos / 1000L)
      case other => throw typeClash(other, pt)
    }
  }

  private def timestampUnit(pt: PrimitiveType): TimeUnit =
    pt.getLogicalTypeAnnotation match {
      case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation => t.getUnit
      case _ => TimeUnit.MICROS
    }

  private def typeClash(dt: DataType, pt: PrimitiveType) =
    new IllegalArgumentException(
      s"graft-tx streaming: parquet ${pt.getPrimitiveTypeName} value " +
        s"cannot fill a $dt column '${pt.getName}'")

  private def converterFor(f: StructField, parquetType: Type,
    set: Any => Unit): Converter = f.dataType match {
    case ArrayType(elem, _) =>
      require(!parquetType.isPrimitive,
        s"graft-tx streaming: column '${f.name}' is an array in the " +
          "table schema but primitive in the file")
      val repeated = parquetType.asGroupType().getType(0)
      new GroupConverter {
        private val buf = scala.collection.mutable.ArrayBuffer.empty[Any]
        private val repConv: Converter =
          if (repeated.isPrimitive) // legacy 2-level list
            valueConverter(elem, repeated.asPrimitiveType(), v => buf += v)
          else new GroupConverter { // standard 3-level list/element
            private var cur: Any = null
            private val inner = valueConverter(elem,
              repeated.asGroupType().getType(0).asPrimitiveType(),
              v => cur = v)
            override def getConverter(i: Int): Converter = inner
            override def start(): Unit = cur = null
            override def end(): Unit = buf += cur
          }
        override def getConverter(i: Int): Converter = repConv
        override def start(): Unit = buf.clear()
        override def end(): Unit = set(new GenericArrayData(buf.toArray))
      }
    case dt =>
      require(parquetType.isPrimitive,
        s"graft-tx streaming: column '${f.name}' is nested in the file " +
          s"but $dt in the table schema")
      valueConverter(dt, parquetType.asPrimitiveType(), set)
  }

  /** ReadSupport materializing exactly `fields` (by name, in order)
    * into `GenericInternalRow`s. Missing columns fail loudly — the
    * same contract as the batch feed's strict `unionByName` — EXCEPT
    * names in `nullIfMissing` (declared ALTER TABLE ADD COLUMNS
    * columns a pre-ADD file legitimately lacks): those materialize as
    * NULL, the same null-fill the batch read path applies. */
  private class RowReadSupport(fields: StructType,
    nullIfMissing: Set[String],
    defaults: Map[String, Any] = Map.empty)
    extends ReadSupport[InternalRow] {

    override def init(context: InitContext): ReadContext = {
      val fileSchema = context.getFileSchema
      val projected = fields.fields.flatMap { f =>
        val idx = (0 until fileSchema.getFieldCount).find(i =>
          fileSchema.getType(i).getName.equalsIgnoreCase(f.name))
        if (idx.isEmpty && !nullIfMissing.contains(f.name))
          throw new IllegalArgumentException(
            s"graft-tx streaming: column '${f.name}' absent from data " +
              s"file (file has ${fileSchema.getFields}); the change feed " +
              "requires every feed column in every commit")
        idx.map(fileSchema.getType)
      }
      new ReadContext(new MessageType("graft_row", projected.toSeq: _*))
    }

    override def prepareForRead(conf: Configuration,
      meta: java.util.Map[String, String], fileSchema: MessageType,
      readContext: ReadContext): RecordMaterializer[InternalRow] = {
      val requested = readContext.getRequestedSchema
      // field index → its slot in the requested (projected) schema;
      // fields absent there stay NULL in every record
      val present: Seq[(StructField, Int, Int)] = {
        var j = 0
        fields.fields.toSeq.zipWithIndex.flatMap { case (f, i) =>
          val inReq = (0 until requested.getFieldCount).exists(k =>
            requested.getType(k).getName.equalsIgnoreCase(f.name))
          if (inReq) { val slot = j; j += 1; Some((f, i, slot)) }
          else None
        }
      }
      // slots the file cannot serve whose declared column carries a
      // DEFAULT: every record fills that internal value (pre-ADD rows
      // read the default, not NULL — and an unrelated DML rewrite
      // re-lands the default instead of corrupting it to NULL)
      val missingDefaults: Seq[(Int, Any)] = {
        val presentIdx = present.map(_._2).toSet
        fields.fields.toSeq.zipWithIndex.collect {
          case (f, i) if !presentIdx.contains(i) &&
            defaults.contains(f.name) => i -> defaults(f.name)
        }
      }
      new RecordMaterializer[InternalRow] {
        private val values = new Array[Any](fields.length)
        private val root: GroupConverter = new GroupConverter {
          private val converters = new Array[Converter](present.length)
          present.foreach { case (f, i, slot) =>
            converters(slot) =
              converterFor(f, requested.getType(slot), v => values(i) = v)
          }
          override def getConverter(i: Int): Converter = converters(i)
          override def start(): Unit = {
            java.util.Arrays.fill(values.asInstanceOf[Array[AnyRef]], null)
            missingDefaults.foreach { case (i, v) => values(i) = v }
          }
          override def end(): Unit = ()
        }
        override def getCurrentRecord: InternalRow =
          new GenericInternalRow(values.clone())
        override def getRootConverter: GroupConverter = root
      }
    }
  }

  /** `filter` engages parquet-mr's own two-level skipping: row groups
    * whose column statistics (or dictionary/bloom) provably exclude
    * the predicate are never read, and surviving groups apply it
    * record-level before materialization (FilterCompat — the same
    * public API Spark's file source uses). Callers must keep every
    * predicate column in `fields` (parquet binds record filters to
    * the requested projection) and must RE-EVALUATE the predicate
    * above: the pushed form is allowed to over-keep (e.g. NULL rows
    * under a negation), never to over-drop. */
  def reader(path: Path, fields: StructType, conf: Configuration,
    filter: Option[org.apache.parquet.filter2.predicate.FilterPredicate]
      = None, nullIfMissing: Set[String] = Set.empty,
    defaults: Map[String, Any] = Map.empty)
    : ParquetReader[InternalRow] = {
    val b = ParquetReader.builder(
      new RowReadSupport(fields, nullIfMissing, defaults), path)
      .withConf(conf)
    filter.fold(b)(f => b.withFilter(
      org.apache.parquet.filter2.compat.FilterCompat.get(f))).build()
  }

  // ---------------------------------------------------------- writing

  private class RowWriteSupport(schema: StructType)
    extends WriteSupport[InternalRow] {
    private var rc: RecordConsumer = _
    private val message = messageTypeOf(schema)

    override def init(conf: Configuration): WriteContext =
      new WriteContext(message, java.util.Collections.emptyMap[String, String])

    override def prepareForWrite(consumer: RecordConsumer): Unit =
      rc = consumer

    // SpecializedGetters is the shared accessor face of InternalRow
    // and ArrayData, so one scalar write path serves both rows and
    // array elements
    private def writeValue(dt: DataType,
      row: org.apache.spark.sql.catalyst.expressions.SpecializedGetters,
      i: Int): Unit =
      dt match {
        case BooleanType => rc.addBoolean(row.getBoolean(i))
        case ByteType => rc.addInteger(row.getByte(i).toInt)
        case ShortType => rc.addInteger(row.getShort(i).toInt)
        case IntegerType | DateType => rc.addInteger(row.getInt(i))
        case LongType | TimestampType | TimestampNTZType =>
          rc.addLong(row.getLong(i))
        case FloatType => rc.addFloat(row.getFloat(i))
        case DoubleType => rc.addDouble(row.getDouble(i))
        case StringType =>
          rc.addBinary(Binary.fromReusedByteArray(row.getUTF8String(i).getBytes))
        case BinaryType =>
          rc.addBinary(Binary.fromReusedByteArray(row.getBinary(i)))
        case d: DecimalType if d.precision <= 18 =>
          rc.addLong(row.getDecimal(i, d.precision, d.scale).toUnscaledLong)
        case d: DecimalType =>
          val unscaled = row.getDecimal(i, d.precision, d.scale)
            .toJavaBigDecimal.unscaledValue.toByteArray
          val out = new Array[Byte](16)
          // sign-extend into the fixed 16-byte big-endian buffer
          val sign: Byte = if (unscaled.head < 0) -1 else 0
          java.util.Arrays.fill(out, sign)
          System.arraycopy(unscaled, 0, out, 16 - unscaled.length,
            unscaled.length)
          rc.addBinary(Binary.fromConstantByteArray(out))
        case other => throw new IllegalArgumentException(
          s"graft-tx streaming: unsupported element type $other")
      }

    override def write(row: InternalRow): Unit = {
      rc.startMessage()
      schema.fields.zipWithIndex.foreach { case (f, i) =>
        if (!row.isNullAt(i)) {
          rc.startField(f.name, i)
          f.dataType match {
            case ArrayType(elem, _) =>
              val arr = row.getArray(i)
              rc.startGroup()
              if (arr.numElements() > 0) {
                rc.startField("list", 0)
                (0 until arr.numElements()).foreach { j =>
                  rc.startGroup()
                  if (!arr.isNullAt(j)) {
                    rc.startField("element", 0)
                    writeValue(elem, arr, j)
                    rc.endField("element", 0)
                  }
                  rc.endGroup()
                }
                rc.endField("list", 0)
              }
              rc.endGroup()
            case dt => writeValue(dt, row, i)
          }
          rc.endField(f.name, i)
        }
      }
      rc.endMessage()
    }
  }

  private class RowWriterBuilder(path: Path, schema: StructType)
    extends ParquetWriter.Builder[InternalRow, RowWriterBuilder](path) {
    override def self(): RowWriterBuilder = this
    override def getWriteSupport(conf: Configuration): WriteSupport[InternalRow] =
      new RowWriteSupport(schema)
  }

  def writer(path: Path, schema: StructType,
    conf: Configuration): ParquetWriter[InternalRow] =
    new RowWriterBuilder(path, schema)
      .withConf(conf)
      .withCompressionCodec(CompressionCodecName.SNAPPY)
      .build()
}
