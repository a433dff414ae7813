package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.hadoop.io.{SequenceFile, Text}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.SparkSession
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

/** DataSourceV2 SequenceFile reader (ref: src/core/org/apache/hadoop/
  * io/SequenceFile.java:1): `spark.read.format("graft-seqfile")
  * .load(path)` → (key string, value string) rows.
  *
  * The V2 surface is what makes the format a first-class citizen of
  * the engine: schema inference, one InputPartition per file (a
  * SequenceFile's block-compressed records are addressable from sync
  * markers, so finer splits would follow the same pattern Hadoop's
  * SequenceFileInputFormat uses — per-file is the right granularity
  * for the warehouse's many-files layout), and executor-side readers
  * that stream records without materializing the file.
  *
  * Text keys/values (the SeqFiles.write contract). The Hadoop
  * Configuration travels to executors via SerializableConfiguration,
  * so cluster credentials/filesystem settings apply.
  */
class SeqFileSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-seqfile"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SeqFileSource.schema

  override def getTable(
    schema: StructType, partitioning: Array[Transform],
    properties: util.Map[String, String]): Table =
    new SeqFileTable(properties.asScala.get("path").orElse(
      Option(properties.get("paths"))).getOrElse(
      throw new IllegalArgumentException("graft-seqfile requires a path")))
}

object SeqFileSource {
  val schema: StructType = StructType(Seq(
    StructField("key", StringType, nullable = false),
    StructField("value", StringType, nullable = false)))
}

class SeqFileTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"graft-seqfile($path)"
  override def schema(): StructType = SeqFileSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new SeqFileScan(path)
    }
}

class SeqFileScan(path: String) extends Scan with Batch {
  override def readSchema(): StructType = SeqFileSource.schema
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val spark = SparkSession.active
    val conf = spark.sessionState.newHadoopConf()
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val files =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).filter(s => s.isFile && !s.getPath.getName.startsWith("_"))
          .map(_.getPath.toString)
      else Array(path)
    files.sorted.map(f => SeqFilePartition(f): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val conf = new SerializableConfiguration(
      SparkSession.active.sessionState.newHadoopConf())
    new SeqFileReaderFactory(conf)
  }
}

case class SeqFilePartition(file: String) extends InputPartition

class SeqFileReaderFactory(conf: SerializableConfiguration)
  extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val file = partition.asInstanceOf[SeqFilePartition].file
    new PartitionReader[InternalRow] {
      private val reader = new SequenceFile.Reader(conf.value,
        SequenceFile.Reader.file(new Path(file)))
      private val key = new Text()
      private val value = new Text()
      private val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(2)

      override def next(): Boolean = reader.next(key, value)

      override def get(): InternalRow = {
        row.update(0, UTF8String.fromBytes(key.copyBytes()))
        row.update(1, UTF8String.fromBytes(value.copyBytes()))
        row
      }

      override def close(): Unit = reader.close()
    }
  }
}
