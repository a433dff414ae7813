package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.hadoop.io.{SequenceFile, Text}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
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
    properties.asScala.get("path") match {
      case Some(p) => new SeqFileTable(p)
      case None if properties.containsKey("paths") =>
        // "paths" arrives as a JSON-encoded array — reject cleanly
        // rather than treating the JSON text as a filesystem path
        throw new IllegalArgumentException(
          "graft-seqfile supports a single load path; pass one directory " +
            "(multi-path load is not implemented)")
      case None =>
        throw new IllegalArgumentException("graft-seqfile requires a path")
    }
}

object SeqFileSource {
  val schema: StructType = StructType(Seq(
    StructField("key", StringType, nullable = false),
    StructField("value", StringType, nullable = false)))
}

class SeqFileTable(path: String) extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"graft-seqfile($path)"
  override def schema(): StructType = SeqFileSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new SeqFileScan(path)
    }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val in = info.schema()
    require(in.length == 2 && in.forall(_.dataType == StringType),
      s"graft-seqfile writes (key string, value string), got ${in.simpleString}")
    val queryId = info.queryId()
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new SeqFileBatchWrite(path, queryId,
          new SerializableConfiguration(
            SparkSession.active.sessionState.newHadoopConf()))
      }
    }
  }
}

case class SeqFileCommit(file: String) extends WriterCommitMessage

/** Two-phase batch write: tasks stream into a hidden staging directory
  * (`.graft-staging-<queryId>`), the driver's job commit renames the
  * committed files into the destination and removes the staging dir,
  * and job abort deletes the staging dir — so a failed or retried job
  * never leaves partial output, and only one speculative attempt per
  * partition lands (Spark commits exactly one DataWriter per
  * partition). */
class SeqFileBatchWrite(path: String, queryId: String, conf: SerializableConfiguration)
  extends BatchWrite {
  private def stagingDir = new Path(path, s".graft-staging-$queryId")

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new SeqFileWriterFactory(stagingDir.toString, queryId, conf)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val dest = new Path(path)
    val fs = dest.getFileSystem(conf.value)
    fs.mkdirs(dest)
    messages.foreach {
      case SeqFileCommit(f) =>
        val src = new Path(f)
        if (!fs.rename(src, new Path(dest, src.getName)))
          throw new java.io.IOException(s"graft-seqfile commit failed to move $src")
      case other =>
        // a dropped partition must fail the job, not vanish silently
        throw new java.io.IOException(
          s"graft-seqfile commit received an unexpected message: $other")
    }
    fs.delete(stagingDir, true)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val fs = stagingDir.getFileSystem(conf.value)
    fs.delete(stagingDir, true)
  }
}

class SeqFileWriterFactory(stagingDir: String, queryId: String,
  conf: SerializableConfiguration) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      // queryId makes names globally unique: task-id counters restart
      // per application, and append-mode destinations accumulate files
      // from many jobs
      private val file = new Path(stagingDir, f"part-$partitionId%05d-$taskId-$queryId")
      private val writer = SequenceFile.createWriter(conf.value,
        SequenceFile.Writer.file(file),
        SequenceFile.Writer.keyClass(classOf[Text]),
        SequenceFile.Writer.valueClass(classOf[Text]))
      private val key = new Text()
      private val value = new Text()

      override def write(row: InternalRow): Unit = {
        key.set(row.getUTF8String(0).getBytes)
        value.set(row.getUTF8String(1).getBytes)
        writer.append(key, value)
      }

      override def commit(): WriterCommitMessage = {
        writer.close()
        SeqFileCommit(file.toString)
      }

      override def abort(): Unit = {
        writer.close()
        file.getFileSystem(conf.value).delete(file, false)
      }

      override def close(): Unit = ()
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
        fs.listStatus(p).filter(s => s.isFile &&
          !s.getPath.getName.startsWith("_") && !s.getPath.getName.startsWith("."))
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
