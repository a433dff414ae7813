package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.hadoop.io.{SequenceFile, Text}
import org.apache.hadoop.io.compress.{BZip2Codec, CompressionCodec, DefaultCodec, GzipCodec, SnappyCodec}
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

/** DataSourceV2 SequenceFile reader/writer (ref: src/core/org/apache/
  * hadoop/io/SequenceFile.java:1): `spark.read.format("graft-seqfile")
  * .load(paths*)` → (key string, value string) rows.
  *
  * The V2 surface makes the format a first-class citizen of the
  * engine: schema inference, multi-path loads, and executor-side
  * readers that stream records without materializing the file.
  *
  * Split granularity follows the reference's SequenceFileInputFormat:
  * a file larger than the target split size is divided at BYTE OFFSETS
  * and each reader re-aligns to the next sync marker
  * (`SequenceFile.Reader.sync`, ref src/core/org/apache/hadoop/io/
  * SequenceFile.java reader sync(position)), reading until the first
  * sync past its end offset — so a few-large-files layout still fans
  * out across the cluster, every record is read exactly once, and no
  * coordination between readers is needed. Target split size comes
  * from the `split.size` option, else
  * `spark.sql.files.maxPartitionBytes`.
  *
  * Writes support optional block compression (`compression` option:
  * none | deflate | gzip | bzip2 | snappy); compressed files keep
  * their sync markers, so compressed reads split identically.
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
    properties: util.Map[String, String]): Table = {
    val props = properties.asScala
    val paths = props.get("path") match {
      case Some(p) => Seq(p)
      case None => props.get("paths") match {
        // "paths" arrives as a JSON-encoded array of strings
        case Some(json) =>
          new com.fasterxml.jackson.databind.ObjectMapper()
            .readValue(json, classOf[Array[String]]).toSeq
        case None =>
          throw new IllegalArgumentException("graft-seqfile requires a path")
      }
    }
    new SeqFileTable(paths)
  }
}

object SeqFileSource {
  val schema: StructType = StructType(Seq(
    StructField("key", StringType, nullable = false),
    StructField("value", StringType, nullable = false)))

  def codecFor(name: String): Option[CompressionCodec] =
    name.toLowerCase match {
      case "none" => None
      case "deflate" => Some(new DefaultCodec)
      case "gzip" => Some(new GzipCodec)
      case "bzip2" => Some(new BZip2Codec)
      case "snappy" => Some(new SnappyCodec)
      case other => throw new IllegalArgumentException(
        s"graft-seqfile: unknown compression '$other' " +
          "(none | deflate | gzip | bzip2 | snappy)")
    }
}

class SeqFileTable(paths: Seq[String]) extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"graft-seqfile(${paths.mkString(",")})"
  override def schema(): StructType = SeqFileSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan =
        new SeqFileScan(paths, Option(options.get("split.size")).map(_.toLong))
    }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    require(paths.length == 1,
      "graft-seqfile writes to exactly one destination directory")
    val in = info.schema()
    require(in.length == 2 && in.forall(_.dataType == StringType),
      s"graft-seqfile writes (key string, value string), got ${in.simpleString}")
    val queryId = info.queryId()
    val compression = Option(info.options().get("compression")).getOrElse("none")
    SeqFileSource.codecFor(compression) // validate on the driver, fail fast
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new SeqFileBatchWrite(
          paths.head, queryId, compression,
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
class SeqFileBatchWrite(path: String, queryId: String, compression: String,
  conf: SerializableConfiguration) extends BatchWrite {
  private def stagingDir = new Path(path, s".graft-staging-$queryId")

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new SeqFileWriterFactory(stagingDir.toString, queryId, compression, conf)

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
  compression: String, conf: SerializableConfiguration) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      // queryId makes names globally unique: task-id counters restart
      // per application, and append-mode destinations accumulate files
      // from many jobs
      private val file = new Path(stagingDir, f"part-$partitionId%05d-$taskId-$queryId")
      private val writer = {
        val base = Seq(
          SequenceFile.Writer.file(file),
          SequenceFile.Writer.keyClass(classOf[Text]),
          SequenceFile.Writer.valueClass(classOf[Text]))
        val opts = SeqFileSource.codecFor(compression) match {
          case Some(codec) => base :+ SequenceFile.Writer.compression(
            SequenceFile.CompressionType.BLOCK, codec)
          case None => base
        }
        SequenceFile.createWriter(conf.value, opts: _*)
      }
      private val key = new Text()
      private val value = new Text()
      private var rowNum = 0L

      override def write(row: InternalRow): Unit = {
        // schema validation only checks types, so nullable string
        // columns reach this point — fail with context, not a bare NPE
        if (row.isNullAt(0) || row.isNullAt(1))
          throw new IllegalArgumentException(
            s"graft-seqfile: null ${if (row.isNullAt(0)) "key" else "value"} " +
              s"at row $rowNum of partition $partitionId (keys and values " +
              "must be non-null strings)")
        key.set(row.getUTF8String(0).getBytes)
        value.set(row.getUTF8String(1).getBytes)
        writer.append(key, value)
        rowNum += 1
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

class SeqFileScan(paths: Seq[String], splitSize: Option[Long]) extends Scan with Batch {
  override def readSchema(): StructType = SeqFileSource.schema
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val spark = SparkSession.active
    val conf = spark.sessionState.newHadoopConf()
    // clamp well above the seqfile header size so the first split
    // always contains the header and re-sync never lands before it
    val target = splitSize.getOrElse(
      spark.sessionState.conf.filesMaxPartitionBytes).max(1024L)
    val files = paths.flatMap { path =>
      val p = new Path(path)
      val fs = p.getFileSystem(conf)
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).filter(s => s.isFile &&
          !s.getPath.getName.startsWith("_") && !s.getPath.getName.startsWith("."))
          .map(s => (s.getPath.toString, s.getLen)).toSeq
      else Seq((path, fs.getFileStatus(p).getLen))
    }
    // one partition per split-size byte range; readers re-align to the
    // next sync marker, so ranges need not fall on record boundaries
    files.sortBy(_._1).flatMap { case (f, len) =>
      val n = ((len + target - 1) / target).max(1L)
      (0L until n).map(i =>
        SeqFilePartition(f, i * target, ((i + 1) * target).min(len)): InputPartition)
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val conf = new SerializableConfiguration(
      SparkSession.active.sessionState.newHadoopConf())
    new SeqFileReaderFactory(conf)
  }
}

case class SeqFilePartition(file: String, start: Long, end: Long) extends InputPartition

class SeqFileReaderFactory(conf: SerializableConfiguration)
  extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val part = partition.asInstanceOf[SeqFilePartition]
    new PartitionReader[InternalRow] {
      private val reader = new SequenceFile.Reader(conf.value,
        SequenceFile.Reader.file(new Path(part.file)))
      // the reference's SequenceFileRecordReader contract: start
      // reading at the first sync PAST start (the previous split owns
      // everything before it), stop at the first record that begins at
      // or after end with a sync seen — exactly-once over all splits
      if (part.start > reader.getPosition) reader.sync(part.start)
      // a range containing no sync marker yields an empty split (its
      // records belong to the preceding split)
      private var more = reader.getPosition < part.end
      private val key = new Text()
      private val value = new Text()
      private val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(2)

      override def next(): Boolean = {
        if (!more) return false
        val pos = reader.getPosition
        more = reader.next(key, value)
        if (more && pos >= part.end && reader.syncSeen()) more = false
        more
      }

      override def get(): InternalRow = {
        row.update(0, UTF8String.fromBytes(key.copyBytes()))
        row.update(1, UTF8String.fromBytes(value.copyBytes()))
        row
      }

      override def close(): Unit = reader.close()
    }
  }
}
