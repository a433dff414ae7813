package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Distributed file copy (ref: src/tools/org/apache/hadoop/tools/
  * DistCp.java:1): the file list is read as a binaryFile DataFrame and
  * each task writes its files through the Hadoop FileSystem API — the
  * same executor-parallel copy DistCp runs as a map-only job. Works
  * against any Hadoop-supported filesystem (HDFS, S3A, local).
  */
object DistCopy {

  def copy(spark: SparkSession, src: String, dst: String): Long = {
    val files = spark.read.format("binaryFile").load(src)
      .select("path", "content")
    val confBc = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sparkContext.hadoopConfiguration))
    files.rdd.map { r =>
      val name = new Path(r.getString(0)).getName
      val out = new Path(dst, name)
      val fs = out.getFileSystem(confBc.value.value)
      val os = fs.create(out, true)
      try os.write(r.getAs[Array[Byte]](1)) finally os.close()
      1L
    }.sum().toLong
  }
}
