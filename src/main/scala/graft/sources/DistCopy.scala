package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Distributed file copy and metadata change (ref: src/tools/org/
  * apache/hadoop/tools/DistCp.java:1, DistCh.java:1): the file list
  * is read as a binaryFile DataFrame and each task works through the
  * Hadoop FileSystem API — the same executor-parallel map-only jobs
  * the reference tools run. Works against any Hadoop-supported
  * filesystem (HDFS, S3A, local).
  */
object DistCopy {

  /** DistCh analog: apply a permission change to every file under
    * `dir`, executor-parallel over the listing (metadata-only scan —
    * content is never read). Returns the number of files changed. */
  def distCh(spark: SparkSession, dir: String, octalPerm: String): Long = {
    val perm = new org.apache.hadoop.fs.permission.FsPermission(
      Integer.parseInt(octalPerm, 8).toShort)
    val confBc = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sparkContext.hadoopConfiguration))
    spark.read.format("binaryFile").load(dir).select("path").rdd.map { r =>
      val p = new Path(r.getString(0))
      p.getFileSystem(confBc.value.value).setPermission(p, perm)
      1L
    }.sum().toLong
  }

  /** Streaming MD5 of one file — bounded buffer, any file size. */
  private def md5Of(fs: FileSystem, p: Path): Array[Byte] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val in = fs.open(p)
    try {
      val buf = new Array[Byte](1 << 16)
      var n = in.read(buf)
      while (n >= 0) {
        if (n > 0) md.update(buf, 0, n)
        n = in.read(buf)
      }
    } finally in.close()
    md.digest()
  }

  /** Copy every file under `src` into `dst`, executor-parallel.
    * Returns the number of files actually copied.
    *
    * `update = true` is the reference's `-update` incremental sync
    * (ref: src/tools/org/apache/hadoop/tools/DistCp.java:1, the
    * -update flag): a file is SKIPPED when the destination already
    * holds one of the same length whose checksum matches. The skip
    * decision is metadata-only — on filesystems with native file
    * checksums (HDFS-style) the checksums compare directly; where a
    * side has none (raw local, most object stores) it falls back to
    * the rsync-style quick check (same length and the source is not
    * newer). That is the difference between a nightly sync of a
    * 100 TB tree re-shipping 100 TB and shipping only the ~1% churn.
    *
    * The quick check inherits rsync's documented blind spot: a
    * same-length edit whose mtime was preserved/backdated (rsync -a,
    * tar extraction, clock skew) looks unchanged. `contentHash = true`
    * opts into comparing an MD5 of both sides when neither filesystem
    * offers native checksums — it reads both files once (still no
    * copy when they match), trading IO for rsync -c-style certainty.
    */
  def copy(spark: SparkSession, src: String, dst: String,
    update: Boolean = false, contentHash: Boolean = false): Long = {
    // metadata-only scan (column pruning keeps content unread); each
    // task then STREAMS its file through a bounded buffer like the
    // reference — a file larger than executor memory copies fine
    val files = spark.read.format("binaryFile").load(src).select("path")
    val confBc = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sparkContext.hadoopConfiguration))
    files.rdd.map { r =>
      val from = new Path(r.getString(0))
      val out = new Path(dst, from.getName)
      val srcFs = from.getFileSystem(confBc.value.value)
      val dstFs = out.getFileSystem(confBc.value.value)
      val skip = update && dstFs.exists(out) && {
        val s = srcFs.getFileStatus(from)
        val d = dstFs.getFileStatus(out)
        s.getLen == d.getLen && {
          val sc = srcFs.getFileChecksum(from)
          val dc = dstFs.getFileChecksum(out)
          if (sc != null && dc != null) sc == dc
          else if (contentHash) md5Of(srcFs, from).sameElements(md5Of(dstFs, out))
          else s.getModificationTime <= d.getModificationTime
        }
      }
      if (skip) 0L
      else {
        val is = srcFs.open(from)
        val os = dstFs.create(out, true)
        try {
          val buf = new Array[Byte](1 << 16)
          var n = is.read(buf)
          while (n >= 0) {
            if (n > 0) os.write(buf, 0, n)
            n = is.read(buf)
          }
        } finally {
          // close the output even when the input's close throws — a
          // leaked FSDataOutputStream never completes its final block
          try is.close() finally os.close()
        }
        1L
      }
    }.sum().toLong
  }
}
