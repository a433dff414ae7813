package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.util.SerializableConfiguration

/** Small-file compaction — the HAR job (ref: src/tools/org/apache/
  * hadoop/tools/HadoopArchives.java:1), the #1 warehouse hygiene job:
  * many small files bin-packed into few target-size archives plus a
  * manifest, so namenode pressure and per-file open cost drop without
  * losing per-file access.
  *
  * Shape at scale: bin assignment runs over file METADATA only (one
  * row per file — the single-partition prefix-sum window is over
  * listing rows, never data); the copy joins content in and writes one
  * archive per bin with one pass, executor-parallel across bins. The
  * manifest is a parquet table, so `fetch` is a pushdown-pruned point
  * lookup + a ranged read — the MapFile.get analog (ref: src/core/org/
  * apache/hadoop/io/MapFile.java:1): bounded-latency key fetch with no
  * full scan.
  *
  * Commit protocol: tasks write task-attempt-unique staging files (so
  * a speculative or retried attempt can never interleave with another
  * attempt's stream); after the job succeeds the driver renames one
  * attempt per archive into place and writes the manifest LAST — a
  * reader that finds a manifest is guaranteed the archives it points
  * at are complete. Every row is length-checked against the listing
  * snapshot, so a source tree that changes mid-job fails loudly
  * instead of producing offsets that silently disagree with bytes.
  */
object Compaction {

  /** Bin-pack every file under `src` into ~targetBytes archives under
    * `dst` (archive-NNNNN.bin + _manifest parquet). Deterministic
    * first-fit in full-path order (paths are unique where basenames
    * need not be), bin = floor(prefix_sum_before / target), so bin
    * count never exceeds ceil(total_bytes / target). Returns the
    * manifest (archive, path, name, offset, length). */
  def compact(spark: SparkSession, src: String, dst: String,
    targetBytes: Long = 64L * 1024 * 1024): DataFrame = {
    require(targetBytes >= 1, s"targetBytes must be >= 1, got $targetBytes")
    // metadata pass: column pruning keeps binaryFile from reading content
    val meta = spark.read.format("binaryFile")
      .option("recursiveFileLookup", "true").load(src)
      .select(col("path"), col("length"),
        expr("reverse(split(path, '/'))[0]").as("name"))
    // full path is the unique key: ordering, offsets and the content
    // join all use it, so duplicate basenames in different subdirs get
    // distinct manifest rows with deterministic offsets
    val gw = Window.orderBy("path")
    val binW = Window.partitionBy("bin").orderBy("path")
    // the listing + prefix-sum lineage feeds several consumers (bin
    // count, content join, manifest write) — cache it so the source
    // tree is listed once and all consumers see ONE snapshot
    val assigned = meta
      .withColumn("cum", sum("length").over(gw))
      .withColumn("bin", expr(s"(cum - length) div ${targetBytes}L"))
      .withColumn("offset", coalesce(
        sum("length").over(binW.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("archive", format_string("archive-%05d.bin", col("bin")))
      .select("path", "name", "bin", "archive", "offset", "length")
      .persist()
    try {
      val manifest = assigned.select("archive", "path", "name", "offset", "length")
      // empty source: max(bin) is null — a valid empty layout, not an NPE
      val maxBin = assigned.agg(max("bin")).collect()(0)
      val nBins = if (maxBin.isNullAt(0)) 0 else (maxBin.getLong(0) + 1).toInt
      if (nBins == 0) {
        manifest.write.mode("overwrite").parquet(s"$dst/_manifest")
        return spark.read.parquet(s"$dst/_manifest")
      }

      val hadoopConf = spark.sparkContext.hadoopConfiguration
      val confBc = new SerializableConfiguration(hadoopConf)
      val staging = new Path(dst, "_staging")
      val fs = staging.getFileSystem(hadoopConf)
      fs.delete(staging, true)
      fs.mkdirs(staging)
      val stagingStr = staging.toString
      // content pass, MANIFEST-DRIVEN (r14): a bin never splits across
      // tasks (hash on bin), and within a task files arrive
      // archive+path-ordered, so each archive is one sequential stream
      // with offsets matching the manifest. Only ASSIGNMENT ROWS move
      // through the shuffle — each writing task streams its files'
      // bytes source→archive directly, so (vs the old
      // binaryFile⊕join shape) the source tree is LISTED ONCE, no
      // content byte ever crosses an Exchange, and no file has to fit
      // in a single row. Byte counts are checked per file against the
      // listing snapshot — a source that changed mid-job still fails
      // loudly, never writes offsets that disagree with bytes.
      assigned.select("archive", "path", "length")
        .repartition(nBins, col("archive"))
        .sortWithinPartitions("archive", "path")
        .foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
          val attempt = org.apache.spark.TaskContext.get().taskAttemptId()
          var current: String = null
          var out: org.apache.hadoop.fs.FSDataOutputStream = null
          val buf = new Array[Byte](131072)
          try {
            rows.foreach { r =>
              val archive = r.getString(0)
              val path = r.getString(1)
              val expected = r.getLong(2)
              if (archive != current) {
                if (out != null) out.close()
                val p = new Path(stagingStr, s"$archive.$attempt")
                out = p.getFileSystem(confBc.value).create(p, true)
                current = archive
              }
              val sp = new Path(path)
              val in = sp.getFileSystem(confBc.value).open(sp)
              val copied =
                try {
                  var n = 0L
                  var read = in.read(buf)
                  while (read >= 0) {
                    out.write(buf, 0, read)
                    n += read
                    read = in.read(buf)
                  }
                  n
                } finally in.close()
              if (copied != expected) throw new IllegalStateException(
                s"compaction: '$path' streamed $copied bytes but the " +
                  s"listing snapshot said $expected — source changed " +
                  "mid-job")
            }
          } finally if (out != null) out.close()
        }
      // commit: one winning attempt per archive renamed into place.
      // Failed/killed attempts can leave PARTIAL staging files, so the
      // winner is the attempt whose size equals the bin's expected byte
      // total — never just the first name found.
      val expectedBytes = assigned.groupBy("archive")
        .agg(sum("length").as("bytes")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val byArchive = fs.listStatus(staging).map(_.getPath)
        .flatMap { p =>
          val n = p.getName
          val dot = n.lastIndexOf('.')
          if (dot > 0 && n.substring(dot + 1).forall(_.isDigit))
            Some(n.substring(0, dot) -> p)
          else None
        }
        .groupBy(_._1)
      (0 until nBins).foreach { b =>
        val archive = f"archive-$b%05d.bin"
        val candidates = byArchive.getOrElse(archive, Array.empty)
        val winner = candidates.map(_._2)
          .find(p => fs.getFileStatus(p).getLen == expectedBytes(archive))
        require(winner.isDefined,
          s"compaction: no complete attempt produced $archive " +
            s"(${candidates.length} staging files, expected ${expectedBytes(archive)} bytes)")
        val target = new Path(dst, archive)
        fs.delete(target, false)
        require(fs.rename(winner.get, target),
          s"compaction: rename ${winner.get} -> $target failed")
      }
      fs.delete(staging, true)
      // manifest LAST: its existence implies the archives are committed
      manifest.write.mode("overwrite").parquet(s"$dst/_manifest")
      spark.read.parquet(s"$dst/_manifest")
    } finally assigned.unpersist()
  }

  /** The whole archive set back as ONE DataFrame — the transparent
    * read-back HarFileSystem gives the reference (ref: src/core/org/
    * apache/hadoop/fs/HarFileSystem.java:48: archives mount as a
    * filesystem and any job reads them unchanged): every archived
    * file as (path, name, length, content), planned entirely from the
    * manifest. Scale shape: the manifest (one row per file) is
    * repartitioned by archive so each task streams ITS archives with
    * offset-ordered forward seeks — executor-parallel across
    * archives, zero driver-side fetch calls, no archive ever read
    * twice. The 100 TB downstream pattern: `readAll(...).join(...)`
    * replaces a per-file `fetch` loop. */
  def readAll(spark: SparkSession, dst: String): DataFrame = {
    import spark.implicits._
    val man = spark.read.parquet(s"$dst/_manifest")
    // archive-cardinality readback (bins, not files) sizes the scan
    val nArch = man.select("archive").distinct().count().toInt
    val confBc = new SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    man.repartition(math.max(nArch, 1), col("archive"))
      .sortWithinPartitions("archive", "offset")
      .select("archive", "path", "name", "offset", "length")
      .mapPartitions { rows =>
        var current: String = null
        var in: org.apache.hadoop.fs.FSDataInputStream = null
        val tc = org.apache.spark.TaskContext.get()
        if (tc != null)
          tc.addTaskCompletionListener[Unit](_ =>
            if (in != null) in.close())
        rows.map { r =>
          val archive = r.getString(0)
          if (archive != current) {
            if (in != null) in.close()
            val p = new Path(dst, archive)
            in = p.getFileSystem(confBc.value).open(p)
            current = archive
          }
          in.seek(r.getLong(3))
          val buf = new Array[Byte](r.getLong(4).toInt)
          in.readFully(buf)
          (r.getString(1), r.getString(2), r.getLong(4), buf)
        }
      }
      .toDF("path", "name", "length", "content")
  }

  /** ORACLE-GATED archive pipeline exercise (q_har_readall): stage
    * every document as ONE tiny file (the namenode-killer shape the
    * HAR job exists for), bin-pack into archives, read the WHOLE
    * archive set back through `readAll`, and prove content integrity
    * row-by-row — doc_id parsed from the archived name, byte length,
    * md5 of the bytes. The DuckDB oracle computes the same facts
    * straight from the documents table, so hash equality proves
    * listing, packing, offsets, the ranged read-back, and that no
    * file was lost, duplicated or torn. */
  def harGateQuery(spark: SparkSession, dir: String): DataFrame = {
    val stage = graft.Scratch.freshRoot(spark, "graft-harstage", dir)
    val dst = graft.Scratch.freshRoot(spark, "graft-harout", dir)
    val confBc = new SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    // the doc_id % 10 batch (the other gates' convention) bounds the
    // per-file staging cost at bench scale while still exercising
    // listing, packing, multi-archive layout and the ranged read-back.
    // Staging MANUFACTURES the input shape (one tiny file per doc —
    // at sf10 that is ~600k file creates, pure syscall latency): it
    // is test setup, not the archive pipeline under test, so its
    // seconds ride the scratch-build accounting Bench splits out of
    // per-query wall (the same discipline as the memoized graph
    // artifacts).
    val stagingT0 = System.nanoTime()
    graft.Tables.documents(spark, dir).select("doc_id", "text")
      .filter(col("doc_id") % 10 === 0)
      .foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
        val fs = new Path(stage).getFileSystem(confBc.value)
        // batched pooled creates: one tiny file per doc is the POINT
        // (the namenode-killer shape), but a serial create loop is
        // pure per-file RPC latency — overlap 8 ways in bounded
        // 64-doc batches (the spillHstatsAll discipline; memory stays
        // O(batch), not O(partition))
        val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
        try {
          import scala.jdk.CollectionConverters._
          rows.grouped(64).foreach { batch =>
            val tasks: Seq[java.util.concurrent.Callable[Unit]] =
              batch.map { r =>
                val id = r.getLong(0)
                val bytes = r.getString(1).getBytes("UTF-8")
                () => {
                  val out = fs.create(
                    new Path(stage, f"doc-$id%09d.txt"), true)
                  try out.write(bytes) finally out.close()
                }
              }
            pool.invokeAll(tasks.asJava).asScala.foreach(_.get())
          }
        } finally pool.shutdown()
      }
    graft.Scratch.buildNanos.addAndGet(System.nanoTime() - stagingT0)
    compact(spark, stage, dst, targetBytes = 64L << 10)
    readAll(spark, dst).select(
      expr("cast(regexp_extract(name, 'doc-(\\\\d+)', 1) as bigint)")
        .as("doc_id"),
      col("length").as("byte_len"),
      expr("md5(content)").as("h"))
  }

  /** Point lookup by basename: manifest filter (parquet pushdown) →
    * one ranged read of one archive. No archive scan. Fails fast if
    * the basename is ambiguous — use `fetchPath` with the full path. */
  def fetch(spark: SparkSession, dst: String, name: String): Array[Byte] = {
    val hit = spark.read.parquet(s"$dst/_manifest")
      .filter(col("name") === name).collect()
    require(hit.nonEmpty, s"compaction fetch: '$name' not in manifest")
    require(hit.length == 1,
      s"compaction fetch: basename '$name' matches ${hit.length} files — " +
        s"use fetchPath with one of: ${hit.map(_.getAs[String]("path")).mkString(", ")}")
    readRange(spark, dst, hit(0))
  }

  /** Point lookup by full source path — unambiguous under duplicate
    * basenames. */
  def fetchPath(spark: SparkSession, dst: String, path: String): Array[Byte] = {
    val hit = spark.read.parquet(s"$dst/_manifest")
      .filter(col("path") === path).collect()
    require(hit.nonEmpty, s"compaction fetch: path '$path' not in manifest")
    readRange(spark, dst, hit(0))
  }

  private def readRange(spark: SparkSession, dst: String,
    r: org.apache.spark.sql.Row): Array[Byte] = {
    val p = new Path(dst, r.getAs[String]("archive"))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    try {
      in.seek(r.getAs[Long]("offset"))
      val buf = new Array[Byte](r.getAs[Long]("length").toInt)
      in.readFully(buf)
      buf
    } finally in.close()
  }
}
