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
  */
object Compaction {

  /** Bin-pack every file under `src` into ~targetBytes archives under
    * `dst` (archive-NNNNN.bin + _manifest parquet). Deterministic
    * first-fit in name order: bin = floor(prefix_sum_before / target),
    * so bin count never exceeds ceil(total_bytes / target). Returns
    * the manifest (archive, name, offset, length). */
  def compact(spark: SparkSession, src: String, dst: String,
    targetBytes: Long = 64L * 1024 * 1024): DataFrame = {
    require(targetBytes >= 1, s"targetBytes must be >= 1, got $targetBytes")
    // metadata pass: column pruning keeps binaryFile from reading content
    val meta = spark.read.format("binaryFile").load(src)
      .select(col("path"), col("length"),
        expr("reverse(split(path, '/'))[0]").as("name"))
    val gw = Window.orderBy("name")
    val binW = Window.partitionBy("bin").orderBy("name")
    // the listing + prefix-sum lineage feeds three consumers (manifest
    // write, bin count, content join) — cache it so the source tree is
    // listed once and all three see the same snapshot
    val assigned = meta
      .withColumn("cum", sum("length").over(gw))
      .withColumn("bin", expr(s"(cum - length) div ${targetBytes}L"))
      .withColumn("offset", coalesce(
        sum("length").over(binW.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("archive", format_string("archive-%05d.bin", col("bin")))
      .select("path", "name", "bin", "archive", "offset", "length")
      .persist()
    try {
      val manifest = assigned.select("archive", "name", "offset", "length")
      manifest.write.mode("overwrite").parquet(s"$dst/_manifest")
      // empty source: max(bin) is null — a valid empty layout, not an NPE
      val maxBin = assigned.agg(max("bin")).collect()(0)
      val nBins = if (maxBin.isNullAt(0)) 0 else (maxBin.getLong(0) + 1).toInt
      if (nBins == 0) return spark.read.parquet(s"$dst/_manifest")

      val confBc = new SerializableConfiguration(
        spark.sparkContext.hadoopConfiguration)
      val dstStr = dst
      // content pass: a bin never splits across tasks (hash on bin), and
      // within a task files arrive archive-ordered, so each archive is
      // written in one sequential stream
      spark.read.format("binaryFile").load(src).select("path", "content")
        .join(assigned.select("path", "name", "archive"), "path")
        .repartition(nBins, col("archive"))
        .sortWithinPartitions("archive", "name")
        .select("archive", "content")
        .foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
          var current: String = null
          var out: org.apache.hadoop.fs.FSDataOutputStream = null
          try {
            rows.foreach { r =>
              val archive = r.getString(0)
              if (archive != current) {
                if (out != null) out.close()
                val p = new Path(dstStr, archive)
                out = p.getFileSystem(confBc.value).create(p, true)
                current = archive
              }
              out.write(r.getAs[Array[Byte]](1))
            }
          } finally if (out != null) out.close()
        }
      spark.read.parquet(s"$dst/_manifest")
    } finally assigned.unpersist()
  }

  /** Point lookup into a compacted layout: manifest filter (parquet
    * pushdown) → one ranged read of one archive. No archive scan. */
  def fetch(spark: SparkSession, dst: String, name: String): Array[Byte] = {
    val hit = spark.read.parquet(s"$dst/_manifest")
      .filter(col("name") === name).collect()
    require(hit.nonEmpty, s"compaction fetch: '$name' not in manifest")
    val r = hit(0)
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
