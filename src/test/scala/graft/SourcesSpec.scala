package graft

import org.apache.spark.sql.functions._
import graft.sources._

class SourcesSpec extends SparkSpec {

  test("SequenceFile round-trip preserves key-value pairs") {
    val dir = tmpDir() + "/seq"
    val df = Tables.nation(spark, sfDir)
      .select(col("n_nationkey").cast("string"), col("n_name"))
    SeqFiles.write(df, dir)
    val back = SeqFiles.read(spark, dir)
    assert(back.count() === 25)
    val m = back.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(m("0") === df.filter(col("n_nationkey") === 0).collect()(0).getString(1))
  }

  test("DataSourceV2 SequenceFile reader matches the RDD reader") {
    val dir = tmpDir() + "/seqv2"
    val df = Tables.nation(spark, sfDir)
      .select(col("n_nationkey").cast("string"), col("n_name"))
    SeqFiles.write(df, dir)
    val v2 = SeqFiles.readV2(spark, dir)
    assert(v2.schema.fieldNames.toSeq === Seq("key", "value"))
    assert(v2.count() === 25)
    val rdd = SeqFiles.read(spark, dir)
    assert(v2.join(rdd, Seq("key", "value")).count() === 25)
    // DSv2 scan node, one partition per part-file
    val plan = v2.queryExecution.executedPlan.toString
    assert(plan.contains("BatchScan"), plan)
  }

  test("DataSourceV2 SequenceFile write round-trips through Hadoop's reader") {
    val dir = tmpDir() + "/seqv2w"
    val df = Tables.region(spark, sfDir)
      .select(col("r_regionkey").cast("string").as("key"), col("r_name").as("value"))
    SeqFiles.writeV2(df, dir)
    // read back through the classic Hadoop path: proves real SequenceFiles
    val back = SeqFiles.read(spark, dir)
    assert(back.count() === 5)
    assert(SeqFiles.readV2(spark, dir).join(back, Seq("key", "value")).count() === 5)
    // job commit must have cleaned its staging directory
    val files = new java.io.File(dir).listFiles().map(_.getName)
    assert(!files.exists(_.startsWith(".graft-staging")), files.toSeq)
    // only committed part files (plus local-FS .crc sidecars) remain
    assert(files.filterNot(_.startsWith(".")).forall(_.startsWith("part-")), files.toSeq)
  }

  test("one large SequenceFile splits at sync markers into many partitions, exactly once") {
    import spark.implicits._
    val dir = tmpDir() + "/seqbig"
    // one big file: single partition, ~3000 records with fat values so
    // the file spans many sync intervals (sync every ~2000 bytes)
    val df = (0 until 3000)
      .map(i => (f"k$i%05d", "v" * 200 + i)).toDF("key", "value").coalesce(1)
    SeqFiles.writeV2(df, dir)
    val whole = spark.read.format("graft-seqfile").load(dir)
    val split = spark.read.format("graft-seqfile")
      .option("split.size", 16 * 1024).load(dir)
    assert(split.rdd.getNumPartitions > 4,
      s"expected sync-marker splits, got ${split.rdd.getNumPartitions} partition(s)")
    assert(whole.rdd.getNumPartitions === 1)
    assert(split.count() === 3000)
    // identical multiset of rows: every record exactly once
    assert(split.exceptAll(whole).count() === 0)
    assert(whole.exceptAll(split).count() === 0)
  }

  test("multi-path SequenceFile load unions all paths") {
    val d1 = tmpDir() + "/seqm1"
    val d2 = tmpDir() + "/seqm2"
    val df = Tables.region(spark, sfDir)
      .select(col("r_regionkey").cast("string").as("key"), col("r_name").as("value"))
    SeqFiles.writeV2(df, d1)
    SeqFiles.writeV2(df, d2)
    val both = spark.read.format("graft-seqfile").load(d1, d2)
    assert(both.count() === 10)
  }

  test("compressed DSv2 SequenceFile write round-trips and still splits") {
    import spark.implicits._
    val dir = tmpDir() + "/seqgz"
    val df = (0 until 2000)
      .map(i => (f"k$i%05d", "value " * 40 + i)).toDF("key", "value").coalesce(1)
    df.write.format("graft-seqfile").mode("append")
      .option("compression", "deflate").save(dir)
    // block-compressed files are smaller than the raw data
    val bytes = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("part-")).map(_.length).sum
    assert(bytes < 100 * 1024, s"expected compression, got $bytes bytes")
    // classic Hadoop reader proves it's a real compressed SequenceFile
    assert(SeqFiles.read(spark, dir).count() === 2000)
    val split = spark.read.format("graft-seqfile")
      .option("split.size", 4 * 1024).load(dir)
    assert(split.count() === 2000)
    assert(split.rdd.getNumPartitions > 1)
  }

  test("DSv2 SequenceFile write rejects null keys/values with context") {
    import spark.implicits._
    val dir = tmpDir() + "/seqnull"
    val bad = Seq(("a", "1"), (null, "2")).toDF("key", "value")
    val e = intercept[Exception] {
      bad.write.format("graft-seqfile").mode("append").save(dir)
    }
    // Spark's non-nullable sink schema asserts first
    // (NOT_NULL_ASSERT_VIOLATION); the writer's own guard is the
    // defense-in-depth behind it. Either way: descriptive, not a bare NPE.
    def all(t: Throwable): Seq[Throwable] =
      Option(t).toSeq.flatMap(x => x +: all(x.getCause))
    assert(all(e).exists(t => t.getMessage != null &&
      (t.getMessage.contains("null key") || t.getMessage.contains("NULL value"))),
      e.toString)
    assert(!all(e).exists(_.isInstanceOf[NullPointerException]), e.toString)
  }

  test("PartitionedWriter writes hive-style partitions and prunes on read") {
    val dir = tmpDir() + "/part"
    PartitionedWriter.write(Tables.lineitem(spark, sfDir), dir, Seq("l_returnflag"))
    val back = PartitionedWriter.read(spark, dir)
    assert(back.count() === Tables.lineitem(spark, sfDir).count())
    val one = back.filter(col("l_returnflag") === "R")
    // partition pruning must reach the file source
    val plan = one.queryExecution.executedPlan.toString
    assert(one.count() ===
      Tables.lineitem(spark, sfDir).filter(col("l_returnflag") === "R").count())
    assert(plan.contains("PartitionFilters") || !plan.contains("l_returnflag ="),
      "filter on the partition key should be pruned, not evaluated per-row")
  }

  test("Pipe round-trips lines through cat") {
    val lines = Tables.nation(spark, sfDir).select(col("n_name").as("line"))
    val piped = Pipe.pipeLines(spark, lines, Seq("cat"))
    assert(piped.collect().map(_.getString(0)).sorted ===
      lines.collect().map(_.getString(0)).sorted)
  }

  test("pipeBinary: framed records are 8-bit clean through an identity pipe") {
    import spark.implicits._
    // payloads that break line-oriented pipes: NULs, newlines, CRs,
    // 0xFF runs, empty, and every byte value once
    val payloads: Seq[Array[Byte]] = Seq(
      Array[Byte](0, 10, 13, 0, 10),
      Array.fill[Byte](300)(0xFF.toByte),
      Array.empty[Byte],
      (0 to 255).map(_.toByte).toArray,
      "plain text survives too".getBytes("UTF-8"))
    val df = spark.createDataset(payloads).toDF("payload").repartition(2)
    val back = Pipe.pipeBinary(spark, df, Seq("cat"))
      .collect().map(_.getAs[Array[Byte]](0))
    assert(back.map(_.toSeq).sorted(Ordering.Implicits.seqOrdering[Seq, Byte])
      === payloads.map(_.toSeq).sorted(Ordering.Implicits.seqOrdering[Seq, Byte]))
  }

  test("pipeBinary: an external transformer sees exact frames (python reverser)") {
    import spark.implicits._
    val prog =
      """import sys,struct
        |r,w=sys.stdin.buffer,sys.stdout.buffer
        |while True:
        |    c=r.read(1)
        |    if not c: break
        |    assert c==b'\x00'
        |    n=struct.unpack('>i',r.read(4))[0]
        |    b=r.read(n)
        |    w.write(b'\x00'+struct.pack('>i',n)+b[::-1])
        |w.flush()
        |""".stripMargin
    val payloads = Seq(Array[Byte](1, 2, 3, 0, 10), Array[Byte](9, 8))
    val df = spark.createDataset(payloads).toDF("payload").coalesce(1)
    val back = Pipe.pipeBinary(spark, df, Seq("python3", "-c", prog))
      .collect().map(_.getAs[Array[Byte]](0).toSeq).sorted(
        Ordering.Implicits.seqOrdering[Seq, Byte])
    assert(back === payloads.map(_.reverse.toSeq).sorted(
      Ordering.Implicits.seqOrdering[Seq, Byte]))
  }

  test("pipeBinary: non-zero exit fails the task instead of truncating silently") {
    import spark.implicits._
    val df = spark.createDataset(Seq(Array[Byte](1))).toDF("payload").coalesce(1)
    val ex = intercept[org.apache.spark.SparkException] {
      Pipe.pipeBinary(spark, df, Seq("false")).collect()
    }
    assert(ex.getMessage.contains("exited with") ||
      Option(ex.getCause).exists(_.getMessage.contains("exited with")))
  }

  test("pipeReduce groups keys wholly per partition — results partition-count-invariant") {
    import spark.implicits._
    val kv = (1 to 200).map(i => (s"k${i % 7}", i.toLong)).toDF("k", "v")
    def run(parts: Int) = Pipe.pipeReduce(spark, kv, "k",
      Seq("awk", "BEGIN{FS=OFS=\"\\t\"} k!=$1&&NR>1{print k,s;s=0} {k=$1;s+=$2} END{if(NR>0)print k,s}"),
      partitions = parts)
      .collect().map(_.getString(0)).sorted.toSeq
    val expected = kv.groupBy("k").agg(sum("v").as("s"))
      .collect().map(r => s"${r.getString(0)}\t${r.getLong(1)}").sorted.toSeq
    assert(run(2) === expected)
    assert(run(32) === expected)
  }

  test("distCh applies permissions executor-parallel over the listing") {
    val dir = new java.io.File(tmpDir() + "/distch"); dir.mkdirs()
    (1 to 5).foreach(i => java.nio.file.Files.write(
      new java.io.File(dir, s"f$i.txt").toPath, s"data$i".getBytes))
    val n = DistCopy.distCh(spark, dir.getAbsolutePath, "600")
    assert(n === 5)
    (1 to 5).foreach { i =>
      val p = new org.apache.hadoop.fs.Path(s"${dir.getAbsolutePath}/f$i.txt")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      assert(fs.getFileStatus(p).getPermission.toString === "rw-------")
    }
  }

  test("Compaction bin-packs small files into <= ceil(bytes/target) archives, content intact") {
    val srcDir = new java.io.File(tmpDir() + "/har-src"); srcDir.mkdirs()
    val rnd = new scala.util.Random(7)
    val contents = (0 until 40).map { i =>
      val bytes = new Array[Byte](200 + rnd.nextInt(800))
      rnd.nextBytes(bytes)
      val name = f"small-$i%03d.dat"
      java.nio.file.Files.write(new java.io.File(srcDir, name).toPath, bytes)
      name -> bytes
    }.toMap
    val dst = tmpDir() + "/har-out"
    val target = 4096L
    val manifest = Compaction.compact(spark, srcDir.getAbsolutePath, dst, target)
    val totalBytes = contents.values.map(_.length.toLong).sum
    val archives = new java.io.File(dst).listFiles()
      .filter(_.getName.startsWith("archive-"))
    assert(archives.length <= math.ceil(totalBytes.toDouble / target).toLong,
      s"${archives.length} archives for $totalBytes bytes at target $target")
    assert(archives.length > 1, "test should exercise multiple bins")
    // archives hold exactly the packed bytes
    assert(archives.map(_.length).sum === totalBytes)
    assert(manifest.count() === 40)
    // every file fetches back byte-identical via the manifest point lookup
    contents.foreach { case (name, bytes) =>
      assert(Compaction.fetch(spark, dst, name).toSeq === bytes.toSeq, name)
    }
  }

  test("Compaction.readAll returns the whole archive set as one DataFrame") {
    val srcDir = new java.io.File(tmpDir() + "/har-all"); srcDir.mkdirs()
    val rnd = new scala.util.Random(7)
    val contents = (0 until 25).map { i =>
      val bytes = new Array[Byte](50 + rnd.nextInt(400))
      rnd.nextBytes(bytes)
      val f = new java.io.File(srcDir, f"f$i%03d.bin")
      java.nio.file.Files.write(f.toPath, bytes)
      f.getName -> bytes
    }.toMap
    val dst = tmpDir() + "/har-all-out"
    Compaction.compact(spark, srcDir.getAbsolutePath, dst, 2048L)
    val back = Compaction.readAll(spark, dst)
      .select("name", "content").collect()
      .map(r => r.getString(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    // multiset equality with the pre-compaction tree: same names,
    // byte-identical content, nothing dropped or duplicated
    assert(back.keySet === contents.keySet)
    contents.foreach { case (n, bytes) =>
      assert(back(n) === bytes.toSeq, s"content mismatch for $n")
    }
    // planned from the manifest: the scan partitioning is by archive
    val nArch = new java.io.File(dst).listFiles()
      .count(_.getName.startsWith("archive-"))
    assert(nArch > 1, "test should exercise multiple archives")
    assert(Compaction.readAll(spark, dst).rdd.getNumPartitions === nArch)
  }

  test("Compaction keys on full path: duplicate basenames fetch unambiguously") {
    val srcDir = new java.io.File(tmpDir() + "/har-dup"); srcDir.mkdirs()
    val a = new java.io.File(srcDir, "a"); a.mkdirs()
    val b = new java.io.File(srcDir, "b"); b.mkdirs()
    val bytesA = "alpha-content".getBytes("UTF-8")
    val bytesB = "beta-content-longer".getBytes("UTF-8")
    java.nio.file.Files.write(new java.io.File(a, "x.dat").toPath, bytesA)
    java.nio.file.Files.write(new java.io.File(b, "x.dat").toPath, bytesB)
    val dst = tmpDir() + "/har-dup-out"
    val manifest = Compaction.compact(spark, srcDir.getAbsolutePath, dst, 1024L)
    assert(manifest.count() === 2)
    // ambiguous basename fails fast instead of returning an arbitrary file
    val ex = intercept[IllegalArgumentException] {
      Compaction.fetch(spark, dst, "x.dat")
    }
    assert(ex.getMessage.contains("fetchPath"))
    // full-path fetch returns the right bytes for each
    val paths = manifest.select("path").collect().map(_.getString(0)).sorted
    assert(Compaction.fetchPath(spark, dst, paths(0)).toSeq === bytesA.toSeq)
    assert(Compaction.fetchPath(spark, dst, paths(1)).toSeq === bytesB.toSeq)
  }

  test("DataGen.text is deterministic and distributed") {
    val a = DataGen.text(spark, 100).collect().sortBy(_.getLong(0))
    val b = DataGen.text(spark, 100).collect().sortBy(_.getLong(0))
    assert(a.map(_.toString) === b.map(_.toString))
    assert(a.length === 100)
  }

  test("DataGen.piEstimate converges") {
    assert(math.abs(DataGen.piEstimate(spark, 100000L) - math.Pi) < 0.05)
  }

  test("DistCopy copies every file to the destination") {
    val src = tmpDir()
    val dst = tmpDir() + "/out"
    for (i <- 1 to 3)
      java.nio.file.Files.writeString(java.nio.file.Paths.get(src, s"f$i.txt"), s"content$i")
    val n = DistCopy.copy(spark, src, dst)
    assert(n === 3)
    val copied = new java.io.File(dst).listFiles().map(_.getName)
      .filterNot(_.startsWith(".")).toSet  // drop Hadoop .crc sidecars
    assert(copied === Set("f1.txt", "f2.txt", "f3.txt"))
    assert(java.nio.file.Files.readString(java.nio.file.Paths.get(dst, "f2.txt")) === "content2")
  }

  test("DistCopy -update: unchanged files skip, a changed file re-ships") {
    import java.nio.file.{Files, Paths}
    val src = tmpDir()
    val dst = tmpDir() + "/out"
    for (i <- 1 to 4)
      Files.writeString(Paths.get(src, s"f$i.txt"), s"content$i")
    assert(DistCopy.copy(spark, src, dst, update = true) === 4)
    // second run of an unchanged tree copies nothing
    assert(DistCopy.copy(spark, src, dst, update = true) === 0)
    // a same-length content change with a newer mtime re-ships exactly it
    Thread.sleep(20)
    Files.writeString(Paths.get(src, "f2.txt"), "CONTENT2")
    assert(DistCopy.copy(spark, src, dst, update = true) === 1)
    assert(Files.readString(Paths.get(dst, "f2.txt")) === "CONTENT2")
    // update=false still force-copies everything (the non-incremental mode)
    assert(DistCopy.copy(spark, src, dst) === 4)
  }

  test("DistCopy -update contentHash: catches a same-length backdated edit the quick check misses") {
    import java.nio.file.{Files, Paths}
    import java.nio.file.attribute.FileTime
    val src = tmpDir()
    val dst = tmpDir() + "/out"
    Files.writeString(Paths.get(src, "f.txt"), "aaaa")
    assert(DistCopy.copy(spark, src, dst, update = true) === 1)
    // same-length edit with the mtime backdated BEFORE the copy time —
    // the rsync-style quick check (len + src-not-newer) can't see it
    Files.writeString(Paths.get(src, "f.txt"), "bbbb")
    Files.setLastModifiedTime(Paths.get(src, "f.txt"),
      FileTime.fromMillis(System.currentTimeMillis() - 3600 * 1000))
    assert(DistCopy.copy(spark, src, dst, update = true) === 0,
      "documented quick-check blind spot: backdated same-length edit skips")
    assert(DistCopy.copy(spark, src, dst, update = true, contentHash = true) === 1,
      "contentHash mode must ship the changed bytes")
    assert(Files.readString(Paths.get(dst, "f.txt")) === "bbbb")
    // and a matching tree still copies nothing under contentHash
    assert(DistCopy.copy(spark, src, dst, update = true, contentHash = true) === 0)
  }

  test("observe() exposes counters like the reference's Counters API") {
    val observation = new org.apache.spark.sql.Observation("metrics")
    val df = Tables.lineitem(spark, sfDir)
      .observe(observation, count(lit(1)).as("rows_seen"), sum("l_quantity").as("qty"))
    df.write.mode("overwrite").format("noop").save()
    val m = observation.get
    assert(m("rows_seen") === Tables.lineitem(spark, sfDir).count())
    assert(m("qty").asInstanceOf[Double] > 0)
  }

  test("JSON: embedded props parse with from_json and files round-trip") {
    val parsed = Tables.events(spark, sfDir)
      .select(from_json(col("props"), org.apache.spark.sql.types.StructType.fromDDL("k INT")).as("p"))
      .select(col("p.k"))
    assert(parsed.filter(col("k").isNotNull).count() > 0)
    val dir = tmpDir() + "/json"
    Tables.nation(spark, sfDir).write.json(dir)
    assert(spark.read.json(dir).count() === 25)
  }

  test("registered views expose the warehouse to spark.sql") {
    Tables.registerViews(spark, sfDir)
    val r = spark.sql(
      """SELECT n_name, count(*) AS n FROM customer
        |JOIN nation ON c_nationkey = n_nationkey GROUP BY n_name""".stripMargin)
    assert(r.count() > 0)
    assert(spark.sql("SELECT count(*) FROM events WHERE ts IS NOT NULL").collect()(0).getLong(0) > 0)
  }

  test("compressed text round-trips through the gzip codec") {
    val dir = tmpDir() + "/gz"
    val lines = Tables.nation(spark, sfDir).select(col("n_name"))
    lines.write.option("compression", "gzip").text(dir)
    assert(new java.io.File(dir).listFiles().exists(_.getName.endsWith(".gz")))
    val back = Tables.readText(spark, dir)
    assert(back.count() === 25)
  }
}
