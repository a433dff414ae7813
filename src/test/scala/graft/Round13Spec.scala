package graft

import org.apache.spark.sql.functions._
import graft.sources.TxTable

/** Round-13 hardening: the bloom-index path-rendering regression
  * (URI-encoded roots), the per-dir HLL blob metadata bound, and
  * malformed `sx:` markers bailing to the scan. */
class Round13Spec extends SparkSpec {
  import spark.implicits._

  test("bloom index works on a table root that needs URI encoding") {
    // input_file_name() renders the PERCENT-ENCODED path; the driver
    // listing renders decoded. On a root with a space the two never
    // joined, every filter came out empty, and probes silently pruned
    // dirs that DID contain them — missing rows. The build must now
    // (a) produce correct filters here and (b) cross-check row counts
    // so any future rendering drift fails loudly instead.
    val root = tmpDir() + "/tx bloom dir"
    (0L to 2L).foreach { i =>
      TxTable.append((0L until 50L).map(j => (j * 3 + i, s"g$i"))
        .toDF("id", "grp"), root)
    }
    assert(TxTable.buildBloomIndex(spark, root, "id") === 3)
    // probe id=13 lives only in dir i=1 (13 % 3 == 1)
    val (kept, total) = TxTable.bloomSurvivingDirs(spark, root, "id",
      Seq(13L))
    assert(total === 3 && kept.nonEmpty && kept.size <= 2,
      s"kept ${kept.size} of $total — empty-filter regression?")
    val got = TxTable.readBloomFiltered(spark, root, "id", Seq(13L))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got === Set((13L, "g1")))
  }

  test("dense per-dir HLL blobs spill to in-dir sidecars; commit " +
    "lines stay bounded and the merged NDV still serves") {
    val root = tmpDir() + "/hll-bound"
    // 20 dirs × 3000 distinct values of u per dir: every dir's `u`
    // sketch goes DENSE (~2.7 KB base64) — inlining it would put
    // O(dirs × KB) on the commit-parsing planning path
    val df = (0L until 60000L).map(i => (i % 20, i)).toDF("p", "u")
    TxTable.appendPartitionedBy(df, root, Seq("p"), Seq("u"))
    // every entry line is bounded: no multi-KB base64 payloads inline
    val fsDir = new java.io.File(root, "_commits")
    val manifestDir = new java.io.File(root, "_manifests")
    val metaFiles = (Option(fsDir.listFiles()).toSeq.flatten ++
      Option(manifestDir.listFiles()).toSeq.flatten)
      .filter(f => f.isFile && !f.getName.startsWith(".")) // skip .crc
    val entryLines = metaFiles.flatMap(f =>
      scala.io.Source.fromFile(f, "UTF-8").getLines().toSeq)
      .filter(l => l.startsWith("dir:") || l.startsWith("delta:"))
    assert(entryLines.size >= 20)
    val maxLine = entryLines.map(_.length).max
    assert(maxLine <= 1024,
      s"entry line grew to $maxLine bytes — a dense HLL blob was " +
        "inlined instead of spilled")
    // the dense column carries the spill marker; the single-valued
    // partition key keeps its tiny list-mode blob inline
    assert(entryLines.forall(_.contains("hll:u=@")),
      "dense `u` sketches must spill to the in-dir sidecar")
    assert(entryLines.forall(l =>
      "hll:p=[A-Za-z0-9+/=]+".r.findFirstIn(l).isDefined),
      "tiny list-mode `p` sketches must stay inline")
    // sidecars live IN the dir (underscore-hidden: invisible to scans,
    // vacuumed with the dir) — hex-named after the column
    val dataDir = new java.io.File(root, "data")
    val leafDirs = Option(dataDir.listFiles()).toSeq.flatten
      .filter(_.isDirectory)
      .flatMap(d => Option(d.listFiles()).toSeq.flatten)
      .filter(_.isDirectory)
    assert(leafDirs.size === 20)
    assert(leafDirs.forall(d => new java.io.File(d, "_hll-75").isFile),
      "every dir must hold its spilled `u` sketch (hex(u)=75)")
    // the merge path resolves the sidecars: NDV stays ANALYZE-grade
    val ndv = TxTable.columnNdv(spark, root)
    assert(ndv("u") > 55000L && ndv("u") < 65000L, s"got ${ndv("u")}")
    assert(ndv.get("p") === Some(20L), s"got $ndv")
    // the table reads back whole — the sidecar never leaks into scans
    assert(TxTable.read(spark, root).count() === 60000L)
  }

  test("spilled HLL sidecars serve across clones and time travel") {
    // clone entries carry ABSOLUTE source dirs; the sidecar resolver
    // must follow them (a sidecar lives IN its dir, wherever that is)
    val src = tmpDir() + "/hll-clone-src"
    val dst = tmpDir() + "/hll-clone-dst"
    val df = (0L until 12000L).map(i => (i % 4, i)).toDF("p", "u")
    TxTable.appendPartitionedBy(df, src, Seq("p"), Seq("u"))
    assert(TxTable.columnNdv(spark, src)("u") > 11000L)
    TxTable.cloneAt(spark, src, dst)
    val cloned = TxTable.columnNdv(spark, dst)
    assert(cloned("u") > 11000L && cloned("u") < 13000L,
      s"the clone must resolve the source's in-dir sidecars: $cloned")
    // time travel: v1 of the source still serves its own sketches
    // after a later append without them
    TxTable.append(Seq((9L, 999999L)).toDF("p", "u"), src)
    assert(TxTable.columnNdv(spark, src, version = 1)("u") > 11000L)
  }

  test("hist: headers carry across data commits and void on change") {
    val root = tmpDir() + "/hist-carry"
    val df = (1L to 2000L).map(i => (i, i % 50)).toDF("k", "g")
    TxTable.append(df, root, statsCols = Seq("k", "g"))
    TxTable.analyze(spark, root, exact = true, histograms = true)
    val h0 = TxTable.columnHistograms(spark, root)
    assert(h0.contains("k") && h0.contains("g"))
    // a METADATA-ONLY commit (rename) keeps entries identical: the
    // carried histogram stays provably fresh and keeps serving under
    // the new logical name's physical column
    TxTable.renameColumn(spark, root, "g", "grp")
    val h1 = TxTable.columnHistograms(spark, root)
    assert(h1.contains("grp") && !h1.contains("g"),
      s"carried histograms must follow the colmap: ${h1.keySet}")
    // a DATA commit changes the entry multiset: stale distributions
    // must stop serving (never misprice filters on data they don't
    // describe)
    TxTable.append(Seq((99999L, 1L)).toDF("k", "grp"), root)
    assert(TxTable.columnHistograms(spark, root).isEmpty)
  }

  test("a malformed sx: marker reads as unprovable, never as a " +
    "wrong exact value") {
    val root = tmpDir() + "/sx-corrupt"
    val df = Seq((1L, "aa"), (2L, "aa"), (3L, "bb")).toDF("k", "cat")
    TxTable.appendPartitioned(df, root, "cat")
    // the healthy table answers the grouped count from metadata alone
    val healthy = TxTable.metadataGroupedAgg(spark, root, -1,
      Seq("cat"), Seq.empty)
    assert(healthy.isDefined &&
      healthy.get.map(g => (g._1.head, g._2)).toSet ===
        Set(("aa", 2L), ("bb", 1L)))
    // corrupt the latest commit: truncate one sx: hex payload to odd
    // length (a torn/bit-rotted commit segment)
    val commits = new java.io.File(root, "_commits").listFiles()
      .filter(f => f.isFile && f.getName.startsWith("v")).sortBy(_.getName)
    val latest = commits.last
    val body = scala.io.Source.fromFile(latest).mkString
    assert(body.contains("sx:cat="))
    // drop exactly one trailing hex char of every sx:cat payload
    val oddBody = "sx:cat=([0-9a-f]+)".r.replaceAllIn(body,
      m => "sx:cat=" + m.group(1).dropRight(1))
    assert(oddBody != body)
    java.nio.file.Files.write(latest.toPath, oddBody.getBytes("UTF-8"))
    // the grouped-metadata face must BAIL (None) — not serve a key
    // decoded from garbage
    val after = TxTable.metadataGroupedAgg(spark, root, -1,
      Seq("cat"), Seq.empty)
    assert(after.isEmpty,
      "odd-length sx: hex must make clustering unprovable")
    // and the data itself still reads correctly (the scan path never
    // trusted the marker)
    assert(TxTable.read(spark, root).count() === 3L)
  }
}
