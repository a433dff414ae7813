package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Snapshot-versioned transactional table — the warehouse's
  * atomically-loadable table (the role a transactional table format
  * plays under a continuous load; ref analog: the reference warehouse
  * loads partitions atomically by renaming completed directories into
  * the table location, src/tools/org/apache/hadoop/tools/
  * HadoopArchives.java-era hygiene generalized).
  *
  * Layout under `root`:
  *   data/<op>-<uuid>/    immutable parquet directories (never edited)
  *   _commits/v00000001   one file per snapshot, listing its data dirs
  *
  * Invariants that make it transactional on any Hadoop filesystem:
  *  - data directories are written FIRST and are immutable; a commit
  *    file only ever points at fully-written data;
  *  - a commit is ONE `fs.create(path, overwrite = false)` — an atomic
  *    claim of version N+1. Losing a race throws, and the writer
  *    retries against the NEW snapshot (optimistic concurrency);
  *  - readers resolve a version's file list once, then read immutable
  *    dirs — a concurrent commit can never tear a read (snapshot
  *    isolation); old versions stay readable (time travel) until
  *    `vacuum`.
  */
object TxTable {

  private def fsFor(spark: SparkSession, root: String): (FileSystem, Path) = {
    val p = new Path(root)
    (p.getFileSystem(spark.sessionState.newHadoopConf()), p)
  }

  private def commitDir(root: Path) = new Path(root, "_commits")
  private def commitPath(root: Path, v: Int) =
    new Path(commitDir(root), f"v$v%08d")

  /** Highest committed version, or 0 if the table is empty/absent. */
  def latestVersion(spark: SparkSession, root: String): Int = {
    val (fs, rp) = fsFor(spark, root)
    val cd = commitDir(rp)
    if (!fs.exists(cd)) 0
    else fs.listStatus(cd).map(_.getPath.getName)
      .filter(n => n.startsWith("v") && n.drop(1).forall(_.isDigit))
      .map(_.drop(1).toInt).foldLeft(0)(math.max)
  }

  private def readFileUtf8(fs: FileSystem, p: Path): String = {
    val len = fs.getFileStatus(p).getLen.toInt
    val buf = new Array[Byte](len)
    val in = fs.open(p)
    try { in.readFully(buf); new String(buf, "UTF-8") } finally in.close()
  }

  /** Entries of snapshot `v` in commit order: (isDelta, dirName).
    * `dir:` entries hold full rows; `delta:` entries hold keyed
    * (k, op, v) changes to resolve at read time (merge-on-read). */
  private def snapshotEntries(fs: FileSystem, root: Path,
    v: Int): Seq[(Boolean, String)] = {
    if (v == 0) Seq.empty
    else readFileUtf8(fs, commitPath(root, v)).split("\n").toSeq.flatMap {
      case l if l.startsWith("dir:") => Some((false, l.drop(4)))
      case l if l.startsWith("delta:") => Some((true, l.drop(6)))
      case _ => None
    }
  }

  private def snapshotDirs(fs: FileSystem, root: Path, v: Int): Seq[String] =
    snapshotEntries(fs, root, v).map(_._2)

  /** Read snapshot `version` (default: latest). A snapshot with no
    * delta entries reads as the plain union of its data dirs (append
    * semantics untouched); one with deltas resolves merge-on-read:
    * later entries override earlier ones per key, deletes drop. */
  def read(spark: SparkSession, root: String, version: Int = -1): DataFrame = {
    val (fs, rp) = fsFor(spark, root)
    val v = if (version >= 0) version else latestVersion(spark, root)
    require(v > 0, s"txtable: no committed snapshot at $root")
    val entries = snapshotEntries(fs, rp, v)
    require(entries.nonEmpty, s"txtable: snapshot v$v of $root is empty")
    if (!entries.exists(_._1))
      spark.read.parquet(entries.map(e => new Path(rp, e._2).toString): _*)
    else {
      // Merge-on-read, scale-safe: the base (the dirs committed before
      // any delta — after compaction, exactly one) is 100 TB-class and
      // must never shuffle on `k` just because a small delta exists.
      // Split the snapshot at the first delta entry:
      //   base   = dir entries before it (full rows);
      //   tail   = everything from it on — deltas, plus any full-row
      //            dirs appended after a delta, which act as all-'U'
      //            upsert batches at their commit position.
      // The tail is batch-sized (compaction bounds it), so:
      //   1. resolve the tail alone with one keyed window (small);
      //   2. anti-join the base against the tail's key set — broadcast,
      //      so the base is scanned once and never exchanged;
      //   3. union the base survivors with the tail's live rows.
      // Copy-on-write would instead rewrite the table per micro-batch;
      // this keeps commits O(batch) AND reads O(scan).
      val firstDelta = entries.indexWhere(_._1)
      val (baseE, tailE) = entries.zipWithIndex.splitAt(firstDelta)
      val baseParts = baseE.map { case ((_, d), _) =>
        spark.read.parquet(new Path(rp, d).toString).select("k", "v")
      }
      // >1 base dir (appends never compacted) needs later-dir-wins
      // resolution; the steady-state single compacted base skips it.
      val base =
        if (baseParts.isEmpty) spark.range(0)
          .select(col("id").as("k"), lit(null).cast("double").as("v"))
        else if (baseParts.size == 1) baseParts.head
        else {
          val wb = Window.partitionBy("k").orderBy(col("_cv").desc)
          baseParts.zipWithIndex
            .map { case (df, i) => df.withColumn("_cv", lit(i.toLong)) }
            .reduce(_.unionByName(_))
            .withColumn("_rn", row_number().over(wb))
            .filter(col("_rn") === 1).select("k", "v")
        }
      val tailParts = tailE.map { case ((isDelta, d), i) =>
        val df = spark.read.parquet(new Path(rp, d).toString)
        val keyed = if (isDelta) df else df.withColumn("op", lit("U"))
        keyed.select(col("k"), col("op"), col("v"), lit(i.toLong).as("_cv"))
      }
      val wt = Window.partitionBy("k").orderBy(col("_cv").desc)
      val tail = tailParts.reduce(_.unionByName(_))
        .withColumn("_rn", row_number().over(wt))
        .filter(col("_rn") === 1)
        .select("k", "op", "v")
      val survivors = base.join(broadcast(tail.select("k")), Seq("k"), "left_anti")
      survivors.unionByName(tail.filter(col("op") =!= "D").select("k", "v"))
    }
  }

  /** True once the table has at least one committed snapshot. */
  def exists(spark: SparkSession, root: String): Boolean =
    latestVersion(spark, root) > 0

  /** Commit history: version, operation, data-dir count. */
  def history(spark: SparkSession, root: String): Seq[(Int, String, Int)] = {
    val (fs, rp) = fsFor(spark, root)
    (1 to latestVersion(spark, root)).map { v =>
      val txt = readFileUtf8(fs, commitPath(rp, v))
      val op = txt.split("\n").find(_.startsWith("op:")).map(_.drop(3))
        .getOrElse("?")
      val n = txt.split("\n")
        .count(l => l.startsWith("dir:") || l.startsWith("delta:"))
      (v, op, n)
    }
  }

  /** Write `df` as a new immutable data dir and commit `dirs(prev) ++
    * [it]` (op = append) or `[it]` (op = overwrite) as the next
    * version. Retries the atomic claim on conflict. */
  private def writeAndCommit(df: DataFrame, root: String, op: String,
    keepPrev: Boolean): Int = {
    val spark = df.sparkSession
    val (fs, rp) = fsFor(spark, root)
    val dirName = s"data/$op-${java.util.UUID.randomUUID()}"
    df.write.mode("overwrite").parquet(new Path(rp, dirName).toString)
    commitRetry(spark, root) { prevV =>
      val prev = if (keepPrev) snapshotLines(fs, rp, prevV) else Seq.empty
      (op, prev :+ s"dir:$dirName")
    }
  }

  /** Raw entry lines of a snapshot, preserving dir/delta kinds. */
  private def snapshotLines(fs: FileSystem, rp: Path, v: Int): Seq[String] =
    snapshotEntries(fs, rp, v).map { case (isDelta, d) =>
      if (isDelta) s"delta:$d" else s"dir:$d"
    }

  /** The optimistic-concurrency loop: build the commit content against
    * the current snapshot, claim version+1 atomically, retry from the
    * NEW snapshot if another writer claimed it first. */
  private def commitRetry(spark: SparkSession, root: String,
    maxRetries: Int = 10)(
    content: Int => (String, Seq[String])): Int = {
    val (fs, rp) = fsFor(spark, root)
    fs.mkdirs(commitDir(rp))
    var attempt = 0
    while (attempt <= maxRetries) {
      val prevV = latestVersion(spark, root)
      val (op, lines) = content(prevV)
      val body = (s"op:$op" +: lines).mkString("\n")
      val claim = commitPath(rp, prevV + 1)
      try {
        // overwrite = false: the atomic claim of version prevV+1
        val out = fs.create(claim, false)
        try out.write(body.getBytes("UTF-8")) finally out.close()
        return prevV + 1
      } catch {
        // Only a lost race is retryable: the claimed version already
        // exists. Some filesystems signal that as a generic IOException,
        // so probe for the file. Anything else (permissions, quota, a
        // dead filesystem) is a real failure — rethrow instead of
        // re-running the content builder (for merge, a full O(table)
        // recompute) nine more times and misreporting it as contention.
        case _: org.apache.hadoop.fs.FileAlreadyExistsException =>
          attempt += 1
        case e: java.io.IOException =>
          if (fs.exists(claim)) attempt += 1 else throw e
      }
    }
    throw new IllegalStateException(
      s"txtable: commit to $root failed after $maxRetries conflicts")
  }

  /** Append `df` as a new snapshot (previous data retained). */
  def append(df: DataFrame, root: String): Int =
    writeAndCommit(df, root, "append", keepPrev = true)

  /** Replace the table contents with `df` atomically. */
  def overwrite(df: DataFrame, root: String): Int =
    writeAndCommit(df, root, "overwrite", keepPrev = false)

  /** Copy-on-write CDC merge — the transactional target of the
    * streaming upsert: `changes` rows (k, op, v, seq) fold into the
    * keyed snapshot exactly like Olap.cdcMerge (highest seq per key
    * wins; 'D' deletes, 'I'/'U' set). The merged result is written as
    * a full new snapshot and committed atomically; a reader either
    * sees the whole batch applied or none of it. On a commit conflict
    * the merge RECOMPUTES against the winner's snapshot, so
    * concurrent mergers serialize instead of losing updates. */
  def merge(spark: SparkSession, root: String, changes: DataFrame): Int = {
    val w = Window.partitionBy("k").orderBy(col("seq").desc)
    val latest = changes.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).select("k", "op", "v")
    val (fs, rp) = fsFor(spark, root)
    commitRetry(spark, root) { prevV =>
      val base =
        if (prevV > 0) read(spark, root, prevV).select(col("k"), col("v").as("base_v"))
        else spark.range(0).select(col("id").as("k"),
          lit(null).cast("double").as("base_v"))
      val merged = base.join(latest, Seq("k"), "full_outer")
        .filter(col("op").isNull || col("op") =!= "D")
        .select(col("k"), coalesce(col("v"), col("base_v")).as("v"))
      val dirName = s"data/merge-${java.util.UUID.randomUUID()}"
      merged.write.mode("overwrite").parquet(new Path(rp, dirName).toString)
      ("merge", Seq(s"dir:$dirName"))
    }
  }

  /** Merge-on-READ CDC: write ONLY the batch's resolved changes as a
    * delta entry — O(batch) per commit instead of merge's O(table)
    * copy-on-write, the shape that survives a continuous load into a
    * 100 TB table. Readers resolve deltas (read() window); call
    * `compactSnapshot` periodically to fold them back so read cost
    * stays bounded. The delta dir is written once; only the cheap
    * commit claim retries under contention. */
  def mergeDelta(spark: SparkSession, root: String, changes: DataFrame): Int = {
    val w = Window.partitionBy("k").orderBy(col("seq").desc)
    val latest = changes.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).select("k", "op", "v")
    val (fs, rp) = fsFor(spark, root)
    val dirName = s"data/delta-${java.util.UUID.randomUUID()}"
    latest.write.mode("overwrite").parquet(new Path(rp, dirName).toString)
    commitRetry(spark, root) { prevV =>
      ("delta", snapshotLines(fs, rp, prevV) :+ s"delta:$dirName")
    }
  }

  /** Fold all deltas of the current snapshot into one materialized
    * data dir (the compaction job that bounds merge-on-read cost).
    * Readers of the new version pay zero resolution; old versions
    * remain time-travelable until vacuum. */
  def compactSnapshot(spark: SparkSession, root: String): Int = {
    val (fs, rp) = fsFor(spark, root)
    commitRetry(spark, root) { prevV =>
      require(prevV > 0, s"txtable: nothing to compact at $root")
      val resolved = read(spark, root, prevV)
      val dirName = s"data/compact-${java.util.UUID.randomUUID()}"
      resolved.write.mode("overwrite").parquet(new Path(rp, dirName).toString)
      ("compact", Seq(s"dir:$dirName"))
    }
  }

  /** Oracle-gated end-to-end CDC exercise (q_txtable_mor): derive a
    * deterministic change stream from `orders` (key = custkey, op
    * from orderkey residues, seq = orderkey), commit it as TWO
    * merge-on-read delta batches split on a seq boundary (so commit
    * order agrees with seq order and the resolved table equals one
    * global latest-per-key window), then `read` back through the
    * broadcast-anti-join resolution path. The DuckDB oracle replays
    * the same stream as a plain window — hash equality proves the
    * whole write→commit→resolve pipeline, not just unit behavior. */
  def cdcGateQuery(spark: SparkSession, dir: String): DataFrame = {
    val root = java.nio.file.Files
      .createTempDirectory("graft-txgate").toString
    val changes = graft.Tables.orders(spark, dir).select(
      col("o_custkey").as("k"),
      expr("CASE WHEN o_orderkey % 10 = 0 THEN 'D' " +
        "WHEN o_orderkey % 3 = 0 THEN 'U' ELSE 'I' END").as("op"),
      col("o_totalprice").as("v"),
      col("o_orderkey").as("seq"))
    // 1-row readback to pick the batch boundary (metadata-scale)
    val mid = changes.agg(max("seq")).collect()(0).getLong(0) / 2
    mergeDelta(spark, root, changes.filter(col("seq") <= mid))
    mergeDelta(spark, root, changes.filter(col("seq") > mid))
    read(spark, root)
  }

  /** Drop data directories not referenced by the latest `retainLast`
    * snapshots, then drop the commit files older than that horizon.
    * Time travel remains valid inside the horizon. */
  def vacuum(spark: SparkSession, root: String, retainLast: Int = 1): Unit = {
    require(retainLast >= 1, "vacuum must retain at least the latest snapshot")
    val (fs, rp) = fsFor(spark, root)
    val v = latestVersion(spark, root)
    if (v == 0) return
    val keepVs = (math.max(1, v - retainLast + 1)) to v
    val keep = keepVs.flatMap(snapshotDirs(fs, rp, _)).toSet
    val dataDir = new Path(rp, "data")
    if (fs.exists(dataDir))
      fs.listStatus(dataDir).map(_.getPath)
        .filterNot(p => keep.contains("data/" + p.getName))
        .foreach(fs.delete(_, true))
    (1 until keepVs.head).foreach(old => fs.delete(commitPath(rp, old), false))
  }
}
