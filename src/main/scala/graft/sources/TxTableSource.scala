package graft.sources

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, Row, SaveMode, SparkSession, SQLContext}
import org.apache.spark.sql.execution.FileRelation
import org.apache.spark.sql.execution.streaming.{Offset, Sink, Source}
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType

/** The standard read/write face of [[TxTable]] — `graft-tx` as a
  * registered data source (ref analog: the reference warehouse's
  * tables are named, engine-addressable load targets,
  * src/contrib/hive-streaming/build.xml:1; here the transactional
  * table becomes addressable through the engine's own format API):
  *
  * {{{
  *   spark.read.format("graft-tx")
  *     .option("versionAsOf", 3)            // or timestampAsOf
  *     .option("colRange.k", "100,200")     // stats-based dir skipping
  *     .load(root)
  *   df.write.format("graft-tx").mode("append")
  *     .option("statsCols", "k").save(root)
  *   spark.sql(s"CREATE TABLE t USING `graft-tx` OPTIONS (path '$root')")
  *   spark.readStream.format("graft-tx").load(root)   // tail the feed
  *   df.writeStream.format("graft-tx")                 // exactly-once
  *     .option("path", root).option("keys", "k").start()   //   load
  * }}}
  *
  * Architecture: a relation wrapping the snapshot-resolved plan — the
  * shape Delta Lake's own batch DataSource uses — rather than a
  * DataSourceV2 record reader, because a merge-on-read snapshot IS a
  * multi-operator Spark plan (window resolution + broadcast anti-join
  * over vectorized parquet scans), not a per-partition record stream;
  * re-implementing it under PartitionReader would forfeit exactly the
  * codegen/pushdown machinery `TxTable.read` already composes.
  * Pushdown still flows BOTH ways:
  *  - options → snapshot pinning (versionAsOf / timestampAsOf) and
  *    range-box dir pruning before a single footer is opened;
  *  - Catalyst's pushed filters → integral-column ranges intersected
  *    into the same dir pruning, plus predicate/projection pushdown
  *    into the inner parquet scans (`buildScan`'s required columns and
  *    filters reach the resolved plan, and Spark re-checks every
  *    filter above, so over-pruning is impossible and under-pruning
  *    only costs I/O).
  * `Dataset.inputFiles` reports the surviving data files (the relation
  * implements FileRelation), so dir skipping is observable — and
  * testable — from the standard API.
  */
class TxTableSource extends RelationProvider
  with CreatableRelationProvider with DataSourceRegister
  with StreamSourceProvider with StreamSinkProvider {

  override def shortName(): String = "graft-tx"

  // ---- streaming face: the change feed as a micro-batch source ----
  // `spark.readStream.format("graft-tx").load(root)` tails the commit
  // log: each micro-batch is the change rows (data..., op,
  // commit_version) of the commit versions that arrived since the
  // last processed offset — the table is a streaming SOURCE exactly
  // as it is already an exactly-once streaming sink. Offsets are
  // commit versions, so checkpoint recovery replays a half-processed
  // batch identically (commits are immutable) and never re-delivers
  // a completed one.

  override def sourceSchema(sqlContext: SQLContext,
    schema: Option[StructType], providerName: String,
    parameters: Map[String, String]): (String, StructType) =
    (shortName(), TxStreamSource.feedSchema(
      sqlContext.sparkSession, TxTableSource.rootOf(parameters)))

  override def createSource(sqlContext: SQLContext, metadataPath: String,
    schema: Option[StructType], providerName: String,
    parameters: Map[String, String]): Source =
    new TxStreamSource(sqlContext.sparkSession,
      TxTableSource.rootOf(parameters),
      // first commit version INCLUDED in the feed (default 1 = full
      // history); lets a consumer start from "now-ish" instead of
      // replaying a vacuum-bounded backlog
      startingVersion = parameters.get("startingVersion")
        .orElse(parameters.get("startingversion")).map(_.toInt).getOrElse(1))

  // ---- streaming sink: exactly-once micro-batch loads ----
  // `df.writeStream.format("graft-tx").option("path", root)` commits
  // each micro-batch transactionally, tagged with its batch id, so a
  // replayed batch (restart after a sink-side crash) is recognized
  // and skipped — at-least-once delivery composes to exactly-once
  // table state. With option `keys`, batches are CDC rows
  // (keys..., op, values..., seq) applied as O(batch) merge-on-read
  // deltas; without, plain appends. Complete mode overwrites.

  override def createSink(sqlContext: SQLContext,
    parameters: Map[String, String], partitionColumns: Seq[String],
    outputMode: OutputMode): Sink = {
    require(partitionColumns.isEmpty,
      "graft-tx sink: partitionBy is not supported (dir layout is " +
        "commit-managed; use statsCols for pruning)")
    val keyCols = parameters.get("keys")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    val statsCols = parameters.get("statsCols").orElse(parameters.get("statscols"))
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq.empty)
    // replay-protection tags are scoped per STREAM, or two queries
    // writing one table would collide on bare batch ids (both start
    // at 0) and silently drop each other's batches. The checkpoint
    // location IS the query's durable identity — the same checkpoint
    // is the same logical stream across restarts.
    val streamId = parameters.get("checkpointlocation")
      .orElse(parameters.get("checkpointLocation"))
      .orElse(parameters.get("queryname")).orElse(parameters.get("queryName"))
      .map(s => java.lang.Long.toHexString(
        scala.util.hashing.MurmurHash3.stringHash(s).toLong & 0xffffffffL))
      .getOrElse("default")
    new TxStreamSink(TxTableSource.rootOf(parameters), keyCols, statsCols,
      complete = outputMode == OutputMode.Complete(), streamId = streamId)
  }

  override def createRelation(sqlContext: SQLContext,
    parameters: Map[String, String]): BaseRelation =
    TxRelation(sqlContext.sparkSession, TxTableSource.rootOf(parameters),
      parameters)

  override def createRelation(sqlContext: SQLContext, mode: SaveMode,
    parameters: Map[String, String], data: DataFrame): BaseRelation = {
    val spark = sqlContext.sparkSession
    val root = TxTableSource.rootOf(parameters)
    val statsCols = parameters.get("statsCols").orElse(parameters.get("statscols"))
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq.empty)
    mode match {
      case SaveMode.Append => TxTable.append(data, root, statsCols)
      case SaveMode.Overwrite => TxTable.overwrite(data, root, statsCols)
      case SaveMode.ErrorIfExists =>
        if (TxTable.exists(spark, root))
          throw new IllegalStateException(
            s"graft-tx: table at $root already exists (mode=ErrorIfExists)")
        TxTable.append(data, root, statsCols)
      case SaveMode.Ignore =>
        if (!TxTable.exists(spark, root)) TxTable.append(data, root, statsCols)
    }
    createRelation(sqlContext, parameters)
  }
}

object TxTableSource {
  private def rootOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft-tx requires a path (load(root) or OPTIONS (path '...'))"))

  /** timestampAsOf accepts epoch millis, an ISO-8601 instant, or a
    * local `yyyy-MM-dd HH:mm:ss` timestamp (session-zone-free: local
    * timestamps resolve in the JVM default zone, matching what a user
    * reading the commit file's mtime on this machine sees). */
  private[graft] def parseTs(s: String): Long =
    s.toLongOption.getOrElse {
      scala.util.Try(java.time.Instant.parse(s).toEpochMilli).getOrElse(
        java.sql.Timestamp.valueOf(s).getTime)
    }

  /** `colRange.<name> = "lo,hi"` options (plus bare `keyRange`),
    * collected case-preservingly for the column part. */
  private[graft] def optionRanges(
    parameters: Map[String, String]): Map[String, (Long, Long)] =
    parameters.flatMap { case (k, v) =>
      if (k.toLowerCase(java.util.Locale.ROOT)
        .startsWith("colrange.") && k.length > 9)
        Some(k.substring(9) -> parseRange(k, v))
      else None
    }

  private[graft] def parseRange(key: String, v: String): (Long, Long) =
    v.split(",").map(_.trim) match {
      case Array(lo, hi) => (lo.toLong, hi.toLong)
      case _ => throw new IllegalArgumentException(
        s"graft-tx: option $key must be 'lo,hi', got '$v'")
    }

  /** Integral bounds implied by Catalyst's pushed filters, for dir
    * pruning. Conservative by construction: only shapes that imply a
    * contiguous [lo, hi] on one column contribute; everything else is
    * ignored (Spark re-applies all filters above the scan anyway). */
  private[graft] def rangesFromFilters(
    filters: Array[Filter]): Map[String, (Long, Long)] = {
    def longOf(v: Any): Option[Long] = v match {
      case l: Long => Some(l)
      case i: Int => Some(i.toLong)
      case s: Short => Some(s.toLong)
      case b: Byte => Some(b.toLong)
      case i: java.lang.Integer => Some(i.toLong)
      case l: java.lang.Long => Some(l.longValue)
      case _ => None
    }
    def boundsOf(f: Filter): Seq[(String, (Long, Long))] = f match {
      case EqualTo(a, v) => longOf(v).map(x => a -> (x, x)).toSeq
      case GreaterThan(a, v) => longOf(v).filter(_ < Long.MaxValue)
        .map(x => a -> (x + 1, Long.MaxValue)).toSeq
      case GreaterThanOrEqual(a, v) =>
        longOf(v).map(x => a -> (x, Long.MaxValue)).toSeq
      case LessThan(a, v) => longOf(v).filter(_ > Long.MinValue)
        .map(x => a -> (Long.MinValue, x - 1)).toSeq
      case LessThanOrEqual(a, v) =>
        longOf(v).map(x => a -> (Long.MinValue, x)).toSeq
      case In(a, vs) if vs.nonEmpty =>
        val ls = vs.toSeq.map(longOf)
        if (ls.forall(_.isDefined)) {
          val xs = ls.flatten
          Seq(a -> (xs.min, xs.max))
        } else Seq.empty
      case And(l, r) => boundsOf(l) ++ boundsOf(r)
      case _ => Seq.empty
    }
    filters.toSeq.flatMap(boundsOf)
      .groupMapReduce(_._1)(_._2)(intersect)
  }

  private[graft] def intersect(a: (Long, Long),
    b: (Long, Long)): (Long, Long) =
    (math.max(a._1, b._1), math.min(a._2, b._2))

  /** Pushed filters as Column predicates over the RESOLVED snapshot —
    * gets predicate pushdown into the inner parquet scans for plain
    * tables and early row pruning for merge-on-read ones. Untranslated
    * filters are simply skipped (Spark re-checks everything above). */
  private[graft] def toPredicate(f: Filter): Option[Column] = f match {
    case EqualTo(a, v) => Some(col(a) === lit(v))
    case EqualNullSafe(a, v) => Some(col(a) <=> lit(v))
    case GreaterThan(a, v) => Some(col(a) > lit(v))
    case GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
    case LessThan(a, v) => Some(col(a) < lit(v))
    case LessThanOrEqual(a, v) => Some(col(a) <= lit(v))
    case In(a, vs) => Some(col(a).isin(vs.toIndexedSeq: _*))
    case IsNull(a) => Some(col(a).isNull)
    case IsNotNull(a) => Some(col(a).isNotNull)
    case StringStartsWith(a, p) => Some(col(a).startsWith(p))
    case StringEndsWith(a, p) => Some(col(a).endsWith(p))
    case StringContains(a, p) => Some(col(a).contains(p))
    case Not(c) => toPredicate(c).map(!_)
    case And(l, r) => for { a <- toPredicate(l); b <- toPredicate(r) }
      yield a && b
    case Or(l, r) => for { a <- toPredicate(l); b <- toPredicate(r) }
      yield a || b
    case _ => None
  }
}

/** One `graft-tx` read: snapshot selection from options, scan-time
  * range pruning from options ∩ pushed filters. The version is
  * re-resolved per scan (not pinned at relation construction), so a
  * catalog table over a continuously-loaded root follows the table —
  * Spark's own per-query plan gives each query snapshot isolation. */
case class TxRelation(spark: SparkSession, root: String,
  parameters: Map[String, String])
  extends BaseRelation with PrunedFilteredScan with FileRelation {

  private val versionOpt = parameters.get("versionAsOf")
    .orElse(parameters.get("versionasof")).map(_.toInt)
  private val tsOpt = parameters.get("timestampAsOf")
    .orElse(parameters.get("timestampasof")).map(TxTableSource.parseTs)
  require(versionOpt.isEmpty || tsOpt.isEmpty,
    "graft-tx: versionAsOf and timestampAsOf are mutually exclusive")
  private val optRanges = TxTableSource.optionRanges(parameters) ++
    parameters.get("keyRange").orElse(parameters.get("keyrange"))
      .map(v => "__keyRange__" -> TxTableSource.parseRange("keyRange", v))

  private def keyRangeOpt: Option[(Long, Long)] = optRanges.get("__keyRange__")
  // DataFrameReader options pass through a CaseInsensitiveMap whose
  // iterator yields LOWERCASED keys, so `colRange.Price` arrives as
  // `colrange.price` — resolve the column part against the real
  // schema case-insensitively or mixed-case columns silently lose
  // their range (no pruning AND no row filter)
  private def resolveCol(c: String): String =
    unprunedSchema.fieldNames.find(_.equalsIgnoreCase(c)).getOrElse(c)
  private def colRangesOf(extra: Map[String, (Long, Long)]) = {
    val base = (optRanges - "__keyRange__").map { case (c, r) =>
      resolveCol(c) -> r
    }
    base ++ extra.map { case (c, r) =>
      c -> base.get(c).map(TxTableSource.intersect(_, r)).getOrElse(r)
    }
  }

  private def resolvedVersion: Int = tsOpt match {
    case Some(ts) => TxTable.versionAt(spark, root, ts)
    case None => versionOpt.getOrElse(-1)
  }

  override def sqlContext: SQLContext = spark.sqlContext

  // ranges filter rows, never columns — the un-ranged probe also
  // breaks the schema → resolveCol → colRangesOf → schema cycle
  private lazy val unprunedSchema: StructType =
    TxTable.read(spark, root, version = resolvedVersion).schema

  override val schema: StructType = unprunedSchema

  override def buildScan(requiredColumns: Array[String],
    filters: Array[Filter]): RDD[Row] = {
    val df = TxTable.read(spark, root, version = resolvedVersion,
      keyRange = keyRangeOpt,
      colRanges = colRangesOf(TxTableSource.rangesFromFilters(filters)))
    // Un-pinned relations re-resolve the version per scan (a catalog
    // table follows a continuously-loaded root), so a commit may have
    // landed since load(). TxTable evolution only WIDENS by name, so
    // the relation's declared columns stay valid — but an overwrite
    // can drop them; fail with intent instead of a confusing
    // downstream AnalysisException.
    val missing = schema.fieldNames.filterNot(df.columns.contains)
    require(missing.isEmpty,
      s"graft-tx: column(s) ${missing.mkString(",")} vanished from $root " +
        "since this relation was created (overwrite with a narrower " +
        "schema?) - re-load or REFRESH TABLE")
    val filtered = filters.flatMap(TxTableSource.toPredicate)
      .foldLeft(df)(_ filter _)
    // empty requiredColumns (SELECT count(*)) legitimately projects to
    // zero-field rows — never ship full-width rows Spark will discard
    filtered.select(requiredColumns.map(col).toIndexedSeq: _*).rdd
  }

  override def inputFiles: Array[String] =
    TxTable.dataFiles(spark, root, version = resolvedVersion,
      keyRange = keyRangeOpt, colRanges = colRangesOf(Map.empty))
}

/** Offset = commit version. Immutable commits make version ranges a
  * perfect streaming offset: replayable, ordered, exactly-once. */
case class TxVersionOffset(v: Int) extends Offset {
  override def json(): String = v.toString
}

/** V1 micro-batch source over the [[TxTable]] change feed. Each batch
  * evaluates `TxTable.changes(root, lo, hi)` — the same oracle-gated
  * relation the batch API serves — and re-tags it streaming through
  * the audited bridge (the one `private[sql]` call a V1 source needs;
  * see plans.SqlBridge). The source never caches table state: offsets
  * come from the commit log on every poll, so concurrent writers
  * (OCC) surface naturally as new batches. */
class TxStreamSource(spark: SparkSession, root: String,
  startingVersion: Int = 1) extends Source {
  require(startingVersion >= 1,
    s"graft-tx streaming: startingVersion must be >= 1, got $startingVersion")

  override val schema: StructType = TxStreamSource.feedSchema(spark, root)

  override def getOffset: Option[Offset] = {
    val v = TxTable.latestVersion(spark, root)
    // nothing to emit until the starting version exists
    if (v < startingVersion) None else Some(TxVersionOffset(v))
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val lo = start.map(TxStreamSource.versionOf)
      .getOrElse(startingVersion - 1)
    val hi = TxStreamSource.versionOf(end)
    // conform to the declared schema: V1 splices batch columns into
    // the plan BY POSITION, and a delta commit's change frame orders
    // them (keys, op, values) while the snapshot-derived source
    // schema orders (data, op) — a positional mismatch would silently
    // mis-bind columns (or crash the sink's encoder)
    val batch = TxTable.changes(spark, root, lo, hi)
      .select(schema.fieldNames.toIndexedSeq.map(col): _*)
    org.apache.spark.sql.graftbridge.PlanBridge.streamingFromBatch(batch)
  }

  override def stop(): Unit = ()
}

/** V1 micro-batch sink into a [[TxTable]]. Each batch re-tags the
  * incrementally-planned frame as a batch frame (the inverse bridge
  * call of the source side) and commits it through the transactional
  * write paths — `mergeDelta` (keyed CDC), `appendBatch` (plain), or
  * `overwrite` (Complete mode) — all carrying the batch id where
  * replay protection applies. */
class TxStreamSink(root: String, keyCols: Option[Seq[String]],
  statsCols: Seq[String], complete: Boolean,
  streamId: String = "default") extends Sink {

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    val batch =
      org.apache.spark.sql.graftbridge.PlanBridge.batchFromStreaming(data)
    if (complete) {
      // Complete mode re-emits the whole result: idempotent by value,
      // replays converge without a tag
      TxTable.overwrite(batch, root, statsCols)
    } else keyCols match {
      case Some(ks) =>
        // CDC shape: (keys..., op, values..., seq) — seq is the
        // within-batch resolution order (highest wins per key). Fail
        // the stream with the contract, not an opaque window error.
        require(batch.columns.contains("op") && batch.columns.contains("seq"),
          "graft-tx sink with keys expects CDC rows " +
            "(keys..., op, values..., seq); got " +
            batch.columns.mkString("(", ", ", ")"))
        TxTable.mergeDelta(batch.sparkSession, root, batch, ks,
          batchId = Some(batchId), streamId = streamId)
      case None =>
        TxTable.appendBatch(batch, root, batchId, statsCols,
          streamId = streamId)
    }
    ()
  }
}

object TxStreamSource {
  /** Change-feed schema (data columns..., op, commit_version), frozen
    * from the table's latest snapshot. Streaming requires a table with
    * at least one commit — there is no schema to tail before that. */
  private[sources] def feedSchema(spark: SparkSession,
    root: String): StructType = {
    val hi = TxTable.latestVersion(spark, root)
    require(hi >= 1, s"graft-tx streaming: table at $root has no " +
      "commits yet - create it (one append) before tailing its feed")
    TxTable.changes(spark, root, hi, hi).schema
  }

  /** Offsets round-trip through checkpoint JSON as SerializedOffset. */
  private[sources] def versionOf(o: Offset): Int = o match {
    case TxVersionOffset(v) => v
    case other => other.json().trim.stripPrefix("\"").stripSuffix("\"").toInt
  }
}
