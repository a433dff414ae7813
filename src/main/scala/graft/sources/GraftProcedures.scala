package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SQL maintenance commands for `graft-tx` tables through Spark 4's
  * PROCEDURE catalog — `CALL spark_catalog.system.<proc>(...)`, the
  * Iceberg-style surface — so a SQL-only user can run the operational
  * jobs (statistics, compaction, retention) that until now required
  * the Scala API. Runtime-available on ANY session: GraftCatalog (a
  * conf the runtime `GraftFunctions.register` installs) implements
  * `ProcedureCatalog`, no session-build-time extension needed.
  *
  *  - `analyze(table, columns, exact, histograms)` → [[TxTable.analyze]]
  *    — feeds the CBO relay/join-reorder path (NDV + null counts,
  *    optional equi-height histograms);
  *  - `compact_snapshot(table)` → [[TxTable.compactSnapshot]] — fold
  *    MoR deltas into one base;
  *  - `optimize_compact(table, target_mb)` → [[TxTable.optimizeCompact]]
  *    — bin-pack small dirs;
  *  - `optimize_zorder(table, columns, n_dirs, incremental)` →
  *    [[TxTable.optimizeZOrderN]] / the incremental tail-only form;
  *  - `vacuum(table, retain_last, dry_run)` → [[TxTable.vacuum]] —
  *    drop data outside the time-travel horizon (dry_run lists
  *    without deleting);
  *  - `restore(table, version)` → [[TxTable.restore]] — the
  *    operational undo;
  *  - `clone(table, target_path, version, target_table)` →
  *    [[TxTable.cloneAt]] — zero-copy branch, optionally
  *    SQL-registered;
  *  - `history(table)` / `detail(table)` / `partitions(table)` —
  *    metadata-only introspection (DESCRIBE HISTORY / DESCRIBE
  *    DETAIL / SHOW PARTITIONS analogs).
  *
  * Each returns one row (or one row per commit/partition) so `CALL`
  * output is inspectable. Reference analog: the warehouse's
  * operational jobs were driver-level tools
  * (src/tools/org/apache/hadoop/tools:1); here they are one SQL
  * statement against the catalog. */
private[sources] object GraftProcedures {

  /** The procedures namespace, Iceberg-style. */
  val Namespace: Array[String] = Array("system")

  def load(ident: Identifier,
    rootOf: String => String): Option[UnboundProcedure] = {
    if (!ident.namespace().sameElements(Namespace)) return None
    ident.name().toLowerCase(java.util.Locale.ROOT) match {
      case "analyze" => Some(analyze(rootOf))
      case "compact_snapshot" => Some(compactSnapshot(rootOf))
      case "optimize_compact" => Some(optimizeCompact(rootOf))
      case "optimize_zorder" => Some(optimizeZorder(rootOf))
      case "vacuum" => Some(vacuum(rootOf))
      case "history" => Some(history(rootOf))
      case "restore" => Some(restore(rootOf))
      case "clone" => Some(cloneProc(rootOf))
      case "partitions" => Some(partitions(rootOf))
      case "detail" => Some(detail(rootOf))
      case "tag" => Some(tagProc(rootOf))
      case "drop_tag" => Some(dropTag(rootOf))
      case "tags" => Some(tagsProc(rootOf))
      case _ => None
    }
  }

  val names: Seq[String] =
    Seq("analyze", "clone", "compact_snapshot", "detail", "drop_tag",
      "history", "optimize_compact", "optimize_zorder", "partitions",
      "restore", "tag", "tags", "vacuum")

  private def in(name: String, dt: DataType,
    default: Option[String] = None): ProcedureParameter = {
    val b = ProcedureParameter.in(name, dt)
    default.foreach(b.defaultValue)
    b.build()
  }

  private val versionOut = StructType(Seq(
    StructField("version", IntegerType, nullable = false)))

  private def oneRowScan(schema: StructType, vals: Any*): Scan =
    new LocalScan {
      override def rows(): Array[InternalRow] =
        Array(InternalRow.fromSeq(vals))
      override def readSchema(): StructType = schema
    }

  private def proc(procName: String, params: Seq[ProcedureParameter],
    out: StructType, body: InternalRow => Seq[Any]): UnboundProcedure =
    new UnboundProcedure {
      override def name(): String = procName
      override def description(): String = s"graft-tx $procName"
      override def bind(inputType: StructType): BoundProcedure =
        new BoundProcedure {
          override def name(): String = procName
          override def description(): String = s"graft-tx $procName"
          override def parameters(): Array[ProcedureParameter] =
            params.toArray
          override def isDeterministic: Boolean = false
          override def call(input: InternalRow)
            : java.util.Iterator[Scan] =
            java.util.Collections.singletonList(
              oneRowScan(out, body(input): _*)).iterator()
        }
    }

  private def analyze(rootOf: String => String): UnboundProcedure =
    proc("analyze", Seq(
      in("table", StringType),
      in("columns", StringType, Some("''")),
      in("exact", BooleanType, Some("false")),
      in("histograms", BooleanType, Some("false"))),
      versionOut,
      { input =>
        val root = rootOf(input.getUTF8String(0).toString)
        val cols = input.getUTF8String(1).toString
          .split(",").map(_.trim).filter(_.nonEmpty).toSeq
        val v = TxTable.analyze(SparkSession.active, root, cols,
          exact = input.getBoolean(2),
          histograms = input.getBoolean(3))
        Seq(v)
      })

  private def compactSnapshot(rootOf: String => String): UnboundProcedure =
    proc("compact_snapshot", Seq(in("table", StringType)), versionOut,
      { input =>
        val root = rootOf(input.getUTF8String(0).toString)
        Seq(TxTable.compactSnapshot(SparkSession.active, root))
      })

  private def optimizeCompact(rootOf: String => String): UnboundProcedure =
    proc("optimize_compact", Seq(
      in("table", StringType),
      in("target_mb", IntegerType, Some("128"))),
      versionOut,
      { input =>
        val root = rootOf(input.getUTF8String(0).toString)
        Seq(TxTable.optimizeCompact(SparkSession.active, root,
          targetBytes = input.getInt(1).toLong * 1024 * 1024))
      })

  /** DESCRIBE HISTORY from SQL: one row per retained commit (version,
    * op, entry/delta counts, keys, stats columns, batch tags, visible
    * columns) — [[TxTable.describeHistory]], metadata-scale. */
  private def history(rootOf: String => String): UnboundProcedure =
    new UnboundProcedure {
      override def name(): String = "history"
      override def description(): String = "graft-tx history"
      override def bind(inputType: StructType): BoundProcedure =
        new BoundProcedure {
          override def name(): String = "history"
          override def description(): String = "graft-tx history"
          override def parameters(): Array[ProcedureParameter] =
            Array(in("table", StringType))
          override def isDeterministic: Boolean = false
          override def call(input: InternalRow)
            : java.util.Iterator[Scan] = {
            val root = rootOf(input.getUTF8String(0).toString)
            val df = TxTable.describeHistory(SparkSession.active, root)
            val schema = df.schema
            val collected = df.queryExecution.executedPlan.executeCollect()
            java.util.Collections.singletonList(new LocalScan {
              override def rows(): Array[InternalRow] =
                collected.map(_.copy(): InternalRow)
              override def readSchema(): StructType = schema
            }: Scan).iterator()
          }
        }
    }

  /** The operational UNDO: `CALL system.restore('t', 3)` commits
    * version 3's exact entry list as the new latest snapshot —
    * [[TxTable.restore]], one metadata commit, the mistake stays in
    * history for audit. Until now a SQL-only operator could SEE the
    * pre-mistake state (FOR VERSION AS OF) but never make it the
    * table's forward state. */
  /** `CALL system.restore('t', 3)` or — the named-ref form —
    * `CALL system.restore('t', -1, 'pre_deploy')`: the tag a release
    * pinned is exactly what an operator wants to roll back TO. */
  private def restore(rootOf: String => String): UnboundProcedure =
    proc("restore", Seq(
      in("table", StringType),
      in("version", IntegerType, Some("-1")),
      in("ref", StringType, Some("''"))),
      versionOut,
      { input =>
        val root = rootOf(input.getUTF8String(0).toString)
        val spark = SparkSession.active
        val ref = input.getUTF8String(2).toString
        val v =
          if (ref.nonEmpty) TxTable.resolveRef(spark, root, ref)
          else input.getInt(1)
        require(v >= 1,
          "graft-tx restore: pass a version >= 1 or a non-empty ref")
        Seq(TxTable.restore(spark, root, v))
      })

  /** Zero-copy branch: `CALL system.clone('src_t', '/path/to/dst')`
    * (optionally pinned to a source version, optionally registering
    * the clone as a catalog table) — [[TxTable.cloneAt]]: ONE commit
    * referencing the source's immutable dirs, metadata cost whatever
    * the table size; the clone then evolves independently (the
    * dev/test-branch workflow). `target_table` non-empty additionally
    * runs `CREATE TABLE <target_table> USING graft-tx` over the
    * target path so the branch is SQL-addressable immediately. */
  private def cloneProc(rootOf: String => String): UnboundProcedure =
    proc("clone", Seq(
      in("table", StringType),
      in("target_path", StringType),
      in("version", IntegerType, Some("-1")),
      in("target_table", StringType, Some("''"))),
      versionOut,
      { input =>
        val spark = SparkSession.active
        val srcRoot = rootOf(input.getUTF8String(0).toString)
        val dst = input.getUTF8String(1).toString
        val v = TxTable.cloneAt(spark, srcRoot, dst,
          version = input.getInt(2))
        val tbl = input.getUTF8String(3).toString.trim
        if (tbl.nonEmpty)
          spark.sql(s"CREATE TABLE $tbl USING `graft-tx` " +
            s"OPTIONS (path '$dst')")
        Seq(v)
      })

  /** `CALL system.optimize_zorder('t', 'c1,c2', n_dirs)` — the SQL
    * face of [[TxTable.optimizeZOrderN]] (multi-dim clustered rewrite;
    * every listed dimension gets dir stats so range pruning bites on
    * any of them); `incremental => true` routes to
    * [[TxTable.optimizeZOrderIncremental]], which re-clusters only the
    * unclustered tail — the steady-state maintenance form. */
  private def optimizeZorder(rootOf: String => String): UnboundProcedure =
    proc("optimize_zorder", Seq(
      in("table", StringType),
      in("columns", StringType),
      in("n_dirs", IntegerType, Some("8")),
      in("incremental", BooleanType, Some("false"))),
      versionOut,
      { input =>
        val root = rootOf(input.getUTF8String(0).toString)
        val cols = input.getUTF8String(1).toString
          .split(",").map(_.trim).filter(_.nonEmpty).toSeq
        require(cols.nonEmpty,
          "optimize_zorder needs at least one column")
        val n = input.getInt(2)
        val v =
          if (input.getBoolean(3))
            TxTable.optimizeZOrderIncremental(SparkSession.active, root,
              cols, n)
          else TxTable.optimizeZOrderN(SparkSession.active, root, cols, n)
        Seq(v)
      })

  /** SHOW PARTITIONS from SQL: `CALL system.partitions('t')` — one
    * row per partition tuple (hive-rendered `c1=v1/c2=v2`) with dir /
    * row / byte tallies, [[TxTable.showPartitions]]: derived from
    * commit stats alone, ZERO data I/O at any table size — how a SQL
    * operator learns which `PARTITION (day=...)` to overwrite. */
  /** Named snapshot refs: `CALL system.tag('t', 'audit_2026q3')` pins
    * the current (or an explicit) version under an immutable name —
    * readable as `SELECT ... FROM t VERSION AS OF 'audit_2026q3'` and
    * protected from vacuum until `CALL system.drop_tag`. `CALL
    * system.tags('t')` lists (name, version). [[TxTable.tag]]. */
  private def tagProc(rootOf: String => String): UnboundProcedure =
    proc("tag", Seq(
      in("table", StringType),
      in("name", StringType),
      in("version", IntegerType, Some("-1"))),
      versionOut,
      { input =>
        val root = rootOf(input.getUTF8String(0).toString)
        Seq(TxTable.tag(SparkSession.active, root,
          input.getUTF8String(1).toString, input.getInt(2)))
      })

  private def dropTag(rootOf: String => String): UnboundProcedure =
    proc("drop_tag", Seq(
      in("table", StringType),
      in("name", StringType)),
      StructType(Seq(StructField("dropped", BooleanType, nullable = false))),
      { input =>
        val root = rootOf(input.getUTF8String(0).toString)
        TxTable.deleteTag(SparkSession.active, root,
          input.getUTF8String(1).toString)
        Seq(true)
      })

  private def tagsProc(rootOf: String => String): UnboundProcedure =
    new UnboundProcedure {
      override def name(): String = "tags"
      override def description(): String = "graft-tx tags"
      override def bind(inputType: StructType): BoundProcedure =
        new BoundProcedure {
          override def name(): String = "tags"
          override def description(): String = "graft-tx tags"
          override def parameters(): Array[ProcedureParameter] =
            Array(in("table", StringType))
          override def isDeterministic: Boolean = false
          override def call(input: InternalRow)
            : java.util.Iterator[Scan] = {
            val root = rootOf(input.getUTF8String(0).toString)
            val schema = StructType(Seq(
              StructField("name", StringType, nullable = false),
              StructField("version", IntegerType, nullable = false)))
            val tagRows = TxTable.tags(SparkSession.active, root)
              .map { case (n, v) =>
                InternalRow(UTF8String.fromString(n), v): InternalRow }
              .toArray
            java.util.Collections.singletonList(new LocalScan {
              override def rows(): Array[InternalRow] = tagRows
              override def readSchema(): StructType = schema
            }: Scan).iterator()
          }
        }
    }

  private def partitions(rootOf: String => String): UnboundProcedure =
    new UnboundProcedure {
      override def name(): String = "partitions"
      override def description(): String = "graft-tx partitions"
      override def bind(inputType: StructType): BoundProcedure =
        new BoundProcedure {
          override def name(): String = "partitions"
          override def description(): String = "graft-tx partitions"
          override def parameters(): Array[ProcedureParameter] =
            Array(in("table", StringType))
          override def isDeterministic: Boolean = false
          override def call(input: InternalRow)
            : java.util.Iterator[Scan] = {
            val root = rootOf(input.getUTF8String(0).toString)
            val df = TxTable.showPartitions(SparkSession.active, root)
            val schema = df.schema
            val collected = df.queryExecution.executedPlan.executeCollect()
            java.util.Collections.singletonList(new LocalScan {
              override def rows(): Array[InternalRow] =
                collected.map(_.copy(): InternalRow)
              override def readSchema(): StructType = schema
            }: Scan).iterator()
          }
        }
    }

  /** `vacuum(t, retain_last, dry_run)` — dry_run=true lists-without-
    * deleting: `done=false` and `reclaimable` = how many data dirs /
    * commits / manifests sit outside the horizon, the "what am I
    * about to burn?" check before production retention. A real run
    * reports the same count it reclaimed. */
  private def vacuum(rootOf: String => String): UnboundProcedure =
    proc("vacuum", Seq(
      in("table", StringType),
      in("retain_last", IntegerType, Some("1")),
      in("dry_run", BooleanType, Some("false"))),
      StructType(Seq(
        StructField("done", BooleanType, nullable = false),
        StructField("reclaimable", IntegerType, nullable = false))),
      { input =>
        val root = rootOf(input.getUTF8String(0).toString)
        val retain = input.getInt(1)
        val dead = TxTable.vacuumDryRun(SparkSession.active, root, retain)
        val dry = input.getBoolean(2)
        if (!dry) TxTable.vacuum(SparkSession.active, root, retain)
        Seq(!dry, dead.size)
      })

  /** DESCRIBE DETAIL from SQL: one metadata-only summary row —
    * [[TxTable.describeDetail]]. */
  private def detail(rootOf: String => String): UnboundProcedure =
    new UnboundProcedure {
      override def name(): String = "detail"
      override def description(): String = "graft-tx detail"
      override def bind(inputType: StructType): BoundProcedure =
        new BoundProcedure {
          override def name(): String = "detail"
          override def description(): String = "graft-tx detail"
          override def parameters(): Array[ProcedureParameter] =
            Array(in("table", StringType))
          override def isDeterministic: Boolean = false
          override def call(input: InternalRow)
            : java.util.Iterator[Scan] = {
            val root = rootOf(input.getUTF8String(0).toString)
            val df = TxTable.describeDetail(SparkSession.active, root)
            val schema = df.schema
            val collected = df.queryExecution.executedPlan.executeCollect()
            java.util.Collections.singletonList(new LocalScan {
              override def rows(): Array[InternalRow] =
                collected.map(_.copy(): InternalRow)
              override def readSchema(): StructType = schema
            }: Scan).iterator()
          }
        }
    }
}
