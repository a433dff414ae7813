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
  *  - `vacuum(table, retain_last)` → [[TxTable.vacuum]] — drop data
  *    outside the time-travel horizon.
  *
  * Each returns one row so `CALL` output is inspectable (the commit
  * version, or a done flag for vacuum). Reference analog: the
  * warehouse's operational jobs were driver-level tools
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
      case "vacuum" => Some(vacuum(rootOf))
      case "history" => Some(history(rootOf))
      case _ => None
    }
  }

  val names: Seq[String] =
    Seq("analyze", "compact_snapshot", "history", "optimize_compact",
      "vacuum")

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

  private def vacuum(rootOf: String => String): UnboundProcedure =
    proc("vacuum", Seq(
      in("table", StringType),
      in("retain_last", IntegerType, Some("1"))),
      StructType(Seq(StructField("done", BooleanType, nullable = false))),
      { input =>
        val root = rootOf(input.getUTF8String(0).toString)
        TxTable.vacuum(SparkSession.active, root,
          retainLast = input.getInt(1))
        Seq(true)
      })
}
