package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Expression, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Max, Min}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, ShortType}

/** Optimizer rule: answer aggregates over a graft-tx relation from
  * the snapshot's COMMIT STATS instead of scanning — `SELECT
  * count(*), min(k), max(k) FROM t` on a 100 TB table becomes a
  * commit-file read and a `LocalRelation`, and `GROUP BY part` over a
  * partition-clustered table becomes one local row per partition
  * (Delta and Iceberg answer exactly these shapes from file/manifest
  * stats; the reference has no analog — its only metadata is the
  * filename glob, src/mapred/org/apache/hadoop/mapred/
  * FileInputFormat.java:1).
  *
  * Fires ONLY when the answer is provably exact, bailing to the scan
  * otherwise (`TxTable.metadataAgg` / `metadataGroupedAgg` document
  * the conditions: delta-free snapshot, `_rows` everywhere, exact
  * integral stats for every referenced column; the grouped form also
  * needs single-valued dirs with zero `n,<col>` null counts — min/max
  * stats skip NULLs, so only the null-count stat proves a dir hides
  * no NULL-group rows). String min/max never rewrite: their stored
  * stats are truncation-widened bounds, sound for pruning but not
  * exact. Relations carrying row-restricting reader options
  * (keyRange/colRange/strRange) never rewrite either.
  *
  * On by default (`spark.graft.statsAgg=false` opts out) — unlike the
  * approx rewrites this one is semantics-preserving, so it is a pure
  * CBO win. Injected via `GraftExtensions.injectOptimizerRule` and
  * the `experimental.extraOptimizations` runtime hook.
  */
object TxStatsAggRewrite extends Rule[LogicalPlan] {

  val flagKey = "spark.graft.statsAgg"
  private def enabled: Boolean =
    SQLConf.get.getConfString(flagKey, "true").toBoolean

  /** Driver-side LocalRelation bound for the grouped rewrite
    * (`spark.graft.statsAgg.maxGroups` overrides; tested low). */
  private def maxLocalGroups: Int = SQLConf.get
    .getConfString("spark.graft.statsAgg.maxGroups", "100000").toInt

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan else rewrite(plan)

  def rewrite(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case agg: Aggregate if agg.resolved =>
      (relOf(agg.child) match {
        case Some(rel) => agg.groupingExpressions match {
          case Nil => scalarRewrite(agg, rel)
          // one OR MORE bare grouping columns, each integral (exact
          // `lo == hi` range stats) or string (`sx:` exact marker) —
          // the composite-partitioned `GROUP BY c1, c2` answers from
          // the same per-tuple clustering proof the SPJ face uses
          case gs if gs.nonEmpty && gs.forall {
            case a: AttributeReference => groupable(a.dataType)
            case _ => false
          } => groupedRewrite(agg,
            gs.map(_.asInstanceOf[AttributeReference]), rel)
          case _ => None
        }
        case None => None
      }).getOrElse(agg)
  }

  /** The table identity the commit stats answer for. */
  private case class RelInfo(spark: org.apache.spark.sql.SparkSession,
    root: String, version: Int)

  /** The graft-tx relation under the aggregate — allowing only
    * attribute-pruning Projects between them (a Filter or computed
    * projection means stats no longer describe the input). Matches
    * all three batch faces: the V1 path relation, catalog tables, and
    * the storage-partitioned face (the latter two pre-pushdown as
    * DataSourceV2Relation — extended operator-optimization rules run
    * before V2 scan pushdown). */
  private def relOf(p: LogicalPlan): Option[RelInfo] =
    p match {
      case l: LogicalRelation => l.relation match {
        case t: graft.sources.TxRelation if !t.rowRestricted =>
          Some(RelInfo(t.spark, t.root, t.metadataVersion))
        case _ => None
      }
      case d: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation =>
        d.table match {
          case t: graft.sources.TxMetaAggTable if !t.metaRowRestricted =>
            val s = org.apache.spark.sql.SparkSession.active
            Some(RelInfo(s, t.metaRoot, t.metaVersion(s)))
          case _ => None
        }
      case Project(ps, c) if ps.forall(_.isInstanceOf[AttributeReference]) =>
        relOf(c)
      case _ => None
    }

  private def integral(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | ShortType => true
    case _ => false
  }
  private def groupable(dt: DataType): Boolean =
    integral(dt) || dt == org.apache.spark.sql.types.StringType ||
      dt == org.apache.spark.sql.types.DateType
  private def typed(v: Long, dt: DataType): Any = dt match {
    case LongType => v
    case IntegerType => v.toInt
    case ShortType => v.toShort
    case _ => v
  }

  private sealed trait Shape
  private case object CountStar extends Shape
  private case class GroupKey(i: Int) extends Shape
  private case class CountOf(c: String) extends Shape
  private case class DistinctOf(c: String) extends Shape
  private case class MinOf(c: String, dt: DataType) extends Shape
  private case class MaxOf(c: String, dt: DataType) extends Shape

  private def aggShape(e: Expression): Option[Shape] = e match {
    case Alias(c, _) => aggShape(c)
    case AggregateExpression(Count(Seq(l: Literal)), _, false, None, _)
        if l.value != null => Some(CountStar)
    // count(c) = _rows - sum(n,<c>): the per-dir null-count stat is
    // already in the commit grammar, so a null-aware count is one
    // subtraction away from zero-I/O (exactness gated below on the
    // stat being present in every live dir)
    case AggregateExpression(Count(Seq(a: AttributeReference)), _, false,
        None, _) => Some(CountOf(a.name))
    // count(DISTINCT c) from the ANALYZE header — exactness gated
    // below on TxTable.exactNdv's freshness proof (exact-mode counts
    // AND the snapshot's entries identical to the analyzed ones)
    case AggregateExpression(Count(Seq(a: AttributeReference)), _, true,
        None, _) => Some(DistinctOf(a.name))
    case AggregateExpression(Min(a: AttributeReference), _, false, None, _)
        if integral(a.dataType) => Some(MinOf(a.name, a.dataType))
    case AggregateExpression(Max(a: AttributeReference), _, false, None, _)
        if integral(a.dataType) => Some(MaxOf(a.name, a.dataType))
    case _ => None
  }

  private def statCols(shapes: Seq[Shape]): Seq[String] =
    shapes.collect { case MinOf(c, _) => c case MaxOf(c, _) => c }.distinct
  private def countCols(shapes: Seq[Shape]): Seq[String] =
    shapes.collect { case CountOf(c) => c }.distinct
  private def distinctCols(shapes: Seq[Shape]): Seq[String] =
    shapes.collect { case DistinctOf(c) => c }.distinct

  private def scalarRewrite(agg: Aggregate,
    rel: RelInfo): Option[LogicalPlan] = {
    val shapes0 = agg.aggregateExpressions.map(aggShape)
    if (shapes0.isEmpty || shapes0.exists(_.isEmpty)) return None
    val shapes = shapes0.map(_.get)
    val cols = statCols(shapes)
    val ccols = countCols(shapes)
    val dcols = distinctCols(shapes)
    // COUNT(DISTINCT) answers come from the analyze header, and only
    // when provably exact AND fresh (entries unchanged since the
    // exact-mode analyze) — one unanswerable column bails to the scan
    val ndv =
      if (dcols.isEmpty) Map.empty[String, Long]
      else graft.sources.TxTable.exactNdv(rel.spark, rel.root, rel.version)
    if (!dcols.forall(ndv.contains)) return None
    graft.sources.TxTable
      .metadataAgg(rel.spark, rel.root, rel.version, cols, ccols)
      .filter { case (_, ranges, nulls) =>
        cols.forall(ranges.contains) && ccols.forall(nulls.contains) }
      .map { case (total, ranges, nulls) =>
        val row = InternalRow.fromSeq(shapes.map {
          case CountStar => total
          case CountOf(c) => total - nulls(c)
          case DistinctOf(c) => ndv(c)
          case MinOf(c, dt) => typed(ranges(c)._1, dt)
          case MaxOf(c, dt) => typed(ranges(c)._2, dt)
          case GroupKey(_) => null // unreachable: no grouping here
        })
        LocalRelation(agg.output, Seq(row))
      }
  }

  /** A metadata group-key value, typed for the LocalRelation row:
    * integral stats decode to the attribute's own width, `sx:` exact
    * strings to UTF8String. A type mismatch (schema drift between the
    * stat and the attribute) bails the rewrite, never miscasts. */
  private def keyVal(v: Any, dt: DataType): Option[Any] = (v, dt) match {
    case (l: Long, t) if integral(t) => Some(typed(l, t))
    // DateType stats hold days-since-epoch — its InternalRow encoding
    case (l: Long, org.apache.spark.sql.types.DateType) => Some(l.toInt)
    case (s: String, org.apache.spark.sql.types.StringType) =>
      Some(org.apache.spark.unsafe.types.UTF8String.fromString(s))
    case _ => None
  }

  private def groupedRewrite(agg: Aggregate, gs: Seq[AttributeReference],
    rel: RelInfo): Option[LogicalPlan] = {
    def shape(e: NamedExpression): Option[Shape] = e match {
      case a: AttributeReference if gs.exists(_.exprId == a.exprId) =>
        Some(GroupKey(gs.indexWhere(_.exprId == a.exprId)))
      case Alias(a: AttributeReference, _)
        if gs.exists(_.exprId == a.exprId) =>
        Some(GroupKey(gs.indexWhere(_.exprId == a.exprId)))
      case other => aggShape(other)
    }
    val shapes0 = agg.aggregateExpressions.map(shape)
    if (shapes0.isEmpty || shapes0.exists(_.isEmpty)) return None
    val shapes = shapes0.map(_.get)
    // the analyze header is table-level: no per-group NDV to serve
    if (shapes.exists(_.isInstanceOf[DistinctOf])) return None
    val cols = statCols(shapes)
    val ccols = countCols(shapes)
    graft.sources.TxTable
      .metadataGroupedAgg(rel.spark, rel.root, rel.version,
        gs.map(_.name), cols, ccols)
      // the rewrite materializes one LocalRelation row per group ON
      // THE DRIVER; group count is bounded by live-dir count (every
      // dir is single-valued — a firing precondition), but make that
      // bound EXPLICIT: past maxLocalGroups the scan is the right
      // plan anyway (a distributed aggregate over that many dirs
      // beats shipping a 100k+-row literal through every plan copy)
      .filter(_.size <= maxLocalGroups)
      .filter(_.forall { case (_, _, ranges, nulls) =>
        cols.forall(ranges.contains) && ccols.forall(nulls.contains) })
      // every group-key value must type-match its attribute — one
      // mismatch bails the whole rewrite to the scan
      .filter(_.forall { case (gvs, _, _, _) =>
        gvs.zip(gs).forall { case (v, g) => keyVal(v, g.dataType).isDefined }
      })
      .map { groups =>
        val rows = groups.map { case (gvs, cnt, ranges, nulls) =>
          InternalRow.fromSeq(shapes.map {
            case GroupKey(i) => keyVal(gvs(i), gs(i).dataType).get
            case CountStar => cnt
            case CountOf(c) => cnt - nulls(c)
            case MinOf(c, dt) => typed(ranges(c)._1, dt)
            case MaxOf(c, dt) => typed(ranges(c)._2, dt)
          })
        }
        LocalRelation(agg.output, rows)
      }
  }
}
