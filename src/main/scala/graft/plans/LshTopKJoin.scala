package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, AttributeSet, Expression, ExpressionInfo, Literal, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types._

/** Whole-operator extension (SURVEY.md §2.7): the LSH bucketed top-k
  * similarity join as a custom LogicalPlan + SparkStrategy + physical
  * operator — rung (c) of the extension ladder, for semantics the
  * declarative form can't fuse.
  *
  * The declarative `Similarity.annLsh` plans bucket-join → score →
  * window rank → filter: every candidate pair is materialized into the
  * window's sort+shuffle just to be discarded by `rk <= k`. This
  * operator fuses scoring and per-probe top-k selection INTO the join:
  * each co-partitioned bucket partition streams corpus rows into a
  * bucket-keyed map, then for each probe keeps a bounded k-heap —
  * per-pair memory never exceeds k rows per probe, and the
  * candidate-pair set never hits a shuffle. At 100 TB the win is the
  * eliminated exchange+sort of |candidates| rows (bucket-skew bounded:
  * a hot bucket costs O(|bucket| log k) heap work, not a sort).
  *
  * Scheduling contract, expressed through the physical-planning API:
  * `requiredChildDistribution = ClusteredDistribution(bucket)` on both
  * children — EnsureRequirements inserts (or reuses) the exchanges and
  * co-partitions the sides, exactly how ShuffledHashJoinExec declares
  * itself.
  *
  * Scoring is the exact integer-cosine contract of Similarity.scala
  * (identical IEEE op sequence), ranked by (cos desc, nbr_id) — so the
  * operator is oracle-checked by the SAME DuckDB SQL as the
  * declarative q_ann_lsh (`q_ann_lsh_native`).
  *
  * Child schema contract (validated at construction):
  *   probes: bucket string, probe_id bigint, q array<bigint>, n2 bigint
  *   corpus: bucket string, nbr_id  bigint, q array<bigint>, n2 bigint
  */
case class LshTopKJoinPlan(
    probes: LogicalPlan,
    corpus: LogicalPlan,
    k: Int,
    rkOut: AttributeReference,
    cosOut: AttributeReference)
  extends BinaryNode {

  override def left: LogicalPlan = probes
  override def right: LogicalPlan = corpus

  private def attr(side: LogicalPlan, name: String): Attribute =
    side.output.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(
        s"LshTopKJoin child is missing required column '$name' " +
          s"(has: ${side.output.map(_.name).mkString(", ")})"))

  override def output: Seq[Attribute] =
    Seq(attr(probes, "probe_id"), rkOut, attr(corpus, "nbr_id"), cosOut)

  // rk and cos are synthesized by the operator, not read from children
  override def producedAttributes: AttributeSet = AttributeSet(Seq(rkOut, cosOut))

  // the operator consumes bucket/q/n2 through its doExecute, invisibly
  // to Catalyst — claim every child column so ColumnPruning keeps them
  override def references: AttributeSet =
    AttributeSet(probes.output ++ corpus.output)

  override protected def withNewChildrenInternal(
    newLeft: LogicalPlan, newRight: LogicalPlan): LshTopKJoinPlan =
    copy(probes = newLeft, corpus = newRight)
}

/** Planner strategy: injected via GraftExtensions (or
  * `spark.experimental.extraStrategies`). */
object LshTopKJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case LshTopKJoinPlan(probes, corpus, k, rkOut, cosOut) =>
      LshTopKJoinExec(planLater(probes), planLater(corpus), k, rkOut, cosOut) :: Nil
    case _ => Nil
  }
}

case class LshTopKJoinExec(
    probes: SparkPlan,
    corpus: SparkPlan,
    k: Int,
    rkOut: AttributeReference,
    cosOut: AttributeReference)
  extends BinaryExecNode {

  override def left: SparkPlan = probes
  override def right: SparkPlan = corpus

  private def attr(side: SparkPlan, name: String): Attribute =
    side.output.find(_.name == name).get
  private def idx(side: SparkPlan, name: String): Int =
    side.output.indexWhere(_.name == name)

  override def output: Seq[Attribute] =
    Seq(attr(probes, "probe_id"), rkOut, attr(corpus, "nbr_id"), cosOut)

  override def producedAttributes: AttributeSet = AttributeSet(Seq(rkOut, cosOut))

  /** Both sides clustered on their bucket column → EnsureRequirements
    * co-partitions them (the ShuffledHashJoin contract). */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(attr(probes, "bucket"))) ::
      ClusteredDistribution(Seq(attr(corpus, "bucket"))) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val (pB, pId, pQ, pN2) = (idx(probes, "bucket"), idx(probes, "probe_id"),
      idx(probes, "q"), idx(probes, "n2"))
    val (cB, cId, cQ, cN2) = (idx(corpus, "bucket"), idx(corpus, "nbr_id"),
      idx(corpus, "q"), idx(corpus, "n2"))
    val kk = k
    probes.execute().zipPartitions(corpus.execute()) { (pIter, cIter) =>
      // bucket → corpus vectors of this partition (decoded to primitives)
      val byBucket = new mutable.HashMap[String, mutable.ArrayBuffer[(Long, Array[Long], Long)]]()
      cIter.foreach { row =>
        // SQL join semantics: null keys/payloads never match — skip them
        if (!row.isNullAt(cB) && !row.isNullAt(cId) && !row.isNullAt(cQ) && !row.isNullAt(cN2)) {
          val b = row.getUTF8String(cB).toString
          byBucket.getOrElseUpdate(b, new mutable.ArrayBuffer())
            .append((row.getLong(cId), row.getArray(cQ).toLongArray(), row.getLong(cN2)))
        }
      }
      val proj = UnsafeProjection.create(
        Array[DataType](LongType, IntegerType, LongType, DoubleType))
      val outRow = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(4)
      // Heap root = current WORST survivor: min cos, then max nbr_id.
      // Double.compare gives the same TOTAL order the window sort and
      // the oracle use (NaN greatest — a zero-norm vector's 0/0 cosine
      // ranks FIRST under cos DESC), where naive <,> comparisons would
      // instead strand NaN at the bottom of the heap.
      val worstFirst: Ordering[(Double, Long)] = (a, b) => {
        val c = java.lang.Double.compare(a._1, b._1)
        if (c != 0) -c else java.lang.Long.compare(a._2, b._2)
      }
      pIter.filter(row =>
        !row.isNullAt(pB) && !row.isNullAt(pId) && !row.isNullAt(pQ) && !row.isNullAt(pN2)
      ).flatMap { row =>
        val probeId = row.getLong(pId)
        val qa = row.getArray(pQ).toLongArray()
        val n2a = row.getLong(pN2)
        val cands = byBucket.getOrElse(row.getUTF8String(pB).toString, mutable.ArrayBuffer.empty)
        val heap = new mutable.PriorityQueue[(Double, Long)]()(worstFirst)
        cands.foreach { case (nbrId, qb, n2b) =>
          if (nbrId != probeId) {
            var dot = 0L
            var i = 0
            val n = math.min(qa.length, qb.length)
            while (i < n) { dot += qa(i) * qb(i); i += 1 }
            val cos = dot.toDouble / (math.sqrt(n2a.toDouble) * math.sqrt(n2b.toDouble))
            if (heap.size < kk) heap.enqueue((cos, nbrId))
            else {
              val (wc, wn) = heap.head
              val c = java.lang.Double.compare(cos, wc)
              if (c > 0 || (c == 0 && nbrId < wn)) {
                heap.dequeue(); heap.enqueue((cos, nbrId))
              }
            }
          }
        }
        val bestFirst: Seq[(Double, Long)] = heap.dequeueAll.reverse
        bestFirst.iterator.zipWithIndex.map { case ((cos, nbrId), r) =>
          outRow.update(0, probeId)
          outRow.update(1, r + 1)
          outRow.update(2, nbrId)
          outRow.update(3, cos)
          proj(outRow)
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
    newLeft: SparkPlan, newRight: SparkPlan): LshTopKJoinExec =
    copy(probes = newLeft, corpus = newRight)
}

object LshTopKJoin {

  /** Table-valued-function face of the operator — the PUBLIC route
    * from a custom LogicalPlan into a DataFrame: the analyzer's
    * `ResolveTableValuedFunctions` calls this builder while resolving
    * `SELECT * FROM graft_lsh_topk('<probes view>', '<corpus view>',
    * k)`, and the plan it returns (children resolved through the
    * session catalog) IS the query — no private[sql] constructor
    * anywhere. Registered by `GraftExtensions.injectTableFunction`
    * and, for extension-less sessions, at runtime through
    * `sessionState.tableFunctionRegistry` in `apply`. */
  val tvfBuilder: Seq[Expression] => LogicalPlan = { args =>
    def strArg(e: Expression, what: String): String = e match {
      case l: Literal if l.dataType == StringType && l.value != null =>
        l.value.toString
      case other => throw new IllegalArgumentException(
        s"graft_lsh_topk: $what must be a string literal view name, got $other")
    }
    def intArg(e: Expression): Int = e match {
      case l: Literal if l.dataType == IntegerType => l.value.asInstanceOf[Int]
      case other => throw new IllegalArgumentException(
        s"graft_lsh_topk: k must be an integer literal, got $other")
    }
    require(args.length == 3,
      "graft_lsh_topk(probes_view, corpus_view, k) takes 3 arguments")
    val spark = SparkSession.active
    LshTopKJoinPlan(
      spark.table(strArg(args(0), "probes_view")).queryExecution.analyzed,
      spark.table(strArg(args(1), "corpus_view")).queryExecution.analyzed,
      intArg(args(2)),
      AttributeReference("rk", IntegerType, nullable = false)(),
      AttributeReference("cos", DoubleType, nullable = false)())
  }

  val tvfInfo: ExpressionInfo = new ExpressionInfo(
    LshTopKJoin.getClass.getCanonicalName, "graft_lsh_topk")

  /** Build the operator over prepared probe/corpus frames (see schema
    * contract above) and return it as a DataFrame. Registers the
    * strategy and the TVF on the session's runtime hooks if absent,
    * then routes construction through the TVF SQL face — the analyzed
    * Dataset holds the resolved plan, so the scaffolding views are
    * dropped before returning. */
  def apply(probesDf: DataFrame, corpusDf: DataFrame, k: Int): DataFrame = {
    val spark = probesDf.sparkSession
    if (!spark.experimental.extraStrategies.contains(LshTopKJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ LshTopKJoinStrategy
    spark.sessionState.tableFunctionRegistry.createOrReplaceTempFunction(
      "graft_lsh_topk", tvfBuilder, "built-in")
    val id = java.util.UUID.randomUUID().toString.replace("-", "")
    val pv = s"graft_lsh_probes_$id"
    val cv = s"graft_lsh_corpus_$id"
    probesDf.createOrReplaceTempView(pv)
    corpusDf.createOrReplaceTempView(cv)
    try spark.sql(s"SELECT * FROM graft_lsh_topk('$pv', '$cv', $k)")
    finally {
      spark.catalog.dropTempView(pv)
      spark.catalog.dropTempView(cv)
      ()
    }
  }
}
