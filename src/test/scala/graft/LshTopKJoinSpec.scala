package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

class LshTopKJoinSpec extends SparkSpec {

  test("custom operator == declarative annLsh exactly") {
    val native = Similarity.annLshNative(spark, sfDir)
    val declarative = Similarity.annLsh(spark, sfDir)
    assert(native.count() === declarative.count())
    assert(native.join(declarative, Seq("probe_id", "rk", "nbr_id", "cos")).count() ===
      declarative.count())
  }

  test("plans through LshTopKJoinExec with co-partitioned children and no window sort") {
    val plan = Similarity.annLshNative(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("LshTopKJoin"), plan)
    // the fused operator needs no Window and no per-candidate Sort
    assert(!plan.contains("Window"), plan)
    // EnsureRequirements must have clustered both children on bucket
    assert(plan.contains("hashpartitioning(bucket"), plan)
  }

  test("per-probe results are complete and ranked densely from 1") {
    val rows = Similarity.annLshNative(spark, sfDir, k = 4).collect()
    val byProbe = rows.groupBy(_.getLong(0))
    byProbe.foreach { case (_, rs) =>
      val rks = rs.map(_.getInt(1)).sorted
      assert(rks.toSeq === (1 to rks.length))
      val coss = rs.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(coss.toSeq === coss.sortBy(-_).toSeq) // descending by rank
    }
  }
}
