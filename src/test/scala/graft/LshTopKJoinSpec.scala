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

  test("zero-norm vectors (NaN cosine) rank exactly like the declarative window") {
    import spark.implicits._
    import graft.plans.LshTopKJoin
    // one bucket: a probe, a zero vector (cos = 0/0 = NaN) and two
    // normal neighbors — NaN must rank FIRST under cos DESC, as the
    // window sort and the DuckDB oracle both order it
    val probes = Seq(("b", 1L, Seq(1L, 0L), 1L)).toDF("bucket", "probe_id", "q", "n2")
    val corpus = Seq(
      ("b", 2L, Seq(0L, 0L), 0L), // zero norm → NaN cosine
      ("b", 3L, Seq(1L, 1L), 2L),
      ("b", 4L, Seq(-1L, 0L), 1L)).toDF("bucket", "nbr_id", "q", "n2")
    val native = LshTopKJoin(probes, corpus, 3).collect()
      .sortBy(_.getInt(1)).map(r => (r.getInt(1), r.getLong(2)))
    // Spark's sort total order puts NaN GREATEST, so under cos DESC the
    // NaN neighbor ranks first, then cos=1/sqrt(2) (doc 3), then
    // cos=-1 (doc 4). (The declarative lambda form can't be compared
    // directly here: ANSI mode raises DIVIDE_BY_ZERO on the 0-norm
    // division instead of producing NaN.)
    assert(native.toSeq === Seq((1, 2L), (2, 3L), (3, 4L)))
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
