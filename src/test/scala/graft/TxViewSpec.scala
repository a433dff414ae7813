package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sources.{TxTable, TxView}

/** Incremental materialized aggregate views (TxView): delta
  * maintenance from the change feed must always converge to the full
  * recompute, exactly once, for keyed and append-only bases. */
class TxViewSpec extends SparkSpec {

  private def viewOf(root: String): Map[Long, (Long, Long)] =
    TxTable.read(spark, root).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  private def recompute(base: String): Map[Long, (Long, Long)] =
    TxTable.read(spark, base).groupBy("g")
      .agg(sum("v").as("s"), count(lit(1)).as("n")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("keyed base: per-commit refreshes converge to the recompute") {
    import spark.implicits._
    val base = tmpDir() + "/txview-base"
    val view = tmpDir() + "/txview-view"
    // g = k % 2; batch 1 inserts four keys
    TxTable.mergeDelta(spark, base, Seq(
      (1L, "I", 1L, 10L, 1L), (2L, "I", 0L, 20L, 2L),
      (3L, "I", 1L, 30L, 3L), (4L, "I", 0L, 40L, 4L))
      .toDF("k", "op", "g", "v", "seq"))
    TxView.refreshAggView(spark, base, view, "g", "v")
    assert(viewOf(view) === Map(1L -> (40L, 2L), 0L -> (60L, 2L)))
    // batch 2: update moves a value, delete shrinks a group
    TxTable.mergeDelta(spark, base, Seq(
      (1L, "U", 1L, 15L, 5L), (2L, "D", 0L, 0L, 6L))
      .toDF("k", "op", "g", "v", "seq"))
    TxView.refreshAggView(spark, base, view, "g", "v")
    assert(viewOf(view) === recompute(base))
    assert(viewOf(view) === Map(1L -> (45L, 2L), 0L -> (40L, 1L)))
  }

  test("a replayed refresh is a no-op; groups emptying disappear") {
    import spark.implicits._
    val base = tmpDir() + "/txview-replay-base"
    val view = tmpDir() + "/txview-replay-view"
    TxTable.mergeDelta(spark, base, Seq((1L, "I", 7L, 10L, 1L))
      .toDF("k", "op", "g", "v", "seq"))
    val v1 = TxView.refreshAggView(spark, base, view, "g", "v")
    // no new base commits: refresh must not write
    assert(TxView.refreshAggView(spark, base, view, "g", "v") === v1)
    assert(TxTable.latestVersion(spark, view) === v1)
    // deleting the only row of group 7 must remove the group row
    TxTable.mergeDelta(spark, base, Seq((1L, "D", 7L, 0L, 2L))
      .toDF("k", "op", "g", "v", "seq"))
    TxView.refreshAggView(spark, base, view, "g", "v")
    assert(viewOf(view) === Map.empty)
  }

  test("a multi-commit window folds in one refresh") {
    import spark.implicits._
    val base = tmpDir() + "/txview-multi-base"
    val view = tmpDir() + "/txview-multi-view"
    TxTable.mergeDelta(spark, base, Seq(
      (1L, "I", 0L, 10L, 1L), (2L, "I", 1L, 20L, 2L))
      .toDF("k", "op", "g", "v", "seq"))
    TxTable.mergeDelta(spark, base, Seq(
      (1L, "U", 0L, 11L, 3L), (3L, "I", 1L, 30L, 4L))
      .toDF("k", "op", "g", "v", "seq"))
    TxTable.mergeDelta(spark, base, Seq((2L, "D", 1L, 0L, 5L))
      .toDF("k", "op", "g", "v", "seq"))
    TxView.refreshAggView(spark, base, view, "g", "v")
    assert(viewOf(view) === recompute(base))
    assert(viewOf(view) === Map(0L -> (11L, 1L), 1L -> (30L, 1L)))
  }

  test("append-only base maintains without pre-image reads") {
    import spark.implicits._
    val base = tmpDir() + "/txview-app-base"
    val view = tmpDir() + "/txview-app-view"
    TxTable.append(Seq((0L, 10L), (1L, 20L)).toDF("g", "v"), base)
    TxView.refreshAggView(spark, base, view, "g", "v")
    TxTable.append(Seq((0L, 5L)).toDF("g", "v"), base)
    TxView.refreshAggView(spark, base, view, "g", "v")
    assert(viewOf(view) === Map(0L -> (15L, 2L), 1L -> (20L, 1L)))
    // the view table itself time-travels across refreshes
    assert(TxTable.read(spark, view, version = 1).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap ===
      Map(0L -> (10L, 1L), 1L -> (20L, 1L)))
  }

  test("row-level DML commits feed the change stream and the view") {
    import spark.implicits._
    val base = tmpDir() + "/txview-dml-base"
    val view = tmpDir() + "/txview-dml-view"
    TxTable.mergeDelta(spark, base, Seq(
      (1L, "I", 0L, 10L, 1L), (2L, "I", 0L, 20L, 2L), (3L, "I", 1L, 30L, 3L))
      .toDF("k", "op", "g", "v", "seq"))
    TxView.refreshAggView(spark, base, view, "g", "v")
    // CoW DML needs a delta-free snapshot first
    TxTable.compactSnapshot(spark, base)
    TxTable.deleteWhere(spark, base, "k = 2")
    // the feed now carries a D row for the deleted key
    val feed = TxTable.changes(spark, base,
      TxTable.latestVersion(spark, base) - 1).collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[String]("op"))).toSet
    assert(feed === Set((2L, "D")), s"got $feed")
    TxView.refreshAggView(spark, base, view, "g", "v")
    assert(viewOf(view) === Map(0L -> (10L, 1L), 1L -> (30L, 1L)))
    TxTable.updateWhere(spark, base, "k = 1", Map("v" -> "v + 5"))
    TxView.refreshAggView(spark, base, view, "g", "v")
    assert(viewOf(view) === recompute(base))
    assert(viewOf(view) === Map(0L -> (15L, 1L), 1L -> (30L, 1L)))
  }

  test("gate query converges to the oracle shape at sf0.001") {
    val got: DataFrame = TxView.aggViewGateQuery(spark, sfDir)
    val byView = got.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // recompute from the resolved base CDC stream directly
    import org.apache.spark.sql.expressions.Window
    val ch = Tables.orders(spark, sfDir).select(
      col("o_custkey").as("k"),
      expr("CASE WHEN o_orderkey % 10 = 0 THEN 'D' " +
        "WHEN o_orderkey % 3 = 0 THEN 'U' ELSE 'I' END").as("op"),
      (col("o_custkey") % 50).as("g"),
      expr("cast(round(o_totalprice * 100, 0) AS BIGINT)").as("v"),
      col("o_orderkey").as("seq"))
    val w = Window.partitionBy("k").orderBy(col("seq").desc)
    val expect = ch.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("op") =!= "D")
      .groupBy("g").agg(sum("v").as("s"), count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(byView === expect)
  }
}
