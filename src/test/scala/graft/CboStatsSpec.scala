package graft

import org.apache.spark.sql.functions._
import graft.sources.TxTable

/** ANALYZE + V2 statistics: the commit log as the cost-based
  * optimizer's source of truth — NDV from the analyze header, rows /
  * bytes / min-max / null counts from the per-dir commit stats, all
  * surfaced through `SupportsReportStatistics` with zero data I/O. */
class CboStatsSpec extends SparkSpec {
  import spark.implicits._

  test("analyze records exact NDV; carried forward and clamped") {
    val root = tmpDir() + "/cbo-ndv"
    val df = Seq((1L, "a", 10), (2L, "b", 10), (3L, "a", 20),
      (4L, null.asInstanceOf[String], 20)).toDF("k", "s", "g")
    TxTable.append(df, root, statsCols = Seq("k", "g"))
    TxTable.analyze(spark, root, exact = true)
    val ndv = TxTable.columnNdv(spark, root)
    assert(ndv === Map("k" -> 4L, "s" -> 2L, "g" -> 2L),
      "exact distinct counts, nulls excluded like COUNT(DISTINCT)")
    // carried forward by a later commit untouched
    TxTable.append(Seq((5L, "c", 30)).toDF("k", "s", "g"), root,
      statsCols = Seq("k", "g"))
    assert(TxTable.columnNdv(spark, root) === ndv,
      "the ndv header must survive commits that don't re-analyze")
    // time travel: version 1 predates the analyze → no estimates
    assert(TxTable.columnNdv(spark, root, version = 1) === Map.empty)
    // clamp: shrink the table below the stale estimates — reported
    // NDV must never exceed the live row count
    TxTable.overwrite(Seq((9L, "z", 1)).toDF("k", "s", "g"), root,
      statsCols = Seq("k", "g"))
    val clamped = TxTable.columnNdv(spark, root)
    assert(clamped.values.forall(_ <= 1L),
      s"stale estimates must clamp to the 1-row table, got $clamped")
  }

  test("analyze survives a rename; dropped columns fall out") {
    val root = tmpDir() + "/cbo-ndv-colmap"
    TxTable.append(Seq((1L, 1.0, "x"), (2L, 2.0, "y"))
      .toDF("k", "v", "tag"), root, statsCols = Seq("k"))
    TxTable.analyze(spark, root, exact = true)
    TxTable.renameColumn(spark, root, "v", "amount")
    val ndv = TxTable.columnNdv(spark, root)
    assert(ndv.get("amount") === Some(2L),
      "ndv recorded under the physical name must follow the rename")
    assert(!ndv.contains("v"))
    TxTable.dropColumn(spark, root, "tag")
    assert(!TxTable.columnNdv(spark, root).contains("tag"),
      "a dropped column's estimate must not resurface under any name")
  }

  test("catalog table reports metadata statistics to the optimizer") {
    val root = tmpDir() + "/cbo-catalog"
    val df = (1L to 1000L).map(i => (i, i % 7, s"s$i"))
      .toDF("k", "grp", "s")
    TxTable.append(df, root, statsCols = Seq("k", "grp"))
    TxTable.analyze(spark, root, exact = true)
    spark.sql(
      s"CREATE TABLE cbo_stats_t USING `graft-tx` OPTIONS (path '$root')")
    graft.functions.GraftFunctions.register(spark)
    try {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      val plan = spark.table("cbo_stats_t")
        .queryExecution.optimizedPlan
      val stats = plan.stats
      assert(stats.rowCount === Some(BigInt(1000)),
        s"rowCount must come from the _rows commit stats, got $stats")
      val byName = stats.attributeStats.toSeq
        .map { case (a, cs) => a.name -> cs }.toMap
      val k = byName.getOrElse("k",
        fail(s"no column stats for k in $byName"))
      assert(k.distinctCount === Some(BigInt(1000)))
      assert(k.nullCount === Some(BigInt(0)))
      assert(k.min === Some(1L) && k.max === Some(1000L))
      val s = byName.getOrElse("s",
        fail(s"no column stats for s in $byName"))
      assert(s.distinctCount === Some(BigInt(1000)),
        "string columns carry NDV even without min/max dir stats")
    } finally {
      spark.conf.unset("spark.sql.cbo.enabled")
      spark.sql("DROP TABLE cbo_stats_t")
    }
  }

  test("catalog dimension table auto-broadcasts from metadata size") {
    // before the relay the catalog face reported defaultSizeInBytes
    // (8 EiB) — a tiny dimension table NEVER broadcast and every join
    // against it planned as a shuffle
    val dimRoot = tmpDir() + "/cbo-dim"
    TxTable.append((1L to 50L).map(i => (i, s"name$i")).toDF("id", "nm"),
      dimRoot)
    spark.sql(
      s"CREATE TABLE cbo_dim USING `graft-tx` OPTIONS (path '$dimRoot')")
    graft.functions.GraftFunctions.register(spark)
    try {
      val fact = (1L to 10000L).map(i => (i % 50 + 1, i)).toDF("id", "x")
      fact.createOrReplaceTempView("cbo_fact")
      val joined = spark.sql(
        "SELECT f.x, d.nm FROM cbo_fact f JOIN cbo_dim d ON f.id = d.id")
      // the INITIAL plan (pre-AQE, so the choice is driven by the
      // static metadata stats, not runtime sizes) must already pick
      // the broadcast join with the dimension as build side
      val exec = joined.queryExecution.executedPlan
      assert(exec.toString.contains("BroadcastHashJoin"),
        s"metadata sizeInBytes must drive auto-broadcast, plan:\n$exec")
      assert(joined.count() === 10000L)
    } finally spark.sql("DROP TABLE cbo_dim")
  }

  test("row-restricting options and pruned SPJ scans veto table stats") {
    val root = tmpDir() + "/cbo-veto"
    TxTable.append((1L to 100L).map(i => (i, i * 2)).toDF("k", "v"),
      root, statsCols = Seq("k", "v"))
    TxTable.analyze(spark, root, exact = true)
    spark.sql(s"CREATE TABLE cbo_veto_t USING `graft-tx` " +
      s"OPTIONS (path '$root', keyRange '1,10')")
    graft.functions.GraftFunctions.register(spark)
    try {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      val stats = spark.table("cbo_veto_t").queryExecution
        .optimizedPlan.stats
      assert(stats.rowCount.isEmpty,
        "whole-table rows must NOT be reported for a range-restricted " +
          s"relation, got $stats")
      assert(stats.attributeStats.isEmpty)
    } finally {
      spark.conf.unset("spark.sql.cbo.enabled")
      spark.sql("DROP TABLE cbo_veto_t")
    }
  }

  test("SPJ face surfaces rowCount through the optimized plan") {
    val root = tmpDir() + "/cbo-spjplan"
    val df = (1L to 64L).map(i => (i % 4, i)).toDF("b", "k")
    TxTable.appendPartitioned(df, root, "b", statsCols = Seq("k"))
    TxTable.analyze(spark, root, exact = true)
    try {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      val stats = spark.read.format("graft-tx")
        .option("partitionCol", "b").load(root)
        .queryExecution.optimizedPlan.stats
      assert(stats.rowCount === Some(BigInt(64)),
        s"the SPJ scan's estimateStatistics must reach plan.stats, got $stats")
      assert(stats.attributeStats.nonEmpty)
    } finally spark.conf.unset("spark.sql.cbo.enabled")
  }

  test("SPJ scan reports stats unpruned; describeStats is metadata-exact") {
    val root = tmpDir() + "/cbo-spj"
    val df = (1L to 64L).map(i => (i % 4, i)).toDF("b", "k")
    TxTable.appendPartitioned(df, root, "b", statsCols = Seq("k"))
    TxTable.analyze(spark, root, exact = true)
    val scan = new graft.sources.TxSpjScan(spark, root, -1, Seq("b"),
      df.schema)
    val st = scan.estimateStatistics()
    assert(st.numRows().getAsLong === 64L)
    assert(st.sizeInBytes().isPresent && st.sizeInBytes().getAsLong > 0)
    val cs = st.columnStats()
    assert(!cs.isEmpty, "partition + analyze columns must carry stats")
    val d = TxTable.describeStats(spark, root, Seq("b", "k"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(d("b") === ((4L, 0L, 0L, 3L)))
    assert(d("k") === ((64L, 0L, 1L, 64L)))
  }
}
