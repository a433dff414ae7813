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
    // a later data commit: the sketched columns (k, g) TRACK the
    // append through the merged per-dir HLL registers; the
    // non-sketched column (s) falls back to the carried header
    TxTable.append(Seq((5L, "c", 30)).toDF("k", "s", "g"), root,
      statsCols = Seq("k", "g"))
    assert(TxTable.columnNdv(spark, root) ===
      Map("k" -> 5L, "s" -> 2L, "g" -> 3L),
      "sketched columns stay fresh; header fills the rest")
    // time travel: version 1 predates the analyze — its statsCols
    // still serve NDV from their own per-dir sketches (recorded at
    // write time), the un-sketched column serves nothing
    assert(TxTable.columnNdv(spark, root, version = 1) ===
      Map("k" -> 4L, "g" -> 2L))
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

  test("NDV stays fresh across appends via merged per-dir HLL sketches") {
    val root = tmpDir() + "/cbo-hll"
    TxTable.append((1L to 1000L).map(i => (i, s"s${i % 40}"))
      .toDF("k", "s"), root, statsCols = Seq("k", "s"))
    TxTable.analyze(spark, root, exact = true)
    assert(TxTable.columnNdv(spark, root)("k") === 1000L)
    // the append DOUBLES the key space: the stale header alone would
    // report 1000 (clamped), the merged registers must track ~2000
    TxTable.append((1001L to 2000L).map(i => (i, s"s${i % 40}"))
      .toDF("k", "s"), root, statsCols = Seq("k", "s"))
    val ndv = TxTable.columnNdv(spark, root)
    assert(ndv("k") > 1800L && ndv("k") < 2200L,
      s"merged HLL must track the live key space, got ${ndv("k")}")
    assert(ndv("s") > 35L && ndv("s") < 45L, s"got ${ndv("s")}")
    // the EXACT service correctly voids on the data commit
    assert(TxTable.exactNdv(spark, root) === Map.empty)
    // a never-analyzed table serves NDV from the sketches alone
    val root2 = tmpDir() + "/cbo-hll2"
    TxTable.append((1L to 500L).map(i => (i, i % 7)).toDF("k", "g"),
      root2, statsCols = Seq("k", "g"))
    val pure = TxTable.columnNdv(spark, root2)
    assert(pure.get("g") === Some(7L), s"got $pure")
    assert(pure("k") > 450L && pure("k") < 550L, s"got $pure")
    // one blob-less dir (hand-stripped analog of a pre-HLL commit or
    // zero-job staged promote) voids the merged path for that column —
    // never an under-count; the stale header (clamped) still serves
    TxTable.analyze(spark, root2, exact = true)
    TxTable.append((501L to 600L).map(i => (i, i % 7)).toDF("k", "g"),
      root2) // no statsCols → no sketches on this dir
    val mixed = TxTable.columnNdv(spark, root2)
    assert(mixed("k") === 500L,
      s"stale header clamped, not a partial-merge under-count: $mixed")
  }

  test("3-table catalog join reorders by metadata row counts") {
    // big ⋈ big2 ⋈ small, WRITTEN with the two big tables first: with
    // the relayed stats (rows + join-key NDV), CostBasedJoinReorder
    // must re-run late and join big ⋈ small FIRST (10-row
    // intermediate) instead of big ⋈ big2 (20k rows). Before this
    // round the late relay fed broadcast selection only — the reorder
    // batch had already run blind and kept the written order.
    val rootB = tmpDir() + "/cbo-jr-big"
    val rootB2 = tmpDir() + "/cbo-jr-big2"
    val rootS = tmpDir() + "/cbo-jr-small"
    TxTable.append((1L to 20000L).map(i => (i, i % 97)).toDF("k", "x1"),
      rootB, statsCols = Seq("k"))
    TxTable.append((1L to 20000L).map(i => (i, i % 89)).toDF("k2", "x2"),
      rootB2, statsCols = Seq("k2"))
    TxTable.append((1L to 10L).map(i => (i, s"n$i")).toDF("k3", "nm"),
      rootS)
    Seq(rootB, rootB2, rootS).foreach(r =>
      TxTable.analyze(spark, r, exact = true))
    spark.sql(s"CREATE TABLE jr_big USING `graft-tx` OPTIONS (path '$rootB')")
    spark.sql(
      s"CREATE TABLE jr_big2 USING `graft-tx` OPTIONS (path '$rootB2')")
    spark.sql(
      s"CREATE TABLE jr_small USING `graft-tx` OPTIONS (path '$rootS')")
    graft.functions.GraftFunctions.register(spark)
    try {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
      val q = spark.sql(
        """SELECT b.k, b2.x2, s.nm
          |FROM jr_big b JOIN jr_big2 b2 ON b.k = b2.k2
          |JOIN jr_small s ON b.k = s.k3""".stripMargin)
      // the INNERMOST join of the optimized plan must involve the
      // small table's key — proof the DP enumeration saw the counts
      val joins = q.queryExecution.optimizedPlan.collect {
        case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
      }
      assert(joins.size === 2, q.queryExecution.optimizedPlan.toString)
      val innermost = joins.find(j =>
        !j.children.exists(_.exists(
          _.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Join])))
        .getOrElse(fail("no innermost join"))
      val innerRefs = innermost.condition.toSeq
        .flatMap(_.references.map(_.name)).toSet
      assert(innerRefs.contains("k3"),
        s"expected big ⋈ small first, innermost joins $innerRefs:\n" +
          q.queryExecution.optimizedPlan.toString)
      // and the answer is unchanged
      assert(q.count() === 10L)
    } finally {
      spark.conf.unset("spark.sql.cbo.enabled")
      spark.conf.unset("spark.sql.cbo.joinReorder.enabled")
      Seq("jr_big", "jr_big2", "jr_small")
        .foreach(t => spark.sql(s"DROP TABLE $t"))
    }
  }
}
