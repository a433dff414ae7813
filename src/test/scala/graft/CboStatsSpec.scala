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

  test("equi-height histograms price skewed filters for the CBO") {
    // 20k rows: 99% pile at x = 1000, a 1% tail spread over [0, 200).
    // A uniform-range heuristic prices `x < 500` at ~50% (10k rows);
    // the histogram knows only the tail qualifies (~200 rows).
    val mk = (suffix: String) => {
      val root = tmpDir() + s"/cbo-hist-$suffix"
      val df = (1L to 20000L).map(i =>
        (i, if (i % 100 == 0) (i / 100) % 200 else 1000L)).toDF("k", "x")
      TxTable.append(df, root, statsCols = Seq("k", "x"))
      root
    }
    val rootH = mk("on")
    val rootN = mk("off")
    TxTable.analyze(spark, rootH, exact = true, histograms = true)
    TxTable.analyze(spark, rootN, exact = true)
    // the hist: header parses back, fresh, with plausible shape
    val h = TxTable.columnHistograms(spark, rootH)
    assert(h.contains("x") && h.contains("k"), h.keySet.toString)
    val (height, hbins) = h("x")
    assert(hbins.size === 64 && height === 20000.0 / 64)
    assert(hbins.last._2 === 1000.0, hbins.last.toString)
    spark.sql(s"CREATE TABLE jh_on USING `graft-tx` OPTIONS (path '$rootH')")
    spark.sql(s"CREATE TABLE jh_off USING `graft-tx` OPTIONS (path '$rootN')")
    graft.functions.GraftFunctions.register(spark)
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      def estRows(table: String): BigInt = {
        val q = spark.sql(s"SELECT * FROM $table WHERE x < 500")
        q.queryExecution.optimizedPlan.stats.rowCount
          .getOrElse(fail(s"no rowCount for $table:\n" +
            q.queryExecution.optimizedPlan.toString))
      }
      val withHist = estRows("jh_on")
      val withoutHist = estRows("jh_off")
      info(s"withHist=$withHist withoutHist=$withoutHist")
      assert(withoutHist > BigInt(5000),
        s"uniform heuristic should misprice the skew high, got $withoutHist")
      assert(withHist < BigInt(2000),
        s"histogram must price the selective filter low, got $withHist " +
          s"(vs $withoutHist without)")
      // an append voids freshness: stale distributions never serve
      TxTable.append(Seq((20001L, 0L)).toDF("k", "x"), rootH)
      assert(TxTable.columnHistograms(spark, rootH).isEmpty,
        "histograms must go unservable once the entry multiset changes")
    } finally {
      spark.conf.unset("spark.sql.cbo.enabled")
      Seq("jh_on", "jh_off").foreach(t => spark.sql(s"DROP TABLE $t"))
    }
  }

  test("histogram-priced filter flips the join order") {
    // chain A(filtered) ⋈ B ⋈ C on DISTINCT key pairs (a.k = b.k2,
    // b.bb = c.k3 — no transitive A–C edge). True |A'| ≈ 200:
    //   with histogram:  |A'⋈B| ≈ 30   < |B⋈C| ≈ 300  → join A' first
    //   uniform range:   |A'⋈B| ≈ 1500 > |B⋈C| ≈ 300  → join C first
    val mkA = (suffix: String) => {
      val root = tmpDir() + s"/cbo-flip-$suffix"
      val df = (1L to 20000L).map(i =>
        (i, if (i % 100 == 0) (i / 100) % 200 else 1000L)).toDF("k", "x")
      TxTable.append(df, root, statsCols = Seq("k", "x"))
      root
    }
    val rootH = mkA("on")
    val rootN = mkA("off")
    TxTable.analyze(spark, rootH, exact = true, histograms = true)
    TxTable.analyze(spark, rootN, exact = true)
    val rootB = tmpDir() + "/cbo-flip-b"
    val rootC = tmpDir() + "/cbo-flip-c"
    TxTable.append((1L to 3000L).map(i => (i, i % 100)).toDF("k2", "bb"),
      rootB, statsCols = Seq("k2", "bb"))
    TxTable.append((1L to 10L).map(i => (i, s"c$i")).toDF("k3", "nm"),
      rootC, statsCols = Seq("k3"))
    Seq(rootB, rootC).foreach(r => TxTable.analyze(spark, r, exact = true))
    spark.sql(s"CREATE TABLE jf_on USING `graft-tx` OPTIONS (path '$rootH')")
    spark.sql(s"CREATE TABLE jf_off USING `graft-tx` OPTIONS (path '$rootN')")
    spark.sql(s"CREATE TABLE jf_b USING `graft-tx` OPTIONS (path '$rootB')")
    spark.sql(s"CREATE TABLE jf_c USING `graft-tx` OPTIONS (path '$rootC')")
    graft.functions.GraftFunctions.register(spark)
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    try {
      def innermostRefs(bigTable: String): Set[String] = {
        val q = spark.sql(
          s"""SELECT count(*) FROM $bigTable a
             |JOIN jf_b b ON a.k = b.k2
             |JOIN jf_c c ON b.bb = c.k3
             |WHERE a.x < 500""".stripMargin)
        val joins = q.queryExecution.optimizedPlan.collect {
          case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
        }
        val inner = joins.filter(j => !j.children.exists(_.exists(
          _.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Join])))
        inner.flatMap(_.condition.toSeq
          .flatMap(_.references.map(_.name))).toSet
      }
      assert(innermostRefs("jf_on").contains("k2"),
        s"histogram plan must join the filtered big table first, " +
          s"innermost refs ${innermostRefs("jf_on")}")
      assert(innermostRefs("jf_off").contains("k3"),
        s"uniform plan should join B ⋈ C first, " +
          s"innermost refs ${innermostRefs("jf_off")}")
    } finally {
      spark.conf.unset("spark.sql.cbo.enabled")
      spark.conf.unset("spark.sql.cbo.joinReorder.enabled")
      Seq("jf_on", "jf_off", "jf_b", "jf_c")
        .foreach(t => spark.sql(s"DROP TABLE $t"))
    }
  }

  test("DPP in one subtree no longer freezes reorder in its siblings") {
    // leg A: an SPJ fact × filtered broadcast dim — the optimizer
    // plants a DynamicPruning filter on the fact scan. leg B: the
    // big ⋈ big2 ⋈ small catalog join written big-first. Before this
    // round ANY DynamicPruning anywhere vetoed the late reorder for
    // the WHOLE plan; the veto is now per subtree, so leg B must
    // still reorder small-first while leg A keeps Spark's shape.
    val rootF = tmpDir() + "/cbo-dpp-fact"
    val fact = (1L to 500L).map(k => (k, k % 10)).toDF("k", "b")
    TxTable.appendPartitioned(fact, rootF, "b")
    val dimPath = tmpDir() + "/cbo-dpp-dim"
    (0L to 9L).map(b => (b, if (b < 2) "keep" else "drop"))
      .toDF("db", "tag").write.parquet(dimPath)
    val rootB = tmpDir() + "/cbo-dpp-big"
    val rootB2 = tmpDir() + "/cbo-dpp-big2"
    val rootS = tmpDir() + "/cbo-dpp-small"
    TxTable.append((1L to 20000L).map(i => (i, i % 97)).toDF("k", "x1"),
      rootB, statsCols = Seq("k"))
    TxTable.append((1L to 20000L).map(i => (i, i % 89)).toDF("k2", "x2"),
      rootB2, statsCols = Seq("k2"))
    TxTable.append((1L to 10L).map(i => (i, s"n$i")).toDF("k3", "nm"),
      rootS)
    Seq(rootB, rootB2, rootS).foreach(r =>
      TxTable.analyze(spark, r, exact = true))
    spark.sql(s"CREATE TABLE jd_big USING `graft-tx` OPTIONS (path '$rootB')")
    spark.sql(
      s"CREATE TABLE jd_big2 USING `graft-tx` OPTIONS (path '$rootB2')")
    spark.sql(
      s"CREATE TABLE jd_small USING `graft-tx` OPTIONS (path '$rootS')")
    graft.functions.GraftFunctions.register(spark)
    val confs = Seq(
      "spark.sql.cbo.enabled" -> "true",
      "spark.sql.cbo.joinReorder.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.adaptive.enabled" -> "false")
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      import org.apache.spark.sql.functions.{broadcast, count, lit}
      val legA = spark.read.format("graft-tx")
        .option("partitionCol", "b").load(rootF)
        .join(broadcast(spark.read.parquet(dimPath)
          .filter($"tag" === "keep")), $"b" === $"db")
        .agg(count(lit(1)).as("c"))
      val legB = spark.sql(
        """SELECT count(*) AS c
          |FROM jd_big b JOIN jd_big2 b2 ON b.k = b2.k2
          |JOIN jd_small s ON b.k = s.k3""".stripMargin)
      val q = legA.unionAll(legB)
      val opt = q.queryExecution.optimizedPlan
      // the DPP really is in the plan (otherwise this proves nothing)
      val dppPresent = opt.exists(_.expressions.exists(_.exists {
        case _: org.apache.spark.sql.catalyst.expressions.DynamicPruning =>
          true
        case _ => false
      }))
      assert(dppPresent, "expected a planted DynamicPruning filter:\n" +
        opt.toString)
      // leg B still reordered: its innermost join touches k3
      val joins = opt.collect {
        case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
      }
      val innermost = joins.filter(j =>
        !j.children.exists(_.exists(
          _.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Join])))
      assert(innermost.exists(_.condition.toSeq
          .flatMap(_.references.map(_.name)).toSet.contains("k3")),
        s"expected big ⋈ small innermost in the DPP-free sibling:\n$opt")
      // and both legs answer correctly
      val rows = q.collect().map(_.getLong(0)).sorted
      assert(rows === Array(10L, 100L), rows.mkString(","))
    } finally {
      confs.foreach { case (k, _) => spark.conf.unset(k) }
      Seq("jd_big", "jd_big2", "jd_small")
        .foreach(t => spark.sql(s"DROP TABLE $t"))
    }
  }

  test("a reordered star join still receives dynamic partition " +
    "pruning (the r13 mirror gap, closed)") {
    // written order: (fact JOIN big) JOIN filtered-dim. The stock
    // PartitionPruning batch runs before the stats relay, so the
    // catalog dim still reports 8 EiB there and DPP is never planted.
    // The late pass must BOTH reorder (filtered dim first - it is
    // tiny) AND plant a DynamicPruning filter on the SPJ fact scan of
    // the reordered shape.
    val rootF = tmpDir() + "/cbo-mirror-fact"
    val fact = (1L to 50000L).map(k => (k, k % 10)).toDF("k", "b")
    TxTable.appendPartitioned(fact, rootF, "b", statsCols = Seq("k"))
    val rootB = tmpDir() + "/cbo-mirror-big"
    TxTable.append((1L to 200000L).map(i => (i, i % 97)).toDF("kb", "xb"),
      rootB, statsCols = Seq("kb"))
    val rootD = tmpDir() + "/cbo-mirror-dim"
    TxTable.append((0L to 9L).map(b =>
      (b, if (b < 2) "keep" else "drop")).toDF("db", "tag"), rootD,
      statsCols = Seq("db"))
    Seq(rootF, rootB, rootD).foreach(r =>
      TxTable.analyze(spark, r, exact = true))
    spark.sql(s"CREATE TABLE mir_big USING `graft-tx` OPTIONS (path '$rootB')")
    spark.sql(s"CREATE TABLE mir_dim USING `graft-tx` OPTIONS (path '$rootD')")
    graft.functions.GraftFunctions.register(spark)
    val confs = Seq(
      "spark.sql.cbo.enabled" -> "true",
      "spark.sql.cbo.joinReorder.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.adaptive.enabled" -> "false")
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      import org.apache.spark.sql.functions.{count, lit, sum}
      val factDf = spark.read.format("graft-tx")
        .option("partitionCol", "b").load(rootF)
      val big = spark.table("mir_big")
      val dim = spark.table("mir_dim").filter($"tag" === "keep")
      val q = factDf.join(big, $"k" === $"kb")
        .join(dim, $"b" === $"db")
        .agg(count(lit(1)).as("c"), sum($"k").as("s"))
      val opt = q.queryExecution.optimizedPlan
      // 1. the REORDERED shape: fact joins the filtered dim FIRST
      //    (innermost join touches db), big joins after
      val joins = opt.collect {
        case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
      }
      val innermost = joins.filter(j =>
        !j.children.exists(_.exists(
          _.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Join])))
      assert(innermost.exists(_.condition.toSeq
          .flatMap(_.references.map(_.name)).toSet.contains("db")),
        s"expected fact JOIN dim innermost after reorder:\n$opt")
      // 2. the reordered plan carries a planted DynamicPruning filter
      //    (on the fact scan - the only runtime-filterable relation)
      val dppPresent = opt.exists(_.expressions.exists(_.exists {
        case _: org.apache.spark.sql.catalyst.expressions.DynamicPruning =>
          true
        case _ => false
      }))
      assert(dppPresent,
        s"expected DynamicPruning planted on the reordered plan:\n$opt")
      // 3. and the answer is exact
      val row = q.collect()(0)
      val expectKs = (1L to 50000L).filter(k => k % 10 < 2)
      assert(row.getLong(0) === expectKs.size.toLong &&
        row.getLong(1) === expectKs.sum, row.toString)
    } finally {
      confs.foreach { case (k, _) => spark.conf.unset(k) }
      Seq("mir_big", "mir_dim").foreach(t => spark.sql(s"DROP TABLE $t"))
    }
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
