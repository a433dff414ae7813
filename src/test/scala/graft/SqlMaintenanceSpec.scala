package graft

import org.apache.spark.sql.functions._
import graft.sources.TxTable

/** SQL-only maintenance: `ANALYZE TABLE ... COMPUTE STATISTICS`
  * (extension rule) and `CALL spark_catalog.system.*` procedures
  * (ProcedureCatalog — runtime route), driving the same commits as
  * the Scala API. */
class SqlMaintenanceSpec extends SparkSpec {

  private def register(): Unit =
    graft.functions.GraftFunctions.register(spark)

  test("SQL ANALYZE feeds the CBO: a 3-table star reorders small-first " +
    "with zero Scala API calls") {
    register()
    import spark.implicits._
    val rootB = tmpDir() + "/sqlan-big"
    val rootB2 = tmpDir() + "/sqlan-big2"
    val rootS = tmpDir() + "/sqlan-small"
    // loads in SQL too — the whole pipeline is catalog-face-only
    Seq(("sqlan_big", rootB, "k BIGINT, x1 BIGINT"),
      ("sqlan_big2", rootB2, "k2 BIGINT, x2 BIGINT"),
      ("sqlan_small", rootS, "k3 BIGINT, nm STRING")).foreach {
      case (t, r, cols) =>
        spark.sql(s"DROP TABLE IF EXISTS $t")
        spark.sql(s"CREATE TABLE $t ($cols) USING `graft-tx` " +
          s"OPTIONS (path '$r')")
    }
    spark.sql("INSERT INTO sqlan_big SELECT id + 1, (id + 1) % 97 " +
      "FROM range(20000)")
    spark.sql("INSERT INTO sqlan_big2 SELECT id + 1, (id + 1) % 89 " +
      "FROM range(20000)")
    spark.sql("INSERT INTO sqlan_small SELECT id + 1, " +
      "concat('n', id + 1) FROM range(10)")
    // the one statement under test: SQL ANALYZE, no TxTable.analyze
    Seq("sqlan_big", "sqlan_big2", "sqlan_small").foreach(t =>
      spark.sql(s"ANALYZE TABLE $t COMPUTE STATISTICS FOR ALL COLUMNS"))
    try {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
      val q = spark.sql(
        """SELECT b.k, b2.x2, s.nm
          |FROM sqlan_big b JOIN sqlan_big2 b2 ON b.k = b2.k2
          |JOIN sqlan_small s ON b.k = s.k3""".stripMargin)
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
        s"expected big JOIN small first, innermost joins $innerRefs:\n" +
          q.queryExecution.optimizedPlan.toString)
      assert(q.count() === 10L)
    } finally {
      spark.conf.unset("spark.sql.cbo.enabled")
      spark.conf.unset("spark.sql.cbo.joinReorder.enabled")
      Seq("sqlan_big", "sqlan_big2", "sqlan_small")
        .foreach(t => spark.sql(s"DROP TABLE $t"))
    }
  }

  test("ANALYZE TABLE FOR COLUMNS and NOSCAN behave as documented") {
    register()
    import spark.implicits._
    val root = tmpDir() + "/sqlan-cols"
    TxTable.append((1L to 500L).map(i => (i, i % 7, s"v$i"))
      .toDF("k", "g", "s"), root)
    spark.sql("DROP TABLE IF EXISTS sqlan_cols")
    spark.sql(s"CREATE TABLE sqlan_cols USING `graft-tx` " +
      s"OPTIONS (path '$root')")
    val v0 = TxTable.latestVersion(spark, root)
    // NOSCAN = no-op by design (metadata stats are always exact)
    spark.sql("ANALYZE TABLE sqlan_cols COMPUTE STATISTICS NOSCAN")
    assert(TxTable.latestVersion(spark, root) === v0)
    spark.sql("ANALYZE TABLE sqlan_cols COMPUTE STATISTICS FOR COLUMNS g")
    assert(TxTable.latestVersion(spark, root) === v0 + 1)
    assert(TxTable.describeStats(spark, root, Seq("g")).count() >= 1L)
    spark.sql("DROP TABLE sqlan_cols")
  }

  test("CALL spark_catalog.system.analyze works without extensions wiring") {
    register()
    import spark.implicits._
    val root = tmpDir() + "/call-an"
    TxTable.append((1L to 300L).map(i => (i, i % 5)).toDF("k", "g"), root)
    spark.sql("DROP TABLE IF EXISTS call_an")
    spark.sql(s"CREATE TABLE call_an USING `graft-tx` OPTIONS (path '$root')")
    val v0 = TxTable.latestVersion(spark, root)
    val out = spark.sql(
      "CALL spark_catalog.system.analyze('call_an', 'g', true, false)")
      .collect()
    assert(out.length === 1 && out(0).getInt(0) === v0 + 1)
    assert(TxTable.latestVersion(spark, root) === v0 + 1)
    spark.sql("DROP TABLE call_an")
  }

  test("CALL system.compact_snapshot, optimize_compact and vacuum run") {
    register()
    import spark.implicits._
    val root = tmpDir() + "/call-maint"
    (1 to 4).foreach(i => TxTable.append(
      (1L to 50L).map(j => (j + i * 100L, j)).toDF("k", "v"), root))
    spark.sql("DROP TABLE IF EXISTS call_maint")
    spark.sql(s"CREATE TABLE call_maint USING `graft-tx` " +
      s"OPTIONS (path '$root')")
    spark.sql("CALL spark_catalog.system.optimize_compact('call_maint')")
    assert(spark.table("call_maint").count() === 200L)
    spark.sql("CALL spark_catalog.system.vacuum('call_maint', 1)")
    assert(spark.table("call_maint").count() === 200L)
    // old versions are gone after vacuum — time travel outside the
    // horizon must fail (retention worked)
    intercept[Exception] {
      TxTable.read(spark, root, version = 1).count()
    }
    spark.sql("DROP TABLE call_maint")
  }

  test("CALL system.history returns one row per retained commit") {
    register()
    import spark.implicits._
    val root = tmpDir() + "/call-hist"
    (1 to 3).foreach(i => TxTable.append(
      (1L to 10L).map(j => (j, i)).toDF("k", "v"), root))
    spark.sql("DROP TABLE IF EXISTS call_hist")
    spark.sql(s"CREATE TABLE call_hist USING `graft-tx` " +
      s"OPTIONS (path '$root')")
    val h = spark.sql("CALL spark_catalog.system.history('call_hist')")
      .collect()
    assert(h.length === 3)
    assert(h.map(_.getInt(0)).toSeq.sorted === Seq(1, 2, 3))
    assert(h.forall(_.getString(1) === "append"))
    spark.sql("DROP TABLE call_hist")
  }

  test("plain ANALYZE TABLE is the cheap metadata form (no scan, " +
    "no commit) — upstream cost expectations hold") {
    register()
    import spark.implicits._
    val root = tmpDir() + "/sqlan-plain"
    TxTable.append((1L to 200L).map(i => (i, i % 3)).toDF("k", "g"), root)
    spark.sql("DROP TABLE IF EXISTS sqlan_plain")
    spark.sql(s"CREATE TABLE sqlan_plain USING `graft-tx` " +
      s"OPTIONS (path '$root')")
    val v0 = TxTable.latestVersion(spark, root)
    // row/size stats are metadata-exact at all times: the plain form
    // must NOT become a full-table multi-aggregate column scan
    spark.sql("ANALYZE TABLE sqlan_plain COMPUTE STATISTICS")
    assert(TxTable.latestVersion(spark, root) === v0,
      "plain ANALYZE must not commit (it has nothing to refresh)")
    spark.sql("DROP TABLE sqlan_plain")
  }

  test("CALL system.restore is the operational undo: a bad load " +
    "rolls back in one metadata commit") {
    register()
    import spark.implicits._
    val root = tmpDir() + "/call-restore"
    TxTable.append((1L to 50L).map(i => (i, 1)).toDF("k", "v"), root)
    spark.sql("DROP TABLE IF EXISTS call_restore")
    spark.sql(s"CREATE TABLE call_restore USING `graft-tx` " +
      s"OPTIONS (path '$root')")
    val good = spark.table("call_restore").collect().toSet
    // the bad load
    TxTable.overwrite(Seq((999L, 9)).toDF("k", "v"), root)
    assert(spark.table("call_restore").count() === 1L)
    val out = spark.sql(
      "CALL spark_catalog.system.restore('call_restore', 1)").collect()
    assert(out.length === 1 && out(0).getInt(0) === 3)
    // forward state equals the pre-mistake frame; the mistake stays
    // in history for audit
    assert(spark.table("call_restore").collect().toSet === good)
    assert(TxTable.read(spark, root, version = 2).count() === 1L)
    spark.sql("DROP TABLE call_restore")
  }

  test("CALL system.clone branches zero-copy and the clone evolves " +
    "independently") {
    register()
    import spark.implicits._
    val root = tmpDir() + "/call-clone-src"
    val dst = tmpDir() + "/call-clone-dst"
    TxTable.append((1L to 30L).map(i => (i, i * 2)).toDF("k", "v"), root)
    spark.sql("DROP TABLE IF EXISTS call_clone_src")
    spark.sql("DROP TABLE IF EXISTS call_clone_dst")
    spark.sql(s"CREATE TABLE call_clone_src USING `graft-tx` " +
      s"OPTIONS (path '$root')")
    val out = spark.sql("CALL spark_catalog.system.clone(" +
      s"'call_clone_src', '$dst', -1, 'call_clone_dst')").collect()
    assert(out.length === 1 && out(0).getInt(0) === 1)
    // the clone is SQL-addressable immediately and content-equal
    assert(spark.table("call_clone_dst").collect().toSet ===
      spark.table("call_clone_src").collect().toSet)
    // independent evolution: loading the clone never touches the source
    spark.sql("INSERT INTO call_clone_dst VALUES (999, 0)")
    assert(spark.table("call_clone_dst").count() === 31L)
    assert(spark.table("call_clone_src").count() === 30L)
    spark.sql("DROP TABLE call_clone_src")
    spark.sql("DROP TABLE call_clone_dst")
  }

  test("CALL system.optimize_zorder reclusters from SQL; incremental " +
    "form reclusters the tail") {
    register()
    import spark.implicits._
    val root = tmpDir() + "/call-zorder"
    (0 to 3).foreach { i =>
      TxTable.append((1L to 250L).filter(_ % 4 == i)
        .map(j => (j, j * 7 % 250, j * 13 % 250)).toDF("k", "x", "y"), root)
    }
    spark.sql("DROP TABLE IF EXISTS call_zorder")
    spark.sql(s"CREATE TABLE call_zorder USING `graft-tx` " +
      s"OPTIONS (path '$root')")
    val v0 = TxTable.latestVersion(spark, root)
    spark.sql(
      "CALL spark_catalog.system.optimize_zorder('call_zorder', 'x,y', 4)")
    assert(TxTable.latestVersion(spark, root) === v0 + 1)
    assert(spark.table("call_zorder").count() === 250L)
    // z-ordered dirs carry stats on BOTH dims: a corner box prunes
    val all = spark.read.format("graft-tx").load(root).inputFiles.length
    val pruned = spark.read.format("graft-tx")
      .option("colRange.x", "0,30").option("colRange.y", "0,30")
      .load(root).inputFiles.length
    assert(pruned < all, s"z-order pruning dead: $pruned vs $all")
    // incremental: new tail data reclusters without a full rewrite
    TxTable.append((251L to 300L).map(j =>
      (j, j * 7 % 250, j * 13 % 250)).toDF("k", "x", "y"), root)
    spark.sql("CALL spark_catalog.system.optimize_zorder(" +
      "'call_zorder', 'x,y', 4, true)")
    assert(spark.table("call_zorder").count() === 300L)
    spark.sql("DROP TABLE call_zorder")
  }

  test("CALL system.partitions lists a composite string+int layout " +
    "from commit stats alone") {
    register()
    import spark.implicits._
    val root = tmpDir() + "/call-parts"
    spark.sql("DROP TABLE IF EXISTS call_parts")
    spark.sql(s"CREATE TABLE call_parts (k BIGINT, region STRING, d INT) " +
      s"USING `graft-tx` PARTITIONED BY (region, d) " +
      s"OPTIONS (path '$root')")
    spark.sql("INSERT INTO call_parts SELECT id, " +
      "CASE WHEN id % 2 = 0 THEN 'eu' ELSE 'us' END, " +
      "cast(id % 3 AS INT) FROM range(60)")
    val rows = spark.sql(
      "CALL spark_catalog.system.partitions('call_parts')").collect()
    assert(rows.length === 6, rows.mkString(","))
    val byPart = rows.map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(byPart.keySet === Set(
      "region=eu/d=0", "region=eu/d=1", "region=eu/d=2",
      "region=us/d=0", "region=us/d=1", "region=us/d=2"),
      byPart.keySet.toString)
    assert(byPart.values.map(_._2).sum === 60L, "row tallies must sum")
    assert(byPart.values.forall(_._1 >= 1L), "each tuple has >= 1 dir")
    assert(byPart.values.forall(_._3 > 0L), "bytes come from commit stats")
    // a non-partitioned table refuses loudly instead of inventing
    val root2 = tmpDir() + "/call-parts-plain"
    TxTable.append((1L to 5L).map(i => (i, i)).toDF("k", "v"), root2)
    spark.sql("DROP TABLE IF EXISTS call_parts_plain")
    spark.sql(s"CREATE TABLE call_parts_plain USING `graft-tx` " +
      s"OPTIONS (path '$root2')")
    val e = intercept[Exception] {
      spark.sql("CALL spark_catalog.system.partitions('call_parts_plain')")
        .collect()
    }
    assert(e.getMessage.contains("partition"), e.getMessage)
    spark.sql("DROP TABLE call_parts")
    spark.sql("DROP TABLE call_parts_plain")
  }

  test("literal SHOW PARTITIONS and ALTER TABLE DROP PARTITION work " +
    "on a partitioned graft-tx table") {
    register()
    import spark.implicits._
    val root = tmpDir() + "/show-parts-sql"
    spark.sql("DROP TABLE IF EXISTS showp_sql")
    spark.sql(s"CREATE TABLE showp_sql (k BIGINT, region STRING, d INT) " +
      s"USING `graft-tx` PARTITIONED BY (region, d) OPTIONS (path '$root')")
    spark.sql("INSERT INTO showp_sql SELECT id, " +
      "CASE WHEN id % 2 = 0 THEN 'eu' ELSE 'us' END, " +
      "CAST(id % 2 AS INT) FROM range(40)")
    // the literal statement — stock Spark refuses it for v2 tables
    // without the SupportsPartitionManagement face
    val parts = spark.sql("SHOW PARTITIONS showp_sql")
      .collect().map(_.getString(0)).toSet
    assert(parts === Set("region=eu/d=0", "region=us/d=1"), parts)
    // partial partition spec filters
    val eu = spark.sql("SHOW PARTITIONS showp_sql PARTITION (region = 'eu')")
      .collect().map(_.getString(0)).toSet
    assert(eu === Set("region=eu/d=0"), eu)
    // DROP PARTITION routes to the metadata-only deleteWhere triage
    val v0 = TxTable.latestVersion(spark, root)
    spark.sql(
      "ALTER TABLE showp_sql DROP PARTITION (region = 'us', d = 1)")
    assert(TxTable.latestVersion(spark, root) === v0 + 1,
      "DROP PARTITION must be one commit")
    assert(spark.table("showp_sql").count() === 20L)
    assert(spark.table("showp_sql")
      .filter("region = 'us'").count() === 0L)
    assert(spark.sql("SHOW PARTITIONS showp_sql")
      .collect().map(_.getString(0)).toSet === Set("region=eu/d=0"))
    // ADD PARTITION refuses: partitions are content-defined
    val e = intercept[Exception] {
      spark.sql(
        "ALTER TABLE showp_sql ADD PARTITION (region = 'ap', d = 9)")
    }
    assert(e.getMessage.contains("content-defined"), e.getMessage)
    spark.sql("DROP TABLE showp_sql")
  }

  test("CREATE TABLE with an unsupported partition transform is " +
    "refused at CREATE time, not at first read") {
    register()
    val root = tmpDir() + "/bad-days"
    spark.sql("DROP TABLE IF EXISTS bad_days")
    // bucket(n, c) is a SUPPORTED layout since r16 (BucketSpjSpec);
    // what stays refused: time-derived transforms, and MIXING bucket
    // with identity columns (no face serves a combined clustering)
    val e = intercept[Exception] {
      spark.sql(s"CREATE TABLE bad_days (k BIGINT, ts TIMESTAMP) " +
        s"USING `graft-tx` PARTITIONED BY (days(ts)) " +
        s"OPTIONS (path '$root')")
    }
    assert(e.getMessage.contains("identity"), e.getMessage)
    assert(!spark.catalog.tableExists("bad_days"))
    val e2 = intercept[Exception] {
      spark.sql(s"CREATE TABLE bad_days (k BIGINT, g BIGINT) " +
        s"USING `graft-tx` PARTITIONED BY (g, bucket(16, k)) " +
        s"OPTIONS (path '$root')")
    }
    assert(e2.getMessage.contains("not a mix"), e2.getMessage)
    assert(!spark.catalog.tableExists("bad_days"))
  }

  test("SHOW PARTITIONS renders DATE keys as ISO dates; DROP " +
    "PARTITION takes a date literal") {
    register()
    val root = tmpDir() + "/show-parts-date"
    spark.sql("DROP TABLE IF EXISTS showp_date")
    spark.sql(s"CREATE TABLE showp_date (k BIGINT, day DATE) " +
      s"USING `graft-tx` PARTITIONED BY (day) OPTIONS (path '$root')")
    spark.sql("INSERT INTO showp_date SELECT id, " +
      "date_add(DATE '1996-03-15', CAST(id % 2 AS INT)) FROM range(20)")
    val parts = spark.sql("SHOW PARTITIONS showp_date")
      .collect().map(_.getString(0)).toSet
    assert(parts === Set("day=1996-03-15", "day=1996-03-16"), parts)
    // the API face renders identically and tallies rows
    val api = TxTable.showPartitions(spark, root)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(api === Map("day=1996-03-15" -> 10L, "day=1996-03-16" -> 10L))
    // DROP PARTITION with a DATE literal routes through the triage
    spark.sql(
      "ALTER TABLE showp_date DROP PARTITION (day = DATE '1996-03-15')")
    assert(spark.table("showp_date").count() === 10L)
    assert(spark.sql("SHOW PARTITIONS showp_date")
      .collect().map(_.getString(0)).toSet === Set("day=1996-03-16"))
    spark.sql("DROP TABLE showp_date")
  }

  test("CALL system.vacuum dry_run lists without deleting; " +
    "system.detail summarizes from metadata") {
    register()
    import spark.implicits._
    val root = tmpDir() + "/call-dry"
    (1 to 3).foreach(i => TxTable.append(
      (1L to 20L).map(j => (j + i * 100L, j)).toDF("k", "v"), root))
    TxTable.compactSnapshot(spark, root)
    spark.sql("DROP TABLE IF EXISTS call_dry")
    spark.sql(s"CREATE TABLE call_dry USING `graft-tx` " +
      s"OPTIONS (path '$root')")
    val dry = spark.sql(
      "CALL spark_catalog.system.vacuum('call_dry', 1, true)").collect()
    assert(dry.length === 1 && !dry(0).getBoolean(0))
    val reclaimable = dry(0).getInt(1)
    assert(reclaimable >= 3,
      s"3 pre-compaction dirs + commits should be reclaimable, got " +
        s"$reclaimable")
    // dry run deleted NOTHING: time travel still serves v1
    assert(TxTable.read(spark, root, version = 1).count() === 20L)
    // detail: one metadata-only summary row
    val det = spark.sql("CALL spark_catalog.system.detail('call_dry')")
      .collect()
    assert(det.length === 1)
    val d = det(0)
    assert(d.getInt(d.fieldIndex("version")) === 4)
    assert(d.getString(d.fieldIndex("last_operation")) === "compact")
    assert(d.getLong(d.fieldIndex("num_rows")) === 60L)
    assert(d.getLong(d.fieldIndex("size_bytes")) > 0L)
    // the real vacuum reclaims what the dry run counted
    val real = spark.sql(
      "CALL spark_catalog.system.vacuum('call_dry', 1, false)").collect()
    assert(real(0).getBoolean(0) && real(0).getInt(1) === reclaimable)
    intercept[Exception] {
      TxTable.read(spark, root, version = 1).count()
    }
    spark.sql("DROP TABLE call_dry")
  }

  test("literal TRUNCATE TABLE empties in one metadata commit; " +
    "history stays time-travelable") {
    register()
    import spark.implicits._
    val root = tmpDir() + "/trunc-sql"
    TxTable.append((1L to 40L).map(i => (i, i % 5)).toDF("k", "g"), root)
    spark.sql("DROP TABLE IF EXISTS trunc_sql")
    spark.sql(s"CREATE TABLE trunc_sql USING `graft-tx` " +
      s"OPTIONS (path '$root')")
    val v0 = TxTable.latestVersion(spark, root)
    spark.sql("TRUNCATE TABLE trunc_sql")
    assert(TxTable.latestVersion(spark, root) === v0 + 1,
      "TRUNCATE must be one commit")
    assert(spark.table("trunc_sql").count() === 0L)
    // pre-truncate snapshot stays readable; INSERT refills
    assert(TxTable.read(spark, root, version = v0).count() === 40L)
    spark.sql("INSERT INTO trunc_sql VALUES (999, 1)")
    assert(spark.table("trunc_sql").count() === 1L)
    spark.sql("DROP TABLE trunc_sql")
  }

  test("unknown procedure and non-graft table fail loudly") {
    register()
    val e1 = intercept[Exception] {
      spark.sql("CALL spark_catalog.system.frobnicate('x')")
    }
    assert(e1.getMessage.contains("unknown procedure") ||
      e1.getMessage.contains("frobnicate"))
    spark.sql("DROP TABLE IF EXISTS plain_pq")
    spark.sql("CREATE TABLE plain_pq (a INT) USING parquet")
    val e2 = intercept[Exception] {
      spark.sql("CALL spark_catalog.system.analyze('plain_pq', '', " +
        "false, false)")
    }
    assert(e2.getMessage.contains("not a graft-tx table"))
    spark.sql("DROP TABLE plain_pq")
  }
}
