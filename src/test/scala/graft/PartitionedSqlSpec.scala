package graft

import org.apache.spark.sql.functions._
import graft.sources.TxTable

/** SQL-first partitioned layout + partition-scoped INSERT OVERWRITE:
  * CREATE TABLE ... PARTITIONED BY lands the clustered `$p=v` layout
  * through plain INSERT INTO, and INSERT OVERWRITE (static partition
  * spec, dynamic mode, or replace-all) swaps exactly the replaced
  * partitions in ONE OCC commit — untouched partitions' files are
  * byte-identical, never opened or moved. */
class PartitionedSqlSpec extends SparkSpec {

  private def register(): Unit =
    graft.functions.GraftFunctions.register(spark)

  /** (path, length, mtime) of every data file under `root`/`dir`. */
  private def fileFacts(root: String, prefix: String): Set[(String, Long, Long)] = {
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    def walk(p: org.apache.hadoop.fs.Path): Seq[(String, Long, Long)] =
      fs.listStatus(p).toSeq.flatMap { s =>
        if (s.isDirectory) walk(s.getPath)
        else Seq((s.getPath.toString, s.getLen, s.getModificationTime))
      }
    val base = new org.apache.hadoop.fs.Path(root, "data")
    if (!fs.exists(base)) Set.empty
    else fs.listStatus(base).toSeq.filter(_.isDirectory)
      .flatMap(d => walk(d.getPath)).filter(_._1.contains(prefix)).toSet
  }

  test("CREATE TABLE PARTITIONED BY + INSERT INTO lands the clustered layout") {
    register()
    val root = tmpDir() + "/psql_ins"
    spark.sql("DROP TABLE IF EXISTS psql_ins")
    spark.sql("CREATE TABLE psql_ins (k BIGINT, v DOUBLE, day INT) " +
      s"USING `graft-tx` PARTITIONED BY (day) OPTIONS (path '$root')")
    spark.sql("INSERT INTO psql_ins SELECT id AS k, id * 0.5 AS v, " +
      "CAST(id % 4 AS INT) AS day FROM range(400)")
    val t = spark.table("psql_ins")
    assert(t.count() === 400L)
    // the layout is the provable clustered one: one `day=<v>` dir per
    // value, each single-valued
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val dataDirs = fs.listStatus(new org.apache.hadoop.fs.Path(root, "data"))
      .filter(_.isDirectory).flatMap(d => fs.listStatus(d.getPath))
      .map(_.getPath.getName).toSeq
    assert(dataDirs.toSet === Set("day=0", "day=1", "day=2", "day=3"))
    // ... and the catalog face reports the partitioning
    assert(TxTable.layoutPartCols(spark, root) === Seq("day"))
    // a second INSERT INTO appends more partition dirs, no rewrite
    spark.sql("INSERT INTO psql_ins SELECT id, id * 0.5, " +
      "CAST(4 AS INT) FROM range(50)")
    assert(spark.table("psql_ins").count() === 450L)
    assert(spark.table("psql_ins").filter("day = 4").count() === 50L)
  }

  test("static INSERT OVERWRITE PARTITION swaps exactly that partition in one commit") {
    register()
    val root = tmpDir() + "/psql_ow"
    spark.sql("DROP TABLE IF EXISTS psql_ow")
    spark.sql("CREATE TABLE psql_ow (k BIGINT, v DOUBLE, day INT) " +
      s"USING `graft-tx` PARTITIONED BY (day) OPTIONS (path '$root')")
    spark.sql("INSERT INTO psql_ow SELECT id, id * 1.0, " +
      "CAST(id % 3 AS INT) FROM range(300)")
    val before = fileFacts(root, "day=")
    val untouchedBefore = before.filterNot(_._1.contains("day=1"))
    val v0 = TxTable.latestVersion(spark, root)
    spark.sql("INSERT OVERWRITE psql_ow PARTITION (day = 1) " +
      "SELECT id + 1000, -1.0 FROM range(10)")
    // ONE commit
    assert(TxTable.latestVersion(spark, root) === v0 + 1)
    val t = spark.table("psql_ow")
    assert(t.filter("day = 1").count() === 10L)
    assert(t.filter("day = 1 AND v = -1.0").count() === 10L)
    assert(t.filter("day = 0").count() === 100L)
    assert(t.filter("day = 2").count() === 100L)
    // untouched partitions' files byte-identical (same path, length,
    // mtime — never rewritten, moved, or re-opened for write)
    val after = fileFacts(root, "day=")
    val untouchedAfter = after.filterNot(_._1.contains("day=1"))
    assert(untouchedAfter === untouchedBefore)
    // time travel still serves the pre-overwrite partition
    assert(TxTable.read(spark, root, version = v0)
      .filter(col("day") === 1).count() === 100L)
  }

  test("dynamic overwrite replaces exactly the partitions present in the new data") {
    register()
    val root = tmpDir() + "/psql_dyn"
    spark.sql("DROP TABLE IF EXISTS psql_dyn")
    spark.sql("CREATE TABLE psql_dyn (k BIGINT, day INT) " +
      s"USING `graft-tx` PARTITIONED BY (day) OPTIONS (path '$root')")
    spark.sql("INSERT INTO psql_dyn SELECT id, CAST(id % 4 AS INT) " +
      "FROM range(400)")
    val before = fileFacts(root, "day=")
    val v0 = TxTable.latestVersion(spark, root)
    import spark.implicits._
    // partitions 2 and 3 re-load; 0 and 1 untouched
    val reload = Seq((9000L, 2), (9001L, 2), (9002L, 3)).toDF("k", "day")
    reload.writeTo("psql_dyn").overwritePartitions()
    assert(TxTable.latestVersion(spark, root) === v0 + 1)
    val t = spark.table("psql_dyn")
    assert(t.filter("day = 2").count() === 2L)
    assert(t.filter("day = 3").count() === 1L)
    assert(t.filter("day = 0").count() === 100L)
    assert(t.filter("day = 1").count() === 100L)
    val after = fileFacts(root, "day=")
    assert(after.filter(f => f._1.contains("day=0") || f._1.contains("day=1"))
      === before.filter(f => f._1.contains("day=0") || f._1.contains("day=1")))
    // INSERT OVERWRITE under dynamic partitionOverwriteMode = the same
    val prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      spark.sql("INSERT OVERWRITE psql_dyn SELECT id + 500, " +
        "CAST(0 AS INT) FROM range(5)")
      assert(spark.table("psql_dyn").filter("day = 0").count() === 5L)
      assert(spark.table("psql_dyn").filter("day = 1").count() === 100L)
    } finally spark.conf.set(
      "spark.sql.sources.partitionOverwriteMode", prev)
  }

  test("static INSERT OVERWRITE PARTITION on a STRING key swaps only " +
    "that hex-token dir; untouched string partitions byte-identical") {
    register()
    val root = tmpDir() + "/psql_ow_str"
    spark.sql("DROP TABLE IF EXISTS psql_ow_str")
    spark.sql("CREATE TABLE psql_ow_str (k BIGINT, day STRING) " +
      s"USING `graft-tx` PARTITIONED BY (day) OPTIONS (path '$root')")
    spark.sql("INSERT INTO psql_ow_str SELECT id, " +
      "concat('2026-08-1', CAST(id % 3 AS STRING)) FROM range(300)")
    // string partition dirs mint hex tokens: '2026-08-11' -> x<hex>
    val hex11 = "2026-08-11".getBytes("UTF-8")
      .map(b => f"$b%02x").mkString
    val before = fileFacts(root, "day=")
    assert(before.exists(_._1.contains(s"day=x$hex11")),
      s"expected a hex-token dir day=x$hex11 in ${before.map(_._1)}")
    val untouchedBefore = before.filterNot(_._1.contains(s"day=x$hex11"))
    val v0 = TxTable.latestVersion(spark, root)
    spark.sql("INSERT OVERWRITE psql_ow_str " +
      "PARTITION (day = '2026-08-11') SELECT id + 1000 FROM range(7)")
    assert(TxTable.latestVersion(spark, root) === v0 + 1,
      "string-key partition overwrite must be ONE OCC commit")
    val t = spark.table("psql_ow_str")
    assert(t.filter("day = '2026-08-11'").count() === 7L)
    assert(t.filter("day = '2026-08-10'").count() === 100L)
    assert(t.filter("day = '2026-08-12'").count() === 100L)
    val untouchedAfter = fileFacts(root, "day=")
      .filterNot(_._1.contains(s"day=x$hex11"))
    assert(untouchedAfter === untouchedBefore,
      "untouched string partitions must stay byte-identical")
    // time travel still serves the pre-reload partition
    assert(TxTable.read(spark, root, version = v0)
      .filter(col("day") === "2026-08-11").count() === 100L)
  }

  test("full INSERT OVERWRITE keeps the clustered layout") {
    register()
    val root = tmpDir() + "/psql_full"
    spark.sql("DROP TABLE IF EXISTS psql_full")
    spark.sql("CREATE TABLE psql_full (k BIGINT, day INT) " +
      s"USING `graft-tx` PARTITIONED BY (day) OPTIONS (path '$root')")
    spark.sql("INSERT INTO psql_full SELECT id, CAST(id % 3 AS INT) " +
      "FROM range(300)")
    spark.sql("INSERT OVERWRITE psql_full SELECT id, " +
      "CAST(id % 2 AS INT) FROM range(20)")
    val t = spark.table("psql_full")
    assert(t.count() === 20L)
    assert(TxTable.layoutPartCols(spark, root) === Seq("day"))
  }

  test("string and date partition columns round-trip the SQL face") {
    register()
    val root = tmpDir() + "/psql_str"
    spark.sql("DROP TABLE IF EXISTS psql_str")
    spark.sql("CREATE TABLE psql_str (k BIGINT, d DATE, region STRING) " +
      s"USING `graft-tx` PARTITIONED BY (region, d) OPTIONS (path '$root')")
    spark.sql("INSERT INTO psql_str SELECT id, " +
      "DATE'2026-08-01' + CAST(id % 2 AS INT), " +
      "CASE WHEN id % 2 = 0 THEN 'emea' ELSE 'apac' END FROM range(100)")
    assert(spark.table("psql_str").count() === 100L)
    assert(TxTable.layoutPartCols(spark, root) === Seq("region", "d"))
    spark.sql("INSERT OVERWRITE psql_str " +
      "PARTITION (region = 'emea', d = DATE'2026-08-01') " +
      "SELECT id + 700 FROM range(7)")
    val t = spark.table("psql_str")
    assert(t.filter("region = 'emea'").count() === 7L)
    assert(t.filter("region = 'apac'").count() === 50L)
    assert(t.filter("region = 'emea' AND d = DATE'2026-08-01'")
      .count() === 7L)
  }

  test("INSERT INTO an API-built partitioned table keeps its clustered layout") {
    register()
    import spark.implicits._
    val root = tmpDir() + "/psql_api"
    val df = (0L until 200L).map(i => (i, (i % 5).toInt))
      .toDF("k", "bucket")
    TxTable.appendPartitionedBy(df, root, Seq("bucket"))
    spark.sql("DROP TABLE IF EXISTS psql_api")
    spark.sql("CREATE TABLE psql_api USING `graft-tx` " +
      s"OPTIONS (path '$root')")
    spark.sql("INSERT INTO psql_api SELECT id + 900, CAST(7 AS INT) " +
      "FROM range(10)")
    assert(spark.table("psql_api").count() === 210L)
    // the append stayed clustered: layout still proves the partitioning
    assert(TxTable.layoutPartCols(spark, root) === Seq("bucket"))
    spark.sql("INSERT OVERWRITE psql_api PARTITION (bucket = 7) " +
      "SELECT id FROM range(3)")
    assert(spark.table("psql_api").filter("bucket = 7").count() === 3L)
    assert(spark.table("psql_api").count() === 203L)
  }

  test("CTAS PARTITIONED BY lands the clustered layout") {
    register()
    val root = tmpDir() + "/psql_ctas"
    spark.sql("DROP TABLE IF EXISTS psql_ctas")
    spark.sql("CREATE TABLE psql_ctas USING `graft-tx` " +
      s"PARTITIONED BY (day) OPTIONS (path '$root') AS " +
      "SELECT id AS k, CAST(id % 3 AS INT) AS day FROM range(90)")
    assert(spark.table("psql_ctas").count() === 90L)
    assert(TxTable.layoutPartCols(spark, root) === Seq("day"))
    spark.sql("INSERT OVERWRITE psql_ctas PARTITION (day = 1) " +
      "SELECT id + 500 FROM range(4)")
    assert(spark.table("psql_ctas").filter("day = 1").count() === 4L)
    assert(spark.table("psql_ctas").count() === 64L)
  }

  test("overwrite by non-partition filter refuses loudly") {
    register()
    val root = tmpDir() + "/psql_bad"
    spark.sql("DROP TABLE IF EXISTS psql_bad")
    spark.sql("CREATE TABLE psql_bad (k BIGINT, day INT) " +
      s"USING `graft-tx` PARTITIONED BY (day) OPTIONS (path '$root')")
    spark.sql("INSERT INTO psql_bad SELECT id, CAST(id % 2 AS INT) " +
      "FROM range(10)")
    import spark.implicits._
    val e = intercept[Exception] {
      Seq((1L, 0)).toDF("k", "day").writeTo("psql_bad")
        .overwrite(col("k") === 1L)
    }
    assert(e.getMessage.contains("partition-column predicates only"))
  }

  test("rows outside the overwritten partitions refuse loudly") {
    register()
    val root = tmpDir() + "/psql_outside"
    spark.sql("DROP TABLE IF EXISTS psql_outside")
    spark.sql("CREATE TABLE psql_outside (k BIGINT, day INT) " +
      s"USING `graft-tx` PARTITIONED BY (day) OPTIONS (path '$root')")
    spark.sql("INSERT INTO psql_outside SELECT id, CAST(id % 2 AS INT) " +
      "FROM range(10)")
    import spark.implicits._
    val e = intercept[Exception] {
      Seq((1L, 0), (2L, 1)).toDF("k", "day").writeTo("psql_outside")
        .overwrite(col("day") === 0)
    }
    assert(e.getMessage.contains("outside the overwritten partitions"))
  }

  test("NULL partition values refuse loudly") {
    register()
    val root = tmpDir() + "/psql_null"
    spark.sql("DROP TABLE IF EXISTS psql_null")
    spark.sql("CREATE TABLE psql_null (k BIGINT, day INT) " +
      s"USING `graft-tx` PARTITIONED BY (day) OPTIONS (path '$root')")
    val e = intercept[Exception] {
      spark.sql("INSERT INTO psql_null SELECT id, " +
        "CAST(NULL AS INT) FROM range(5)")
    }
    assert(e.getMessage.contains("NULL"))
  }

  test("partition overwrite against a mixed-layout table refuses loudly") {
    register()
    import spark.implicits._
    val root = tmpDir() + "/psql_mixed"
    // one clustered dir + one plain (unpartitioned) append
    TxTable.appendPartitionedBy(
      (0L until 10L).map(i => (i, 1)).toDF("k", "day"), root, Seq("day"))
    TxTable.append(
      (10L until 20L).map(i => (i, 2)).toDF("k", "day"), root)
    spark.sql("DROP TABLE IF EXISTS psql_mixed")
    spark.sql("CREATE TABLE psql_mixed (k BIGINT, day INT) " +
      s"USING `graft-tx` PARTITIONED BY (day) OPTIONS (path '$root')")
    val e = intercept[Exception] {
      Seq((100L, 1)).toDF("k", "day").writeTo("psql_mixed")
        .overwritePartitions()
    }
    assert(e.getMessage.contains("does not prove partition columns"))
  }
}
