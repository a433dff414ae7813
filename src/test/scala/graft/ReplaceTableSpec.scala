package graft

import org.apache.spark.sql.functions._
import graft.sources.TxTable

/** CREATE OR REPLACE TABLE / REPLACE TABLE [AS SELECT] on graft-tx
  * catalog tables through the staging catalog: the replace lands as
  * ONE OCC truncate-overwrite on the table (live schema follows the
  * new data, history and tags survive), and the metastore entry is
  * recreated only when the declared definition actually moved. */
class ReplaceTableSpec extends SparkSpec {

  private def ctas(name: String, root: String): Unit = {
    graft.functions.GraftFunctions.register(spark)
    spark.sql(s"DROP TABLE IF EXISTS $name")
    spark.sql(s"CREATE TABLE $name USING `graft-tx` OPTIONS (path '$root') " +
      "AS SELECT id AS k, CAST(id % 3 AS STRING) AS g FROM range(10)")
  }

  test("RTAS with a different schema replaces content, keeps history") {
    val root = tmpDir() + "/rtas1"
    ctas("rt_t1", root)
    assert(spark.table("rt_t1").count() === 10L)
    spark.sql(s"CREATE OR REPLACE TABLE rt_t1 USING `graft-tx` " +
      s"OPTIONS (path '$root') " +
      "AS SELECT id AS x, id * 2.5 AS score FROM range(4)")
    val t = spark.table("rt_t1")
    assert(t.columns.toSeq === Seq("x", "score"))
    assert(t.count() === 4L)
    // the replace is one OCC commit on top of the CTAS load
    assert(TxTable.latestVersion(spark, root) === 2)
    // pre-replace content stays one VERSION AS OF away
    val old = spark.sql("SELECT * FROM rt_t1 VERSION AS OF 1")
    assert(old.columns.toSeq === Seq("k", "g"))
    assert(old.count() === 10L)
    spark.sql("DROP TABLE rt_t1")
  }

  test("plain REPLACE TABLE truncates to an empty declared schema") {
    val root = tmpDir() + "/rtas2"
    ctas("rt_t2", root)
    spark.sql(s"REPLACE TABLE rt_t2 (a BIGINT, b DOUBLE) " +
      s"USING `graft-tx` OPTIONS (path '$root')")
    val t = spark.table("rt_t2")
    assert(t.columns.toSeq === Seq("a", "b"))
    assert(t.count() === 0L)
    assert(spark.sql("SELECT * FROM rt_t2 VERSION AS OF 1").count() === 10L)
    // the replaced table accepts new loads under the new schema
    spark.sql("INSERT INTO rt_t2 VALUES (1, 1.5)")
    assert(spark.table("rt_t2").count() === 1L)
    spark.sql("DROP TABLE rt_t2")
  }

  test("REPLACE of a missing table fails; CREATE OR REPLACE creates") {
    graft.functions.GraftFunctions.register(spark)
    val root = tmpDir() + "/rtas3"
    spark.sql("DROP TABLE IF EXISTS rt_t3")
    // Spark refuses the missing target at analysis, before staging
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql(s"REPLACE TABLE rt_t3 (a INT) USING `graft-tx` " +
        s"OPTIONS (path '$root')")
    }
    spark.sql(s"CREATE OR REPLACE TABLE rt_t3 USING `graft-tx` " +
      s"OPTIONS (path '$root') AS SELECT id AS k FROM range(5)")
    assert(spark.table("rt_t3").count() === 5L)
    spark.sql("DROP TABLE rt_t3")
  }

  test("RTAS changing PARTITIONED BY recreates the catalog entry") {
    val root = tmpDir() + "/rtas4"
    ctas("rt_t4", root)
    spark.sql(s"CREATE OR REPLACE TABLE rt_t4 USING `graft-tx` " +
      s"OPTIONS (path '$root') PARTITIONED BY (g) " +
      "AS SELECT id AS k, CAST(id % 2 AS STRING) AS g FROM range(8)")
    // declared partitioning shows on the reloaded catalog table and
    // the replace's own write already landed the clustered layout
    val parts = spark.sql("SHOW PARTITIONS rt_t4").collect()
      .map(_.getString(0)).sorted.toSeq
    assert(parts === Seq("g=0", "g=1"))
    assert(spark.table("rt_t4").count() === 8L)
    spark.sql("DROP TABLE rt_t4")
  }

  test("tags survive a replace and vacuum still honors them") {
    val root = tmpDir() + "/rtas5"
    ctas("rt_t5", root)
    spark.sql("CALL spark_catalog.system.tag('rt_t5', 'pre_replace')")
    spark.sql(s"CREATE OR REPLACE TABLE rt_t5 USING `graft-tx` " +
      s"OPTIONS (path '$root') AS SELECT id AS z FROM range(2)")
    spark.sql("CALL spark_catalog.system.vacuum('rt_t5', 1)")
    val pinned = spark.sql(
      "SELECT * FROM rt_t5 VERSION AS OF 'pre_replace'")
    assert(pinned.columns.toSeq === Seq("k", "g"))
    assert(pinned.count() === 10L)
    spark.sql("DROP TABLE rt_t5")
  }
}
