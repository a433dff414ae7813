package graft

import org.apache.spark.sql.functions._
import graft.sources.TxTable

/** `ALTER TABLE t ADD COLUMNS (d INT DEFAULT 7)`: initial-default
  * semantics — PRE-EXISTING rows read the default on every face (the
  * fill applies per FILE, so post-ADD files' stored values — stored
  * NULLs included — are untouched), the DML readers fill the default
  * (an unrelated UPDATE can never corrupt defaulted rows to NULL),
  * and maintenance rewrites re-land the default into folded files. */
class DefaultColumnsSpec extends SparkSpec {

  private def mk(name: String, n: Long = 20L): String = {
    import spark.implicits._
    val root = tmpDir() + s"/$name"
    TxTable.append((1L to n).map(i => (i, s"s$i")).toDF("k", "s"), root,
      statsCols = Seq("k"))
    graft.functions.GraftFunctions.register(spark)
    spark.sql(s"DROP TABLE IF EXISTS $name")
    spark.sql(s"CREATE TABLE $name USING `graft-tx` OPTIONS (path '$root')")
    root
  }

  test("pre-ADD rows read the DEFAULT; post-ADD rows keep stored values") {
    val root = mk("dflt_t")
    spark.sql("ALTER TABLE dflt_t ADD COLUMNS " +
      "(d INT DEFAULT 7, tagv STRING DEFAULT 'a=b')")
    val t = spark.table("dflt_t")
    assert(t.filter("d = 7").count() === 20L)
    // a default containing '=' round-trips the header grammar
    assert(t.filter("tagv = 'a=b'").count() === 20L)
    // post-ADD rows carry their own values — explicit NULL included
    spark.sql("INSERT INTO dflt_t VALUES (100, 'x', 3, NULL)")
    val t2 = spark.table("dflt_t")
    assert(t2.filter("k = 100 AND d = 3 AND tagv IS NULL").count() === 1L)
    assert(t2.filter("d = 7").count() === 20L)
    // the Scala read face agrees
    assert(TxTable.read(spark, root).filter(col("d") === 7).count() === 20L)
  }

  test("an unrelated UPDATE never corrupts defaults to NULL (COW + MoR)") {
    mk("dflt_upd")
    spark.sql("ALTER TABLE dflt_upd ADD COLUMNS (d INT DEFAULT 9)")
    spark.sql("UPDATE dflt_upd SET s = 'u' WHERE k <= 5")
    val t = spark.table("dflt_upd")
    assert(t.filter("d IS NULL").count() === 0L)
    assert(t.filter("d = 9").count() === 20L)
    assert(t.filter("s = 'u'").count() === 5L)
    // merge-on-read twin
    mk("dflt_mor")
    spark.sql("ALTER TABLE dflt_mor ADD COLUMNS (d INT DEFAULT 9)")
    spark.conf.set("spark.graft.dml.positional", "true")
    try spark.sql("DELETE FROM dflt_mor WHERE k % 7 = 0")
    finally spark.conf.unset("spark.graft.dml.positional")
    val m = spark.table("dflt_mor")
    assert(m.filter("d IS NULL").count() === 0L)
    assert(m.count() === 18L)
  }

  test("maintenance rewrites re-land the default, not NULL") {
    import spark.implicits._
    val root = mk("dflt_opt")
    spark.sql("ALTER TABLE dflt_opt ADD COLUMNS (d DOUBLE DEFAULT 0.5)")
    // a post-ADD dir so compaction folds mixed-schema dirs
    TxTable.append(Seq((200L, "y", 1.5)).toDF("k", "s", "d"), root)
    spark.sql("CALL spark_catalog.system.optimize_compact('dflt_opt')")
    val t = spark.table("dflt_opt")
    assert(t.filter("d = 0.5").count() === 20L)
    assert(t.filter("k = 200 AND d = 1.5").count() === 1L)
    assert(t.filter("d IS NULL").count() === 0L)
  }

  test("time travel to a pre-ADD version serves the old schema") {
    mk("dflt_tt")
    spark.sql("ALTER TABLE dflt_tt ADD COLUMNS (d INT DEFAULT 1)")
    val old = spark.sql("SELECT * FROM dflt_tt VERSION AS OF 1")
    assert(old.columns.toSeq === Seq("k", "s"))
  }

  test("INSERT-side defaults: omitted columns and the DEFAULT keyword") {
    // CREATE-time default must survive the first commit — the live
    // schema re-derives from commits, which used to drop the
    // CURRENT_DEFAULT metadata (INSERTs silently wrote NULL after v1)
    val root = tmpDir() + "/dflt_ins"
    graft.functions.GraftFunctions.register(spark)
    spark.sql("DROP TABLE IF EXISTS dflt_ins")
    spark.sql(s"CREATE TABLE dflt_ins (k BIGINT, d INT DEFAULT 7) " +
      s"USING `graft-tx` OPTIONS (path '$root')")
    spark.sql("INSERT INTO dflt_ins (k) VALUES (1)") // pre-first-load
    spark.sql("INSERT INTO dflt_ins VALUES (2, DEFAULT)") // post
    spark.sql("INSERT INTO dflt_ins (k) VALUES (3)") // post
    assert(spark.table("dflt_ins").filter("d = 7").count() === 3L)
    // ALTER-added defaults resolve at INSERT time too
    spark.sql("ALTER TABLE dflt_ins ADD COLUMNS (z STRING DEFAULT 'zz')")
    spark.sql("INSERT INTO dflt_ins (k, d) VALUES (4, 1)")
    spark.sql("INSERT INTO dflt_ins VALUES (5, 2, DEFAULT)")
    val t = spark.table("dflt_ins")
    assert(t.filter("k >= 4 AND z = 'zz'").count() === 2L)
    // pre-ADD rows read the same default via the read-side fill
    assert(t.filter("k <= 3 AND z = 'zz'").count() === 3L)
    spark.sql("DROP TABLE dflt_ins")
  }

  test("non-literal or uncastable defaults fail the DDL loudly") {
    mk("dflt_bad")
    intercept[Exception] {
      spark.sql("ALTER TABLE dflt_bad ADD COLUMNS (d DOUBLE DEFAULT rand())")
    }
    intercept[Exception] {
      spark.sql(
        "ALTER TABLE dflt_bad ADD COLUMNS (d INT DEFAULT 'not_a_number')")
    }
    // nothing half-applied
    assert(spark.table("dflt_bad").columns.toSeq === Seq("k", "s"))
  }
}
