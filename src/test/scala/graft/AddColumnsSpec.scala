package graft

import org.apache.spark.sql.functions._
import graft.sources.TxTable

/** `ALTER TABLE ... ADD COLUMNS` as a real metadata-only commit: the
  * type lands in the `schema:` header, reads null-fill until data
  * arrives, later INSERTs provide values, and every face (SQL,
  * catalog, API, DML) serves the declared schema. */
class AddColumnsSpec extends SparkSpec {

  private def mkTable(name: String, n: Long = 100L): String = {
    import spark.implicits._
    val root = tmpDir() + s"/$name"
    TxTable.append(
      (1L to n).map(i => (i, s"s$i")).toDF("k", "s"), root,
      statsCols = Seq("k"))
    spark.sql(s"DROP TABLE IF EXISTS $name")
    spark.sql(s"CREATE TABLE $name USING `graft-tx` OPTIONS (path '$root')")
    graft.functions.GraftFunctions.register(spark)
    root
  }

  test("ADD COLUMNS is one metadata commit; reads null-fill; INSERT provides data") {
    val root = mkTable("addc_basic")
    val v0 = TxTable.latestVersion(spark, root)
    spark.sql("ALTER TABLE addc_basic ADD COLUMNS (price DOUBLE)")
    assert(TxTable.latestVersion(spark, root) === v0 + 1)
    // schema evolves immediately, existing rows read NULL
    val t = spark.table("addc_basic")
    assert(t.columns.toSeq === Seq("k", "s", "price"))
    assert(t.filter("price IS NULL").count() === 100L)
    // new data provides values; old rows stay NULL
    spark.sql("INSERT INTO addc_basic VALUES (200, 'n', 9.5)")
    val t2 = spark.table("addc_basic")
    assert(t2.count() === 101L)
    assert(t2.filter("price = 9.5").count() === 1L)
    assert(t2.filter("price IS NULL").count() === 100L)
    // the API face serves the same
    assert(TxTable.read(spark, root).columns.toSeq === Seq("k", "s", "price"))
  }

  test("added column supports SQL DML (UPDATE fills it in place)") {
    mkTable("addc_dml")
    spark.sql("ALTER TABLE addc_dml ADD COLUMNS (flag INT)")
    spark.sql("UPDATE addc_dml SET flag = 1 WHERE k % 10 = 0")
    val t = spark.table("addc_dml")
    assert(t.filter("flag = 1").count() === 10L)
    assert(t.filter("flag IS NULL").count() === 90L)
  }

  test("add + rename + drop compose; dropped column cannot resurrect") {
    val root = mkTable("addc_evolve")
    spark.sql("ALTER TABLE addc_evolve ADD COLUMNS (x BIGINT)")
    spark.sql("INSERT INTO addc_evolve VALUES (500, 'w', 42)")
    spark.sql("ALTER TABLE addc_evolve RENAME COLUMN x TO y")
    assert(spark.table("addc_evolve").filter("y = 42").count() === 1L)
    spark.sql("ALTER TABLE addc_evolve DROP COLUMN y")
    assert(spark.table("addc_evolve").columns.toSeq === Seq("k", "s"))
    // re-adding the same name gets a FRESH column — old 42 is gone
    spark.sql("ALTER TABLE addc_evolve ADD COLUMNS (x BIGINT)")
    val t = spark.table("addc_evolve")
    assert(t.filter("x IS NOT NULL").count() === 0L)
    // time travel still serves the version where y held 42
    val mid = TxTable.read(spark, root,
      version = TxTable.latestVersion(spark, root) - 2)
    assert(mid.filter(col("y") === 42).count() === 1L)
  }

  test("multi-column ADD COLUMNS is ONE atomic commit; a failing " +
    "statement leaves nothing behind") {
    val root = mkTable("addc_atomic")
    val v0 = TxTable.latestVersion(spark, root)
    spark.sql("ALTER TABLE addc_atomic ADD COLUMNS (x BIGINT, y DOUBLE)")
    assert(TxTable.latestVersion(spark, root) === v0 + 1,
      "two added columns must land as one commit")
    assert(spark.table("addc_atomic").columns.toSeq ===
      Seq("k", "s", "x", "y"))
    // a statement whose LATER column fails (duplicate of an existing
    // one) must apply NEITHER — no half-applied DDL
    val v1 = TxTable.latestVersion(spark, root)
    intercept[Exception] {
      spark.sql("ALTER TABLE addc_atomic ADD COLUMNS (z BIGINT, x INT)")
    }
    assert(TxTable.latestVersion(spark, root) === v1,
      "failed ADD COLUMNS must not commit")
    assert(spark.table("addc_atomic").columns.toSeq ===
      Seq("k", "s", "x", "y"), "no phantom 'z' column")
  }

  test("unsupported ALTER TABLE changes fail loudly instead of vanishing") {
    mkTable("addc_loud")
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE addc_loud ALTER COLUMN k TYPE INT")
    }
    assert(e.getMessage.contains("graft-tx") ||
      e.getMessage.contains("not supported"))
  }

  test("added types round-trip: decimal, date, timestamp, string") {
    val root = mkTable("addc_types")
    spark.sql("ALTER TABLE addc_types ADD COLUMNS (d DECIMAL(10,2))")
    spark.sql("ALTER TABLE addc_types ADD COLUMNS (dt DATE)")
    spark.sql("ALTER TABLE addc_types ADD COLUMNS (label STRING)")
    spark.sql("INSERT INTO addc_types VALUES " +
      "(300, 'z', 12.34, DATE'2026-08-16', 'hello')")
    val r = spark.table("addc_types").filter("k = 300").collect()(0)
    assert(r.getAs[java.math.BigDecimal]("d").doubleValue() === 12.34)
    assert(r.getAs[java.sql.Date]("dt").toString === "2026-08-16")
    assert(r.getAs[String]("label") === "hello")
    // schema survives an unrelated commit (header carried forward)
    TxTable.append(spark.table("addc_types").filter("k = 300")
      .select("k", "s", "d", "dt", "label"), root)
    assert(spark.table("addc_types").columns.toSeq ===
      Seq("k", "s", "d", "dt", "label"))
  }

  test("compaction materializes the added column and retires the header") {
    val root = mkTable("addc_compact", 50L)
    spark.sql("ALTER TABLE addc_compact ADD COLUMNS (w DOUBLE)")
    spark.sql("INSERT INTO addc_compact VALUES (600, 'c', 1.5)")
    TxTable.compactSnapshot(spark, root)
    val t = spark.table("addc_compact")
    assert(t.columns.toSeq === Seq("k", "s", "w"))
    assert(t.count() === 51L)
    assert(t.filter("w = 1.5").count() === 1L)
    assert(t.filter("w IS NULL").count() === 50L)
  }
}
