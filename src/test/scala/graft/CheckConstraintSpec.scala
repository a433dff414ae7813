package graft

import org.apache.spark.sql.functions._
import graft.sources.TxTable

/** Persistent CHECK constraints: `check:name=sql` commit headers,
  * validated against existing rows at ADD time, enforced on EVERY
  * write face (the in-write observe guard — no second scan of the
  * batch), carried across commits like the column mapping, surfaced
  * to SQL as `ALTER TABLE t ADD/DROP CONSTRAINT` via the catalog
  * face's enforced v2 constraints. */
class CheckConstraintSpec extends SparkSpec {

  private def mk(name: String, n: Long = 20L): String = {
    import spark.implicits._
    val root = tmpDir() + s"/$name"
    TxTable.append(
      (1L to n).map(i => (i, i * 10.0)).toDF("k", "price"), root,
      statsCols = Seq("k"))
    root
  }

  test("add validates existing rows; list / drop round trip; grammar") {
    import spark.implicits._
    val root = mk("chk_api")
    // existing rows all satisfy: DDL lands
    TxTable.addCheckConstraint(spark, root, "price_pos", "price > 0")
    assert(TxTable.checkConstraints(spark, root) ===
      Seq("price_pos" -> "price > 0"))
    // duplicate name refuses
    intercept[IllegalArgumentException] {
      TxTable.addCheckConstraint(spark, root, "price_pos", "price > 1")
    }
    // a constraint existing rows violate refuses the DDL itself
    val e = intercept[IllegalArgumentException] {
      TxTable.addCheckConstraint(spark, root, "k_small", "k < 10")
    }
    assert(e.getMessage.contains("existing rows"))
    // name and predicate grammar police the header format
    intercept[IllegalArgumentException] {
      TxTable.addCheckConstraint(spark, root, "7bad", "price > 0")
    }
    intercept[IllegalArgumentException] {
      TxTable.addCheckConstraint(spark, root, "nl", "price >\n 0")
    }
    // drop removes; dropping a missing name is loud
    TxTable.dropCheckConstraint(spark, root, "price_pos")
    assert(TxTable.checkConstraints(spark, root).isEmpty)
    intercept[IllegalArgumentException] {
      TxTable.dropCheckConstraint(spark, root, "price_pos")
    }
    // per-version view: the constraint exists only in its window
    val vs = (1 to TxTable.latestVersion(spark, root)).map(v =>
      v -> TxTable.checkConstraints(spark, root, v).map(_._1))
    assert(vs.exists(_._2 == Seq("price_pos")))
    assert(vs.last._2 === Seq.empty)
  }

  test("write faces enforce: append, overwrite, partitioned append") {
    import spark.implicits._
    val root = mk("chk_write")
    TxTable.addCheckConstraint(spark, root, "price_pos", "price > 0")
    val v1 = TxTable.latestVersion(spark, root)
    // violating append rejected, table unchanged (no new version)
    val e = intercept[IllegalArgumentException] {
      TxTable.append(Seq((100L, -5.0)).toDF("k", "price"), root)
    }
    assert(e.getMessage.contains("price_pos"))
    assert(TxTable.latestVersion(spark, root) === v1)
    assert(TxTable.read(spark, root).count() === 20L)
    // NULL evaluations PASS (the SQL CHECK convention)
    TxTable.append(Seq((101L, Option.empty[Double])).toDF("k", "price"),
      root)
    assert(TxTable.read(spark, root).count() === 21L)
    // valid append passes; constraints carry across the commit
    TxTable.append(Seq((102L, 7.0)).toDF("k", "price"), root)
    assert(TxTable.checkConstraints(spark, root).size === 1)
    // violating overwrite rejected too (content replacement is still
    // content — the constraint survives until dropped)
    intercept[IllegalArgumentException] {
      TxTable.overwrite(Seq((1L, -1.0)).toDF("k", "price"), root)
    }
    assert(TxTable.read(spark, root).count() === 22L)
    // partitioned append face enforces through its own write pass
    val rootP = tmpDir() + "/chk_part"
    TxTable.appendPartitionedBy(
      (1L to 10L).map(i => (i, i % 3, i * 1.0)).toDF("k", "g", "price"),
      rootP, partCols = Seq("g"), statsCols = Seq("k"))
    TxTable.addCheckConstraint(spark, rootP, "p_pos", "price > 0")
    intercept[IllegalArgumentException] {
      TxTable.appendPartitionedBy(
        Seq((11L, 1L, -2.0)).toDF("k", "g", "price"), rootP, Seq("g"))
    }
    assert(TxTable.read(spark, rootP).count() === 10L)
    TxTable.appendPartitionedBy(
      Seq((11L, 1L, 2.0)).toDF("k", "g", "price"), rootP, Seq("g"))
    assert(TxTable.read(spark, rootP).count() === 11L)
  }

  test("SQL face: ADD/DROP CONSTRAINT, INSERT enforcement, IF EXISTS") {
    import spark.implicits._
    val root = mk("chk_sql")
    graft.functions.GraftFunctions.register(spark)
    spark.sql("DROP TABLE IF EXISTS chk_sql_t")
    spark.sql(
      s"CREATE TABLE chk_sql_t USING `graft-tx` OPTIONS (path '$root')")
    try {
      spark.sql("ALTER TABLE chk_sql_t ADD CONSTRAINT price_pos " +
        "CHECK (price > 0)")
      assert(TxTable.checkConstraints(spark, root).map(_._1) ===
        Seq("price_pos"))
      // Spark's own CheckInvariant rejects the violating INSERT on the
      // catalog face (constraints() reports ENFORCED)
      val e = intercept[Exception] {
        spark.sql("INSERT INTO chk_sql_t VALUES (200, -1.0)")
      }
      assert(e.getMessage.toLowerCase.contains("check") ||
        e.getMessage.contains("price_pos"))
      assert(spark.table("chk_sql_t").count() === 20L)
      spark.sql("INSERT INTO chk_sql_t VALUES (200, 1.0)")
      assert(spark.table("chk_sql_t").count() === 21L)
      // adding a constraint existing rows violate fails from SQL too
      intercept[Exception] {
        spark.sql("ALTER TABLE chk_sql_t ADD CONSTRAINT k_tiny " +
          "CHECK (k < 5)")
      }
      assert(TxTable.checkConstraints(spark, root).map(_._1) ===
        Seq("price_pos"))
      // DROP re-permits; IF EXISTS of a missing name is a no-op
      spark.sql("ALTER TABLE chk_sql_t DROP CONSTRAINT price_pos")
      spark.sql("ALTER TABLE chk_sql_t DROP CONSTRAINT IF EXISTS nope")
      spark.sql("INSERT INTO chk_sql_t VALUES (201, -1.0)")
      assert(spark.table("chk_sql_t").count() === 22L)
      intercept[Exception] {
        spark.sql("ALTER TABLE chk_sql_t DROP CONSTRAINT nope")
      }
    } finally spark.sql("DROP TABLE IF EXISTS chk_sql_t")
  }

  test("UPDATE / MERGE respect the constraint; DESCRIBE-able; non-CHECK loud") {
    import spark.implicits._
    val root = mk("chk_dml")
    graft.functions.GraftFunctions.register(spark)
    spark.sql("DROP TABLE IF EXISTS chk_dml_t")
    spark.sql(
      s"CREATE TABLE chk_dml_t USING `graft-tx` OPTIONS (path '$root')")
    try {
      spark.sql("ALTER TABLE chk_dml_t ADD CONSTRAINT price_pos " +
        "CHECK (price > 0)")
      // a row-level rewrite that would land violating rows fails
      intercept[Exception] {
        spark.sql("UPDATE chk_dml_t SET price = -price WHERE k <= 3")
      }
      assert(spark.table("chk_dml_t").filter("price <= 0").count() === 0L)
      spark.sql("UPDATE chk_dml_t SET price = price + 1 WHERE k <= 3")
      assert(spark.table("chk_dml_t").filter("price > 0").count() === 20L)
      // non-CHECK constraint kinds have no metadata to make them true
      val e = intercept[Exception] {
        spark.sql("ALTER TABLE chk_dml_t ADD CONSTRAINT pk " +
          "PRIMARY KEY (k)")
      }
      assert(e.getMessage.contains("CHECK") ||
        e.getMessage.toLowerCase.contains("constraint"))
    } finally spark.sql("DROP TABLE IF EXISTS chk_dml_t")
  }
}
