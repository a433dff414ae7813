package graft

import graft.sources.TxTable

/** `MERGE INTO t ... WITH SCHEMA EVOLUTION`: Spark 4's
  * ResolveMergeIntoSchemaEvolution diffs source vs target schema and
  * lands the missing columns through the catalog's `alterTable`
  * (graft's atomic ADD COLUMNS commit) before rewriting the merge —
  * so a wider source auto-evolves the graft-tx table: pre-merge rows
  * read the new column as NULL, merged rows carry source values. */
class MergeEvolveSpec extends SparkSpec {

  private def mkTable(name: String, n: Long = 100L): String = {
    import spark.implicits._
    val root = tmpDir() + s"/$name"
    val df = (1L to n).map(i => (i, i % 7, s"s$i")).toDF("k", "grp", "s")
    TxTable.append(df, root, statsCols = Seq("k", "grp"))
    spark.sql(s"DROP TABLE IF EXISTS $name")
    spark.sql(s"CREATE TABLE $name USING `graft-tx` OPTIONS (path '$root')")
    graft.functions.GraftFunctions.register(spark)
    root
  }

  test("MERGE WITH SCHEMA EVOLUTION adds the source-only column") {
    import spark.implicits._
    mkTable("mev_t", 100L)
    Seq((50L, 999L, "upd", 1.5), (200L, 5L, "new", 2.5))
      .toDF("k", "grp", "s", "score").createOrReplaceTempView("mev_src")
    spark.sql(
      """MERGE WITH SCHEMA EVOLUTION INTO mev_t t USING mev_src s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val t = spark.table("mev_t")
    assert(t.columns.toSeq === Seq("k", "grp", "s", "score"))
    assert(t.count() === 101L)
    assert(t.filter("k = 50 AND score = 1.5 AND grp = 999").count() === 1L)
    assert(t.filter("k = 200 AND score = 2.5").count() === 1L)
    // pre-merge rows read the evolved column as NULL
    assert(t.filter("score IS NULL").count() === 99L)
  }

  test("evolution under merge-on-read DML lands the same state") {
    import spark.implicits._
    val root = mkTable("mev_mor", 100L)
    Seq((10L, 1L, "upd", 7.5), (300L, 2L, "new", 8.5))
      .toDF("k", "grp", "s", "score").createOrReplaceTempView("mev_msrc")
    spark.conf.set("spark.graft.dml.positional", "true")
    try {
      spark.sql(
        """MERGE WITH SCHEMA EVOLUTION INTO mev_mor t
          |USING mev_msrc s ON t.k = s.k
          |WHEN MATCHED THEN UPDATE SET *
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    } finally spark.conf.unset("spark.graft.dml.positional")
    val t = spark.table("mev_mor")
    assert(t.columns.toSeq === Seq("k", "grp", "s", "score"))
    assert(t.count() === 101L)
    assert(t.filter("k = 10 AND score = 7.5 AND grp = 1").count() === 1L)
    assert(t.filter("k = 300 AND score = 8.5").count() === 1L)
    assert(t.filter("score IS NULL").count() === 99L)
    // the MoR path wrote sidecars/new dirs, never rewrote v1's file
    val v1 = TxTable.read(spark, root, version = 1)
    assert(v1.columns.toSeq === Seq("k", "grp", "s"))
    assert(v1.count() === 100L)
  }

  test("pre-evolution versions keep their own schema under time travel") {
    import spark.implicits._
    mkTable("mev_tt", 50L)
    Seq((1L, 0L, "x", 0.0)).toDF("k", "grp", "s", "score")
      .createOrReplaceTempView("mev_tsrc")
    spark.sql(
      """MERGE WITH SCHEMA EVOLUTION INTO mev_tt t USING mev_tsrc s
        |ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val old = spark.sql("SELECT * FROM mev_tt VERSION AS OF 1")
    assert(old.columns.toSeq === Seq("k", "grp", "s"))
    assert(old.count() === 50L)
    assert(spark.table("mev_tt").columns.toSeq
      === Seq("k", "grp", "s", "score"))
  }

  test("a type-conflicting source column fails loudly, not silently") {
    import spark.implicits._
    mkTable("mev_bad", 20L)
    // grp is BIGINT on the target; a STRING source grp cannot evolve
    Seq((5L, "oops", "upd", 1.0))
      .toDF("k", "grp", "s", "score").createOrReplaceTempView("mev_bsrc")
    intercept[Exception] {
      spark.sql(
        """MERGE WITH SCHEMA EVOLUTION INTO mev_bad t USING mev_bsrc s
          |ON t.k = s.k
          |WHEN MATCHED THEN UPDATE SET *
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    }
    // and the failed statement must not have half-applied anything
    val t = spark.table("mev_bad")
    assert(t.columns.toSeq.take(3) === Seq("k", "grp", "s"))
    assert(t.count() === 20L)
  }

  test("without WITH SCHEMA EVOLUTION the schema does not move") {
    import spark.implicits._
    mkTable("mev_off", 20L)
    Seq((5L, 111L, "upd", 1.0))
      .toDF("k", "grp", "s", "score").createOrReplaceTempView("mev_osrc")
    // stock Spark: star actions align by TARGET column name — the
    // extra source column is simply not assigned; no ALTER happens
    spark.sql(
      """MERGE INTO mev_off t USING mev_osrc s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val t = spark.table("mev_off")
    assert(t.columns.toSeq === Seq("k", "grp", "s"))
    assert(t.filter("k = 5 AND grp = 111").count() === 1L)
  }
}
