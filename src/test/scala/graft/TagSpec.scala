package graft

import org.apache.spark.sql.functions._
import graft.sources.TxTable

/** Named snapshot refs (tags): immutable name → version pins stored
  * under `_commits/_tags/`, resolved by every `versionAsOf` face
  * (reader option, SQL `VERSION AS OF 'name'`, catalog time travel),
  * surfaced as `CALL system.{tag,tags,drop_tag}`, and PROTECTED from
  * vacuum until dropped. */
class TagSpec extends SparkSpec {

  private def mk(n: Int = 100): String = {
    import spark.implicits._
    val root = tmpDir() + "/tags"
    TxTable.append((1 to n).map(i => (i.toLong, s"a$i")).toDF("k", "s"),
      root, statsCols = Seq("k"))
    root
  }

  test("tag / tags / deleteTag round trip; immutability; validation") {
    import spark.implicits._
    val root = mk()
    TxTable.append(Seq((1000L, "x")).toDF("k", "s"), root) // v2
    assert(TxTable.tag(spark, root, "base", 1) === 1)
    assert(TxTable.tag(spark, root, "head") === 2) // default = latest
    assert(TxTable.tags(spark, root) === Seq("base" -> 1, "head" -> 2))
    // tags are immutable: re-pinning an existing name fails
    intercept[IllegalStateException] { TxTable.tag(spark, root, "base", 2) }
    // a tag must point at a committed version
    intercept[IllegalArgumentException] { TxTable.tag(spark, root, "v9", 9) }
    // the name grammar keeps refs unambiguous with integer versions
    intercept[IllegalArgumentException] { TxTable.tag(spark, root, "7") }
    intercept[IllegalArgumentException] { TxTable.tag(spark, root, "a/b") }
    TxTable.deleteTag(spark, root, "head")
    assert(TxTable.tags(spark, root) === Seq("base" -> 1))
    intercept[IllegalArgumentException] {
      TxTable.deleteTag(spark, root, "head")
    }
  }

  test("versionAsOf resolves a tag on the reader-option face") {
    import spark.implicits._
    val root = mk(10)
    TxTable.tag(spark, root, "small")
    TxTable.append((11 to 20).map(i => (i.toLong, s"a$i")).toDF("k", "s"),
      root)
    val pinned = spark.read.format("graft-tx")
      .option("versionAsOf", "small").load(root)
    assert(pinned.count() === 10L)
    assert(spark.read.format("graft-tx").load(root).count() === 20L)
    // missing tag fails loudly
    val e = intercept[Exception] {
      spark.read.format("graft-tx")
        .option("versionAsOf", "nope").load(root).count()
    }
    assert(e.getMessage.contains("no tag"))
  }

  test("SQL VERSION AS OF 'name' and CALL tag/tags/drop_tag") {
    import spark.implicits._
    val root = mk(10)
    graft.functions.GraftFunctions.register(spark)
    spark.sql("DROP TABLE IF EXISTS tag_sql_t")
    spark.sql(s"CREATE TABLE tag_sql_t USING `graft-tx` " +
      s"OPTIONS (path '$root')")
    val v = spark.sql(
      "CALL spark_catalog.system.tag('tag_sql_t', 'audit')").collect()
    assert(v.map(_.getInt(0)).toSeq === Seq(1))
    spark.sql("INSERT INTO tag_sql_t VALUES (99, 'new')")
    assert(spark.sql(
      "SELECT count(*) FROM tag_sql_t VERSION AS OF 'audit'")
      .collect()(0).getLong(0) === 10L)
    assert(spark.table("tag_sql_t").count() === 11L)
    val listed = spark.sql(
      "CALL spark_catalog.system.tags('tag_sql_t')").collect()
    assert(listed.map(r => (r.getString(0), r.getInt(1))).toSeq
      === Seq(("audit", 1)))
    spark.sql("CALL spark_catalog.system.drop_tag('tag_sql_t', 'audit')")
    assert(spark.sql(
      "CALL spark_catalog.system.tags('tag_sql_t')").collect().isEmpty)
    spark.sql("DROP TABLE tag_sql_t")
  }

  test("vacuum keeps tagged versions; drop_tag releases them") {
    import spark.implicits._
    val root = tmpDir() + "/tagvac"
    TxTable.append((1 to 10).map(i => (i.toLong, "old")).toDF("k", "s"),
      root) // v1
    TxTable.tag(spark, root, "keepme", 1)
    // v2 OVERWRITES — v1's dirs leave the live snapshot entirely
    spark.range(1).select(lit(100L).as("k"), lit("new").as("s"))
      .write.format("graft-tx").mode("overwrite").save(root)
    // dry run proposes nothing from the tagged version
    val dry = TxTable.vacuumDryRun(spark, root, retainLast = 1)
    assert(!dry.exists(_.contains("v00000001")),
      s"dry run must not propose the tagged commit: $dry")
    TxTable.vacuum(spark, root, retainLast = 1)
    val tagged = TxTable.read(spark, root, version = 1)
    assert(tagged.count() === 10L)
    assert(tagged.filter(col("s") === "old").count() === 10L)
    assert(TxTable.read(spark, root).count() === 1L)
    // dropping the tag releases the version to the next vacuum
    TxTable.deleteTag(spark, root, "keepme")
    val dry2 = TxTable.vacuumDryRun(spark, root, retainLast = 1)
    assert(dry2.exists(_.contains("v00000001")))
    TxTable.vacuum(spark, root, retainLast = 1)
    intercept[Exception] { TxTable.read(spark, root, version = 1).count() }
  }

  test("change feed, streaming start and CALL restore accept tag refs") {
    import spark.implicits._
    val root = mk(10) // v1: k 1..10
    TxTable.append(Seq((100L, "v2")).toDF("k", "s"), root) // v2
    TxTable.tag(spark, root, "cut") // pins v2
    TxTable.append(Seq((200L, "v3")).toDF("k", "s"), root) // v3
    // batch change feed FROM the tag: versions 2..3 only
    val feed = spark.read.format("graft-tx")
      .option("readChangeFeed", "true")
      .option("startingVersion", "cut").load(root)
    val keys = feed.select("k").as[Long].collect().toSet
    assert(keys === Set(100L, 200L))
    // restore BY REF: CALL system.restore('t', -1, 'cut') → v2 content
    graft.functions.GraftFunctions.register(spark)
    spark.sql("DROP TABLE IF EXISTS tag_restore_t")
    spark.sql(s"CREATE TABLE tag_restore_t USING `graft-tx` " +
      s"OPTIONS (path '$root')")
    spark.sql(
      "CALL spark_catalog.system.restore('tag_restore_t', -1, 'cut')")
    val t = spark.table("tag_restore_t")
    assert(t.count() === 11L)
    assert(t.filter("k = 200").count() === 0L)
    spark.sql("DROP TABLE tag_restore_t")
  }
}
