package graft

import org.apache.spark.sql.functions._
import graft.sources.Formats

class FormatsSpec extends SparkSpec {

  test("ORC round-trip with pushdown") {
    val dir = tmpDir() + "/orc"
    Formats.writeOrc(Tables.lineitem(spark, sfDir), dir)
    val back = Formats.readOrc(spark, dir)
      .filter(col("l_quantity") > 30).select("l_orderkey", "l_quantity")
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,30.0)]"), plan)
    assert(back.count() ===
      Tables.lineitem(spark, sfDir).filter(col("l_quantity") > 30).count())
  }

  test("permissive CSV parks malformed rows in the corrupt column") {
    val dir = tmpDir()
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, "x.csv"),
      "1,alpha\n2,beta\nnot-a-number,gamma\n3,delta\n")
    // Spark disallows querying only the corrupt column off the raw
    // scan — cache the parsed result first (per the error's guidance)
    val df = Formats.readCsvPermissive(spark, dir, "id INT, name STRING").cache()
    assert(df.count() === 4, "no row may abort the job")
    assert(df.filter(col("_corrupt").isNotNull).count() === 1)
    assert(df.filter(col("_corrupt").isNull).count() === 3)
  }

  test("ignoreCorruptFiles skips garbage files instead of failing") {
    val dir = tmpDir() + "/pq"
    Tables.nation(spark, sfDir).write.parquet(dir)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "part-junk.parquet"), "this is not parquet")
    val n = Formats.readParquetResilient(spark, dir).count()
    assert(n === 25)
    // the option is read-scoped: the session must still fail fast
    assert(spark.conf.getOption("spark.sql.files.ignoreCorruptFiles").isEmpty
      || spark.conf.get("spark.sql.files.ignoreCorruptFiles") == "false")
    intercept[org.apache.spark.SparkException] {
      spark.read.parquet(dir).count()
    }
  }
}
