package graft

import org.apache.spark.sql.functions._
import graft.sources.Jdbc

/** Round-trip through an embedded Derby database — the DBInputFormat/
  * DBOutputFormat path with a real JDBC engine. */
class JdbcSpec extends SparkSpec {

  test("JDBC write + partitioned parallel read round-trips") {
    val url = s"jdbc:derby:${tmpDir()}/db;create=true"
    val src = Tables.nation(spark, sfDir)
      .select(col("n_nationkey").cast("long").as("id"), col("n_name"))
    Jdbc.write(src, url, "nation_t")
    val back = Jdbc.read(spark, url, "nation_t", "id", 0L, 25L, 4)
    assert(back.rdd.getNumPartitions === 4, "read must split into range partitions")
    assert(back.count() === 25)
    val names = back.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val expect = src.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(names === expect)
  }
}
