package graft

import org.apache.spark.sql.functions._

class MetricsSpec extends SparkSpec {

  private def await(cond: => Boolean, ms: Long = 10000): Boolean = {
    val deadline = System.currentTimeMillis() + ms
    while (!cond && System.currentTimeMillis() < deadline) Thread.sleep(50)
    cond
  }

  test("listener records per-query engine metrics like the reference's counters") {
    val l = Metrics.attach(spark)
    try {
      val n = Tables.lineitem(spark, sfDir)
        .groupBy("l_returnflag").agg(count(lit(1))).collect().length
      assert(n > 0)
      assert(await(l.stats.nonEmpty), "listener should observe the query")
      val s = l.stats.last
      assert(!s.failed)
      assert(s.rows > 0, s"engine row metrics should be collected: ${s.metrics}")
      // a groupBy shuffles: the exchange write metrics must be visible
      assert(s.metrics.keys.exists(_.contains("shuffle")), s.metrics.keys.toSeq)
    } finally Metrics.detach(spark, l)
  }

  test("history() exposes the job-history table") {
    val l = Metrics.attach(spark)
    try {
      Tables.nation(spark, sfDir).count()
      assert(await(l.stats.nonEmpty))
      val h = Metrics.history(spark, l)
      assert(h.columns.toSeq ===
        Seq("query", "duration_ms", "failed", "rows", "shuffle_bytes"))
      assert(h.count() >= 1)
    } finally Metrics.detach(spark, l)
  }
}
