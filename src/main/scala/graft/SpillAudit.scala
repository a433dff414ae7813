package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Spill/shuffle audit for the iterative graph/LSH family (guide §5):
  * runs the named queries and reports, per query, the peak per-stage
  * shuffle read/write bytes and memory/disk spill observed via a
  * SparkListener — the committed evidence that the iteration state
  * stays bounded (or the pointer at the stage that doesn't).
  *
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.SpillAudit <sfDir> [q...]"
  */
object SpillAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q_hits", "q_dedup_clusters", "q_dedup_clusters_star",
        "q_kcore", "q_communities", "q_pagerank", "q_triangles",
        "q_dedup_canonical")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // per-stage accumulation since the last mark()
    val lock = new Object
    var stages = Vector.empty[(Int, Long, Long, Long, Long)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val m = s.stageInfo.taskMetrics
        if (m != null) lock.synchronized {
          stages = stages :+ ((s.stageInfo.stageId,
            m.shuffleReadMetrics.totalBytesRead,
            m.shuffleWriteMetrics.bytesWritten,
            m.memoryBytesSpilled, m.diskBytesSpilled))
        }
      }
    })
    spark.range(1000000L).selectExpr("sum(id)").collect()
    Tables.lineitem(spark, sfDir).selectExpr("count(*)").collect()
    println("| query | sec | stages | max shuffle read | max shuffle write " +
      "| mem spill | disk spill |")
    println("|---|---|---|---|---|---|---|")
    names.foreach { n =>
      lock.synchronized { stages = Vector.empty }
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      val sec = (System.nanoTime() - t0) / 1e9
      // listener events post asynchronously; give the bus a beat
      Thread.sleep(300)
      val ss = lock.synchronized(stages)
      def mb(v: Long) = f"${v / 1024.0 / 1024.0}%.1f MB"
      println(f"| $n | $sec%.2f | ${ss.size} | " +
        s"${mb(ss.map(_._2).maxOption.getOrElse(0L))} | " +
        s"${mb(ss.map(_._3).maxOption.getOrElse(0L))} | " +
        s"${mb(ss.map(_._4).sum)} | ${mb(ss.map(_._5).sum)} |")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
