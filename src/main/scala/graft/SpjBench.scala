package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.TxTable

/** SPJ-face scan-throughput benchmark (VERDICT r10 §4): the SAME
  * co-clustered big-big join executed two ways over the same
  * graft-tx tables —
  *   spj : storage-partitioned face, zero Exchange, DSv2 reader
  *   v1  : plain relation face, Spark's vectorized parquet scan +
  *         a full shuffle join
  * Table build time is excluded; each variant is fully materialized
  * through the noop sink, best of `tries`. Prints one JSON line.
  *
  *   SPARK_GRAFT_SF_DIR=/tmp/sf1 sbt "runMain graft.SpjBench"
  */
object SpjBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val tries = sys.env.getOrElse("SPARK_GRAFT_TRIES", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val rootO = Scratch.freshRoot(spark, "graft-spjbench-o", sfDir)
    val rootL = Scratch.freshRoot(spark, "graft-spjbench-l", sfDir)
    val o = Tables.orders(spark, sfDir).select(col("o_orderkey"),
      col("o_custkey"), (col("o_orderkey") % 64).as("b"))
    val l = Tables.lineitem(spark, sfDir).select(col("l_orderkey"),
      col("l_quantity").cast("double").as("qty"),
      (col("l_orderkey") % 64).as("b"))
    TxTable.appendPartitioned(o, rootO, "b", statsCols = Seq("o_orderkey"))
    TxTable.appendPartitioned(l, rootL, "b", statsCols = Seq("l_orderkey"))

    def spj(root: String): DataFrame = spark.read.format("graft-tx")
      .option("partitionCol", "b").load(root)
    def v1(root: String): DataFrame =
      spark.read.format("graft-tx").load(root)

    def joined(lo: DataFrame, ll: DataFrame): DataFrame =
      lo.as("o").join(ll.as("l"), col("o.b") === col("l.b") &&
          col("o.o_orderkey") === col("l.l_orderkey"))
        .groupBy(col("o.b"))
        .agg(count(lit(1)).as("cnt"), sum(col("qty")).as("s"))

    def time(df: => DataFrame): Double = {
      val ts = (1 to tries).map { _ =>
        val t0 = System.nanoTime()
        df.write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      System.err.println(s"[spjbench] tries: ${ts.map(t => f"$t%.2f")}")
      ts.min
    }

    // sanity: identical results, and the SPJ plan really is
    // exchange-free
    val spjPlan = joined(spj(rootO), spj(rootL))
      .queryExecution.executedPlan.toString
    require(!spjPlan.contains("Exchange"),
      s"SPJ plan has an Exchange:\n$spjPlan")
    val a = joined(spj(rootO), spj(rootL)).collect()
      .map(_.toSeq).sortBy(_.head.toString)
    val b = joined(v1(rootO), v1(rootL)).collect()
      .map(_.toSeq).sortBy(_.head.toString)
    require(a.sameElements(b), "SPJ and V1 results differ")

    val tSpj = time(joined(spj(rootO), spj(rootL)))
    val tV1 = time(joined(v1(rootO), v1(rootL)))
    // pure scan: a GLOBAL sum is map-side partial + a 1-row shuffle
    // on both faces, so this isolates raw reader throughput (a
    // grouped agg would hide a full shuffle in the V1 leg only)
    val tScanSpj = time(spj(rootL).agg(sum(col("qty")).as("s")))
    val tScanV1 = time(v1(rootL).agg(sum(col("qty")).as("s")))
    println(s"""{"metric":"spj_vs_v1","sf":"$sfDir",""" +
      s""""join_spj_sec":$tSpj,"join_v1_shuffle_sec":$tV1,""" +
      s""""scan_spj_sec":$tScanSpj,"scan_v1_sec":$tScanV1}""")
    spark.stop()
  }
}
