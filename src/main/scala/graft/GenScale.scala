package graft

import org.apache.spark.sql.SparkSession

/** Local data-scaling entry point: replicate a testdata rung by an
  * integer factor with key-space offsetting (DataGen.scaleUp), e.g.
  *
  *   sbt "runMain graft.GenScale /root/testdata/sf0.1 /tmp/sf1 10"
  *
  * Used to reproduce the driver's scaled rungs (sf1 = sf0.1 × 10)
  * for oracle memory/time validation without waiting on a round. */
object GenScale {
  def main(args: Array[String]): Unit = {
    val Array(src, dst, factor) = args.take(3)
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.sources.DataGen.scaleUp(spark, src, dst, factor.toInt)
    spark.stop()
  }
}
