package graft

import org.apache.spark.sql.SparkSession

/** Plan-inspection tool: prints `explain("formatted")` for the named
  * queries (or a default headline set) — the review loop for keeping
  * 100 TB plan shapes (pushdown, broadcast, single-shuffle aggs)
  * honest. Usage: runMain graft.PlanDump [sfDir] [query...]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q1_agg", "q_join_star", "q_join_bigbig", "q_dedup_minhash",
        "q_dedup_simhash", "q_ann_lsh", "q_ann_lsh_native", "q_sketch_kmv",
        "q_total_order_bucket", "q_wordcount")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n===== $n =====")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
