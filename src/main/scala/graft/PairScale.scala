package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Candidate-pair growth audit for the LSH dedup family: prints, for
  * each given data dir, the document count, the banded-signature
  * count, and the `minhashPairs` candidate-pair count — the
  * data-dependent quantity that drives the cost of every consumer
  * (dedupClusters, kcore, dedup_clusters_star) and the first thing to
  * check when a rung's wall scales worse than its input
  * (candidate-pair growth is quadratic in bucket occupancy, not
  * linear in rows: a corpus whose duplicates concentrate into few LSH
  * buckets pays pairs ~ sum over buckets of n_b^2).
  *
  *   sbt "runMain graft.PairScale /root/testdata/sf0.1 /tmp/sf1 /tmp/sf10"
  *
  * Output: one JSON line per dir with docs/bands/pairs and the
  * pairs-per-doc density, so rung-over-rung ratios read directly. */
object PairScale {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { dir =>
      val docs = Tables.documents(spark, dir).count()
      val bands = graft.operators.Dedup.minhashBands(spark, dir).count()
      val pairs = graft.operators.Dedup.minhashPairs(spark, dir).count()
      println(s"""{"dir":"$dir","docs":$docs,"bands":$bands,""" +
        s""""pairs":$pairs,"pairs_per_doc":${pairs.toDouble / docs}}""")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
