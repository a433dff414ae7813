package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// temporary profiling main — not part of the library surface
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    val docs = Tables.documents(spark, sfDir)
    import graft.operators.TextOps

    time("scan only") {
      docs.select("doc_id", "text").write.mode("overwrite").format("noop").save()
    }
    time("scan only x2") {
      docs.select("doc_id", "text").write.mode("overwrite").format("noop").save()
    }
    time("lower only") {
      docs.select(col("doc_id"), lower(col("text"))).write.mode("overwrite").format("noop").save()
    }
    time("regex1 only") {
      docs.select(col("doc_id"), expr("regexp_replace(lower(text), '[^a-z0-9 ]', ' ')"))
        .write.mode("overwrite").format("noop").save()
    }
    time("norm full") {
      docs.select(col("doc_id"), expr(TextOps.normExpr))
        .write.mode("overwrite").format("noop").save()
    }
    time("norm full x2") {
      docs.select(col("doc_id"), expr(TextOps.normExpr))
        .write.mode("overwrite").format("noop").save()
    }
    println("n_partitions: " + docs.rdd.getNumPartitions)
    println("len stats: " + docs.selectExpr("min(length(text))", "max(length(text))", "sum(length(text))").collect()(0))
    spark.stop()
  }
}
