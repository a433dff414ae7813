package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Throwaway measurement main for round-17 optimization work. */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    Tables.lineitem(spark, sfDir).selectExpr("count(*)").collect()

    def time(label: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      println(f"[probe] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      spark.catalog.clearCache()
    }
    val nPart = spark.sessionState.conf.numShufflePartitions
    val tPct = 60

    def jpOrig(shIn: DataFrame): DataFrame = {
      val sh = shIn
      val df = sh.groupBy("s").agg(count(lit(1)).as("dfc"))
      val sz = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val pfx = sh.join(df, "s").join(sz, "doc_id")
        .withColumn("pos", row_number().over(
          Window.partitionBy("doc_id").orderBy(col("dfc"), col("s"))))
        .filter(col("pos") <= col("n") - expr(s"(n * $tPct + 99) div 100") + 1)
        .select("doc_id", "s")
      val cand = pfx.select(col("s"), col("doc_id").as("doc_a"))
        .join(pfx.select(col("s"), col("doc_id").as("doc_b")), "s")
        .filter(col("doc_a") < col("doc_b"))
        .select("doc_a", "doc_b").distinct()
      val inter = cand
        .join(sh.select(col("doc_id").as("doc_a"), col("s")), "doc_a")
        .join(sh.select(col("doc_id").as("doc_b"), col("s")), Seq("doc_b", "s"))
        .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("i"))
      inter
        .join(sz.select(col("doc_id").as("doc_a"), col("n").as("na")), "doc_a")
        .join(sz.select(col("doc_id").as("doc_b"), col("n").as("nb")), "doc_b")
        .filter(col("i") * 100 >= (col("na") + col("nb") - col("i")) * tPct)
        .select(col("doc_a"), col("doc_b"),
          expr("cast(i as double) / (na + nb - i)").as("jac"))
    }

    time("jp NEW (committed window version)")(
      graft.operators.Dedup.jaccardPrefix(spark, sfDir))
    time("jp ORIG")(jpOrig(graft.operators.Dedup.shingles(spark, sfDir)))
    val shP = graft.operators.Dedup.shingles(spark, sfDir).persist()
    time("jp ORIG + persist(sh)")(jpOrig(shP))
    shP.unpersist()
    val shP2 = Relational_pin(graft.operators.Dedup.shingles(spark, sfDir)).persist()
    time("jp ORIG + persist(pinned sh)")(jpOrig(shP2))
    shP2.unpersist()
    time("jp NEW again")(
      graft.operators.Dedup.jaccardPrefix(spark, sfDir))
    spark.stop()
  }
  private def Relational_pin(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sessionState.conf.numShufflePartitions)
}
