package graft

/** Client-JVM entry point for the Spark Connect smoke test
  * (ConnectSmokeSpec): runs in a separate process whose classpath has
  * ONLY the connect client jar + scala-library + graft classes — no
  * classic Spark — so every API the queries touch is proven to resolve
  * against the Connect implementation of the unified Spark 4 surface.
  *
  * Prints one `CONNECT_OK <name> <rows>` line per query; any
  * incompatibility (API absent client-side, server rejection) prints
  * `CONNECT_FAIL <name> <error>` and exits non-zero at the end.
  */
object ConnectSmokeMain {
  def main(args: Array[String]): Unit = {
    val url = args(0)
    val sfDir = args(1)
    val names = args(2).split(",").toSeq
    // Build the Connect session via its own companion, reflectively:
    // the client class is absent from the library's compile classpath
    // (it lives in the client-only JVM this main runs in), and the
    // unified org.apache.spark.sql.SparkSession builder dispatches to
    // classic unless a full classic Spark is present.
    val companion = Class.forName("org.apache.spark.sql.connect.SparkSession$")
      .getField("MODULE$").get(null)
    val b = companion.getClass.getMethod("builder").invoke(companion)
    val b2 = b.getClass.getMethod("remote", classOf[String]).invoke(b, url)
    val spark = b2.getClass.getMethod("getOrCreate").invoke(b2)
      .asInstanceOf[org.apache.spark.sql.SparkSession]
    var failed = false
    names.foreach { n =>
      try {
        // "typed:media" exercises the typed Dataset path (encoders +
        // mapPartitions lambda shipped to the server) instead of a
        // SparkEntry query
        // "kernel:*" queries exercise graft's native Catalyst
        // expressions server-side — they resolve only when the server
        // session was built with
        // spark.sql.extensions=graft.functions.GraftExtensions; the
        // deterministic checksum after the row count lets the spec
        // assert value equality against the classic session
        if (n == "kernel:simhash") {
          val r = spark.read.parquet(s"$sfDir/documents.parquet")
            .selectExpr(
              "sum(cast(conv(simhash32(split(lower(text), ' ')), 2, 10) as bigint)) AS s",
              "count(*) AS n").collect()(0)
          println(s"CONNECT_OK $n 1 ${r.getLong(0)}:${r.getLong(1)}")
        } else if (n == "kernel:kmv") {
          val r = spark.read.parquet(s"$sfDir/documents.parquet")
            .selectExpr(
              "cast(floor(kmv_uniq(md5(cast(text as binary)), 256).est) as bigint) AS u")
            .collect()(0)
          println(s"CONNECT_OK $n 1 ${r.getLong(0)}")
        } else if (n == "stream:txrepl") {
          // end-to-end lakehouse loop from the Connect client: batch
          // write creates a graft-tx table (server-side V1 relation),
          // the DSv2 MicroBatchStream tails its change feed, the DSv2
          // StreamingWrite applies it to a second table exactly-once,
          // and a batch read verifies convergence. None of this is
          // possible for a V1 Source/Sink under Connect — it is the
          // round-8 migration's proof surface.
          val base = s"${System.getProperty("java.io.tmpdir")}/" +
            s"graft-connect-tx-${java.util.UUID.randomUUID()}"
          val (src, dst, ckpt) = (s"$base/src", s"$base/dst", s"$base/ckpt")
          spark.range(3).selectExpr("id AS k", "cast(id * 1.5 AS double) AS v")
            .write.format("graft-tx").mode("append").save(src)
          val q = spark.readStream.format("graft-tx").load(src)
            .selectExpr("k", "op", "v", "commit_version AS seq")
            .writeStream.format("graft-tx").option("path", dst)
            .option("keys", "k").option("checkpointLocation", ckpt)
            .outputMode("append").start()
          try q.processAllAvailable() finally q.stop()
          val r = spark.read.format("graft-tx").load(dst)
            .selectExpr("count(*) AS n", "sum(k) AS s").collect()(0)
          println(s"CONNECT_OK $n ${r.getLong(0)} ${r.getLong(1)}")
        } else {
          val rows =
            if (n == "typed:media")
              graft.operators.Media.byteHistogram(spark,
                graft.operators.Media.mediaTable(spark, sfDir).limit(20))
                .collect().length
            else SparkEntry.queries(n)(spark, sfDir).collect().length
          println(s"CONNECT_OK $n $rows")
        }
      } catch {
        case e: Throwable =>
          failed = true
          println(s"CONNECT_FAIL $n ${e.toString.replaceAll("[\n\r]", " ").take(300)}")
      }
    }
    spark.stop()
    if (failed) sys.exit(1)
  }
}
