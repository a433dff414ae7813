package graft

/** Spark Connect smoke surface (SURVEY §7.15): the library's query API
  * is Spark-4-unified (abstract SparkSession/Dataset/Column), so a
  * Connect client should be able to drive it against a Connect server
  * with no code changes. This suite starts the in-process gRPC service
  * on the shared test context, then launches a REAL client JVM whose
  * classpath contains only the connect client jar, scala-library, and
  * the graft classes — classic Spark is absent, so nothing can
  * accidentally fall back to the local path.
  *
  * The typed Dataset path (encoders + a mapPartitions lambda shipped
  * to the server) is exercised too, via Media.byteHistogram.
  *
  * Graft kernel functions (kmv_uniq, simhash32, …) resolve over
  * Connect because the test context carries
  * spark.sql.extensions=graft.functions.GraftExtensions in its
  * SparkConf (SparkSpec) — a Connect session is fresh server-side, so
  * the extensions conf at SERVER launch is the only registration that
  * reaches it; the kernel:* queries below prove it with value-level
  * checks against the classic session.
  *
  * Known incompatibilities (documented, not smoke-tested): operators
  * that drop to RDDs (Pipe, connected components' rebase, SeqFile RDD
  * reader, DistCopy) and the native LshTopKJoin (its TVF face needs
  * the server-side catalog views its `apply` registers) need the
  * classic session.
  */
class ConnectSmokeSpec extends SparkSpec {

  // standard-function queries: aggregation, star join, window family,
  // rollup, text explode — plus the graft kernel expressions, which
  // exercise the server-side extensions injection
  private val representative =
    Seq("q1_agg", "q_join_star", "q_window_funcs", "q_rollup", "q_wordcount",
      "typed:media", // typed Dataset path: encoders + mapPartitions lambda
      "kernel:simhash", "kernel:kmv", // native kernels via server extensions
      "stream:txrepl") // DSv2 graft-tx source->sink CDC loop (r8)

  test("representative queries run unmodified through a Connect client JVM") {
    import org.apache.spark.sql.connect.service.SparkConnectService
    SparkConnectService.start(spark.sparkContext)
    try {
      val port = spark.sparkContext.getConf
        .getInt("spark.connect.grpc.binding.port", 15002)

      val sparkJars = new java.io.File("/opt/spark/jars").listFiles()
      def jar(prefix: String): String = sparkJars
        .map(_.getPath).filter(_.matches(s".*/$prefix[-_0-9.]*\\.jar"))
        .sorted.headOption.getOrElse(fail(s"no $prefix jar in /opt/spark/jars"))
      val clientCp = Seq(
        "target/scala-2.13/test-classes",
        "target/scala-2.13/classes",
        "/opt/spark/jars/connect-repl/spark-connect-client-jvm_2.13-4.1.2.jar",
        jar("scala-library"), jar("scala-reflect"), jar("slf4j-api"),
        jar("spark-common-utils"), jar("spark-common-utils-java"),
        jar("log4j-api"), jar("log4j-core"),
        jar("log4j-slf4j2-impl"), jar("spark-tags"),
        // spark-core only satisfies reflective signature scans (e.g.
        // Builder methods typed over SparkConf); it contains no sql
        // classes, so the client's own sql/catalyst subset stays active
        jar("spark-core"),
        jar("json4s-ast"), jar("json4s-core"), jar("json4s-jackson"),
        jar("json4s-jackson-core"), jar("json4s-scalap"),
        jar("jackson-core"), jar("jackson-databind"),
        jar("jackson-annotations"), jar("jackson-module-scala"),
        jar("paranamer"), // jackson-module-scala ctor-name reflection
        // sql-api (abstract types the library compiles against) comes
        // AFTER the client jar so the client's bundled copies win ties
        jar("spark-sql-api"), jar("spark-unsafe"), jar("antlr4-runtime"),
        jar("icu4j"), jar("kryo-shaded"),
        jar("xbean-asm9-shaded")) // client-side closure cleaner for typed ops
        .mkString(":")

      val javaBin = System.getProperty("java.home") + "/bin/java"
      // the client's shaded Arrow allocator needs the same JDK-17
      // module opens spark-submit injects
      val addOpens = Seq("java.base/java.nio", "java.base/java.lang",
        "java.base/java.util", "java.base/sun.nio.ch")
        .flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
      val cmd = Seq(javaBin) ++ addOpens ++ Seq(
        "-Dio.netty.tryReflectionSetAccessible=true",
        "-cp", clientCp, "-Xmx2g", "graft.ConnectSmokeMain",
        s"sc://localhost:$port", sfDir, representative.mkString(","))
      val pb = new ProcessBuilder(cmd: _*)
      pb.redirectErrorStream(true)
      val proc = pb.start()
      val out = new String(proc.getInputStream.readAllBytes(), "UTF-8")
      val rc = proc.waitFor()
      assert(rc === 0, s"client JVM failed:\n$out")
      representative.foreach { n =>
        assert(out.contains(s"CONNECT_OK $n"), s"$n missing from:\n$out")
      }
      // row counts over Connect equal the classic session's
      // the streaming loop reports (rows, sum) of the replicated
      // table: 3 seed rows, sum(k) = 0+1+2
      val repl = out.linesIterator
        .find(_.startsWith("CONNECT_OK stream:txrepl ")).get.split(" ")
      assert(repl(2) === "3" && repl(3) === "3",
        "Connect-driven CDC replication must converge to the source")
      representative.filterNot(n =>
        n.startsWith("typed:") || n.startsWith("kernel:") ||
          n.startsWith("stream:")).foreach { n =>
        val classic = SparkEntry.queries(n)(spark, sfDir).count()
        val connectRows = out.linesIterator
          .find(_.startsWith(s"CONNECT_OK $n "))
          .map(_.split(" ")(2).toLong).get
        assert(connectRows === classic, s"$n row count differs over Connect")
      }
      // kernel results over Connect equal the classic session's, value
      // for value (both deterministic expressions)
      def connectExtra(n: String): String = out.linesIterator
        .find(_.startsWith(s"CONNECT_OK $n "))
        .map(_.split(" ")(3)).get
      graft.functions.GraftFunctions.register(spark)
      val classicSim = Tables.documents(spark, sfDir)
        .selectExpr("sum(cast(conv(simhash32(split(lower(text), ' ')), 2, 10) as bigint)) AS s",
          "count(*) AS n").collect()(0)
      assert(connectExtra("kernel:simhash") ===
        s"${classicSim.getLong(0)}:${classicSim.getLong(1)}",
        "simhash32 over Connect must match classic bit-for-bit")
      val classicKmv = Tables.documents(spark, sfDir)
        .selectExpr("cast(floor(kmv_uniq(md5(cast(text as binary)), 256).est) as bigint) AS u")
        .collect()(0).getLong(0)
      assert(connectExtra("kernel:kmv") === classicKmv.toString,
        "kmv_uniq over Connect must match classic bit-for-bit")
    } finally {
      org.apache.spark.sql.connect.service.SparkConnectService.stop(
        scala.None, scala.None)
    }
  }
}
