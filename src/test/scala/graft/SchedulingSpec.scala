package graft

class SchedulingSpec extends SparkSpec {

  test("allocation file is valid and pools route jobs thread-locally") {
    val path = Scheduling.writeAllocationFile(
      Seq(Scheduling.Pool("etl", 2, 4), Scheduling.Pool("adhoc", 1, 0)), tmpDir())
    val xml = scala.xml.XML.loadFile(path)
    assert((xml \ "pool").map(p => (p \ "@name").text) === Seq("etl", "adhoc"))
    assert(((xml \ "pool").head \ "weight").text === "2")

    val n = Scheduling.runInPool(spark, "etl") {
      assert(spark.sparkContext.getLocalProperty("spark.scheduler.pool") === "etl")
      Tables.nation(spark, sfDir).count()
    }
    assert(n === 25)
    assert(spark.sparkContext.getLocalProperty("spark.scheduler.pool") === null)
  }

  test("concurrent threads keep independent pools") {
    val results = new java.util.concurrent.ConcurrentHashMap[String, String]()
    val threads = Seq("etl", "adhoc").map { pool =>
      new Thread(() => Scheduling.runInPool(spark, pool) {
        Tables.region(spark, sfDir).count()
        results.put(pool,
          String.valueOf(spark.sparkContext.getLocalProperty("spark.scheduler.pool")))
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join(30000))
    assert(results.get("etl") === "etl")
    assert(results.get("adhoc") === "adhoc")
  }
}
