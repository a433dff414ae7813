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

  test("capacity cap: a pool never runs more than maxConcurrent jobs") {
    val sched = new Scheduling.CapacityScheduler(spark, Seq(
      Scheduling.CapacityPool(Scheduling.Pool("etl", 2, 2), maxConcurrent = 2)))
    val observedMax = new java.util.concurrent.atomic.AtomicInteger(0)
    val current = new java.util.concurrent.atomic.AtomicInteger(0)
    val threads = (1 to 6).map { _ =>
      new Thread(() => sched.submit("etl", "u1") {
        val c = current.incrementAndGet()
        observedMax.updateAndGet(m => math.max(m, c))
        Thread.sleep(30)
        Tables.region(spark, sfDir).count()
        current.decrementAndGet()
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join(60000))
    assert(observedMax.get() <= 2,
      s"cap=2 but ${observedMax.get()} jobs ran concurrently")
    assert(sched.runningIn("etl") === 0)
  }

  test("user limit: under contention one user cannot hold the whole queue") {
    // A lone user may fill the queue (Hadoop semantics: the limit only
    // binds under contention). The guarantee: once a second user is
    // WAITING, the hog is not admitted past 50% of cap — so the small
    // user's job is the very next admission after the hog's initial
    // pair, ahead of the hog's 2 queued jobs.
    val sched = new Scheduling.CapacityScheduler(spark, Seq(
      Scheduling.CapacityPool(Scheduling.Pool("etl", 2, 2),
        maxConcurrent = 2, userLimitPct = 50)))
    val order = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val firstIn = new java.util.concurrent.CountDownLatch(2)
    val hogs = (1 to 4).map { i =>
      new Thread(() => sched.submit("etl", "hog") {
        // distinct durations so two slots never free simultaneously
        // (a double-release admits hog+small in one wave, any order)
        order.add(s"hog-$i"); firstIn.countDown(); Thread.sleep(100L + i * 60L)
      })
    }
    hogs.foreach(_.start())
    // wait until the hog owns both slots, then contend
    assert(firstIn.await(30, java.util.concurrent.TimeUnit.SECONDS))
    val small = new Thread(() => sched.submit("etl", "small") {
      order.add("small")
    })
    small.start()
    (hogs :+ small).foreach(_.join(60000))
    val seq = order.toArray.map(_.toString).toSeq
    assert(seq.indexOf("small") <= 2,
      s"small user must be admitted before the hog's queued jobs: $seq")
  }

  test("an over-submitting user cannot starve another pool's minShare") {
    val sched = new Scheduling.CapacityScheduler(spark, Seq(
      Scheduling.CapacityPool(Scheduling.Pool("etl", 1, 0), maxConcurrent = 2),
      Scheduling.CapacityPool(Scheduling.Pool("adhoc", 1, 2), maxConcurrent = 2)))
    val order = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val floodGate = new java.util.concurrent.CountDownLatch(1)
    // a tenant floods etl far past its cap; excess jobs queue OUTSIDE
    // Spark and hold nothing
    val flood = (1 to 8).map { i =>
      new Thread(() => sched.submit("etl", "hog") {
        order.add(s"etl-$i"); floodGate.countDown(); Thread.sleep(40)
      })
    }
    flood.foreach(_.start())
    floodGate.await(30, java.util.concurrent.TimeUnit.SECONDS)
    // the minShare pool admits immediately — it never waits behind the
    // flooded pool's queue
    val t0 = System.nanoTime()
    val adhoc = new Thread(() => sched.submit("adhoc", "analyst") {
      order.add("adhoc"); Tables.region(spark, sfDir).count()
    })
    adhoc.start(); adhoc.join(60000)
    val waitedMs = (System.nanoTime() - t0) / 1e6
    flood.foreach(_.join(60000))
    assert(order.contains("adhoc"))
    val pos = order.toArray.indexOf("adhoc": Any)
    assert(pos < order.size - 2,
      s"adhoc must not wait for the flood to drain (admitted at $pos of ${order.size})")
    assert(waitedMs < 5000, s"adhoc waited ${waitedMs}ms behind a flooded pool")
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
