package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Multi-tenant scheduling — the Spark mapping of the reference's fair
  * and capacity schedulers (ref: src/contrib/fairscheduler/.../
  * FairScheduler.java:1, src/contrib/capacity-scheduler): Spark's FAIR
  * scheduler with weighted pools is the same model (pools with
  * weight/minShare ≈ queues with guaranteed capacity).
  *
  * Wiring: build the session with `spark.scheduler.mode=FAIR` and
  * `spark.scheduler.allocation.file=<writeAllocationFile(...)>`; route
  * each job to its pool with `runInPool`. Pool assignment is a
  * thread-local property, so concurrent query threads schedule
  * independently — the warehouse's ad-hoc vs ETL separation.
  */
object Scheduling {

  /** Pool spec: name, weight (relative share), minShare (cores).
    * Names are restricted to [A-Za-z0-9_-]+ at construction so they
    * can never produce malformed XML in the allocation file (quotes,
    * '<' or '&' would otherwise fail at session start). */
  case class Pool(name: String, weight: Int, minShare: Int) {
    require(name.matches("[A-Za-z0-9_-]+"),
      s"pool name must match [A-Za-z0-9_-]+, got '$name'")
  }

  /** Write a Spark fairscheduler.xml; pass the returned path as
    * `spark.scheduler.allocation.file`. */
  def writeAllocationFile(pools: Seq[Pool], dir: String): String = {
    val xml = new StringBuilder("<?xml version=\"1.0\"?>\n<allocations>\n")
    pools.foreach { p =>
      xml.append(
        s"""  <pool name="${p.name}">
           |    <schedulingMode>FAIR</schedulingMode>
           |    <weight>${p.weight}</weight>
           |    <minShare>${p.minShare}</minShare>
           |  </pool>
           |""".stripMargin)
    }
    xml.append("</allocations>\n")
    val path = Paths.get(dir, "fairscheduler.xml")
    Files.write(path, xml.toString.getBytes(StandardCharsets.UTF_8))
    path.toString
  }

  /** Run `f`'s jobs in the named pool (thread-local, restored after). */
  def runInPool[T](spark: SparkSession, pool: String)(f: => T): T = {
    val sc = spark.sparkContext
    val prev = sc.getLocalProperty("spark.scheduler.pool")
    sc.setLocalProperty("spark.scheduler.pool", pool)
    try f finally sc.setLocalProperty("spark.scheduler.pool", prev)
  }

  /** A FAIR pool plus the CAPACITY-queue discipline layered on it:
    * at most `maxConcurrent` jobs of the pool run at once, and under
    * contention one user may hold at most
    * max(maxConcurrent·userLimitPct%, maxConcurrent/activeUsers)
    * of those slots. */
  case class CapacityPool(pool: Pool, maxConcurrent: Int,
    userLimitPct: Int = 100) {
    require(maxConcurrent >= 1, "maxConcurrent must be >= 1")
    require(userLimitPct >= 1 && userLimitPct <= 100,
      s"userLimitPct must be in [1,100], got $userLimitPct")
  }

  /** Capacity-queue admission control over FAIR pools (ref:
    * src/contrib/capacity-scheduler/src/java/org/apache/hadoop/mapred/
    * CapacityTaskScheduler.java:1 — guaranteed-capacity queues with
    * per-queue concurrency and per-user limits). Spark's FAIR pools
    * already guarantee the CPU split BETWEEN pools (weight/minShare ≈
    * queue capacity); what they lack is the reference's within-queue
    * discipline: an over-submitting tenant can flood its own pool's
    * scheduler queue and monopolize it. This gate adds exactly that
    * layer:
    *  - a pool admits at most `maxConcurrent` jobs; excess submitters
    *    block until a slot frees (the queue's running-job cap);
    *  - under contention a single user is admitted up to
    *    max(cap·userLimitPct%, cap/activeUsers) slots — the
    *    reference's user-limit formula: alone you may use the whole
    *    queue, against N peers you converge to 1/N (floored by the
    *    configured percent).
    * Because every pool's admission is independent and jobs in other
    * pools never wait on this gate, a flooded pool cannot starve a
    * minShare pool — its excess jobs wait OUTSIDE Spark, where they
    * hold no scheduler resources at all. (The reference's
    * memory-aware slotting, MemoryMatcher.java:1, maps to Spark's own
    * unified memory manager and has no admission analog here.) */
  class CapacityScheduler(spark: SparkSession, pools: Seq[CapacityPool]) {
    private val byName = pools.map(p => p.pool.name -> p).toMap
    private val lock = new Object
    private val running =
      scala.collection.mutable.Map[String, scala.collection.mutable.Map[String, Int]]()
    private val waiting =
      scala.collection.mutable.Map[String, scala.collection.mutable.Map[String, Int]]()

    /** Blocks until the (pool, user) pair is admissible, runs `f`'s
      * jobs in the FAIR pool, releases on completion. */
    def submit[T](pool: String, user: String)(f: => T): T = {
      val cp = byName.getOrElse(pool,
        throw new IllegalArgumentException(s"unknown capacity pool '$pool'"))
      lock.synchronized {
        val w = waiting.getOrElseUpdate(pool, scala.collection.mutable.Map())
        w(user) = w.getOrElse(user, 0) + 1
        // an interrupt while blocked must not leak the waiting entry —
        // a ghost waiter would inflate activeUsers (and so depress
        // every user's cap) for the scheduler's lifetime
        try {
          while (!admissible(cp, user)) lock.wait()
        } finally {
          w(user) -= 1
          if (w(user) == 0) w.remove(user)
          // a departing waiter shrinks activeUsers ⇒ caps rise;
          // wake the others to re-check (no-op on normal admission)
          lock.notifyAll()
        }
        val r = running.getOrElseUpdate(pool, scala.collection.mutable.Map())
        r(user) = r.getOrElse(user, 0) + 1
      }
      try runInPool(spark, pool)(f)
      finally lock.synchronized {
        val r = running(pool)
        r(user) -= 1
        if (r(user) == 0) r.remove(user)
        lock.notifyAll()
      }
    }

    /** Snapshot of a pool's running-job count (for monitoring). */
    def runningIn(pool: String): Int =
      lock.synchronized(running.get(pool).map(_.values.sum).getOrElse(0))

    // caller holds `lock`
    private def admissible(cp: CapacityPool, user: String): Boolean = {
      val name = cp.pool.name
      val r = running.getOrElse(name, scala.collection.mutable.Map.empty[String, Int])
      if (r.values.sum >= cp.maxConcurrent) return false
      val w = waiting.getOrElse(name, scala.collection.mutable.Map.empty[String, Int])
      val activeUsers = math.max(1, (r.keySet ++ w.keySet).size)
      val userCap = math.max(1, math.max(
        math.ceil(cp.maxConcurrent * cp.userLimitPct / 100.0),
        math.ceil(cp.maxConcurrent.toDouble / activeUsers)).toInt)
      r.getOrElse(user, 0) < userCap
    }
  }
}
