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
}
