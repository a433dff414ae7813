package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for specs. */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.warehouse.dir",
      java.nio.file.Files.createTempDirectory("graft-wh").toString)
    .config("spark.ui.enabled", "false")
    // the cluster deployment path: extensions land in the SparkConf, so
    // EVERY session derived from this context (including the Connect
    // service's per-client server-side sessions) gets graft's kernel
    // functions and flag-gated rules — ConnectSmokeSpec proves kernels
    // resolve over Connect only because of this line
    .config("spark.sql.extensions", "graft.functions.GraftExtensions")
    .getOrCreate()

  val sfDir = "/root/testdata/sf0.001"

  def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft-test").toString
}
