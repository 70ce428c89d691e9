package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session: one per suite, local mode, UTC, small shuffle width. */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName(getClass.getSimpleName)
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    // read once at context creation: lets CheckpointsSpec assert that the
    // reliable path's superseded checkpoint dirs actually get deleted
    .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
    .getOrCreate()

  def fixture(rel: String): String =
    getClass.getResource(s"/fixtures/$rel").getPath

  val sf0001 = "/root/testdata/sf0.001"
  val sf001 = "/root/testdata/sf0.01"
  val sf01 = "/root/testdata/sf0.1"
}
