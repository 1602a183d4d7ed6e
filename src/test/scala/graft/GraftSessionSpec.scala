package graft

import org.apache.spark.SparkException
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The library front door delivers its documented wiring: functions,
  * guard rails, and the determinism confs. Builds its own session (the
  * point under test), parked around the shared one. */
class GraftSessionSpec extends AnyFunSuite {

  test("GraftSession.create wires functions, guards, and the determinism confs") {
    val old = TestSpark.spark // ensure the shared session exists first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s = GraftSession.create(parallelism = 2)
      assert(s ne old)
      assert(s.conf.get("spark.sql.session.timeZone") == "UTC")
      assert(s.conf.get("spark.sql.shuffle.partitions") == "2")
      assert(s.conf.get("spark.sql.adaptive.enabled") == "true")
      // SQL function surface present
      assert(s.sql("SELECT graft_md5_upper('x') AS h").count() == 1L)
      // both guards live
      intercept[SparkException] {
        s.range(100).toDF("id")
          .withColumn("rn", row_number().over(Window.orderBy("id"))).collect()
      }
      intercept[SparkException] {
        s.range(100).toDF("a").join(s.range(100).toDF("b")).count()
      }
      intercept[IllegalArgumentException] { GraftSession.create(parallelism = 0) }
    } finally {
      SparkSession.setActiveSession(old)
      SparkSession.setDefaultSession(old)
    }
  }

  test("create() on a pre-existing session delivers the contract through the late-binding paths") {
    val old = TestSpark.spark
    SparkSession.setActiveSession(old)
    SparkSession.setDefaultSession(old)
    val before = old.experimental.extraOptimizations
    val tzBefore = old.conf.get("spark.sql.session.timeZone")
    val spBefore = old.conf.get("spark.sql.shuffle.partitions")
    try {
      // the inherited session's tuning must SURVIVE create(): before the
      // round-8 fix, getOrCreate applied the builder's modifiable confs,
      // silently resetting a cluster session's shuffle parallelism to
      // this machine's CPU count and its timezone to UTC
      old.conf.set("spark.sql.session.timeZone", "America/New_York")
      old.conf.set("spark.sql.shuffle.partitions", "7")
      val s = GraftSession.create(parallelism = 2)
      // the active session is reused — extensions could not apply, so
      // functions registered via the registry and guards via
      // extraOptimizations; tuning confs untouched
      assert(s eq old)
      assert(s.conf.get("spark.sql.session.timeZone") == "America/New_York")
      assert(s.conf.get("spark.sql.shuffle.partitions") == "7")
      assert(s.sql("SELECT graft_md5_upper('x') AS h").count() == 1L)
      intercept[SparkException] {
        s.range(100).toDF("id")
          .withColumn("rn", row_number().over(Window.orderBy("id"))).collect()
      }
    } finally {
      old.experimental.extraOptimizations = before
      old.conf.set("spark.sql.session.timeZone", tzBefore)
      old.conf.set("spark.sql.shuffle.partitions", spBefore)
    }
  }
}
