package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** GraftExtensions installs blake2s_hex/blake2b_hex at session build time —
  * the cluster-deployment registration path (spark.sql.extensions). */
class ExtensionsSpec extends AnyFunSuite {

  test("withExtensions sessions resolve graft functions in plain SQL") {
    // getOrCreate would hand back another suite's session (without the
    // extensions); clear the active/default slots and restore them after.
    val prev = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val spark = SparkSession.builder()
        .master("local[2]")
        .appName("graft-ext-test")
        .config("spark.ui.enabled", "false")
        .withExtensions(new graft.plans.GraftExtensions)
        .getOrCreate()
      val got = spark.sql(
        "SELECT blake2s_hex('abc', 'graft-record-key', 12) AS h, " +
        "blake2b_hex('abc', '', 64) AS b").collect()(0)
      assert(got.getString(0) === "27729599b715440e4b0fa947")
      assert(got.getString(1).startsWith("ba80a53f981c4d0d"))
    } finally {
      prev.foreach { p =>
        SparkSession.setDefaultSession(p)
        SparkSession.setActiveSession(p)
      }
    }
  }
}
