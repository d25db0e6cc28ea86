package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession

/** The config-driven extensions path (`spark.sql.extensions=
  * graft.GraftExtensions`, the cluster deployment shape — injection via
  * spark-defaults / --conf instead of a runtime
  * `GraftFunctions.install`). `spark.sql.extensions` is a STATIC conf
  * read when the SparkContext is created, so this suite must OWN the
  * context: build.sbt places it in its own forked-JVM test group,
  * isolated from the shared-session suites. The injection plumbing
  * itself (cloned registry, builder resolution) is covered
  * unconditionally in SqlSurfaceSpec. */
class GraftExtensionsConfigSpec extends AnyFunSuite {

  test("config-driven session: spark.sql.extensions resolves graft_* without install()") {
    assert(org.apache.spark.SparkEnv.get == null,
      "suite must own the SparkContext — check the build.sbt testGrouping isolation")
    val s2 = SparkSession.builder()
      .master("local[4]")
      .appName("graft-ext-test")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .getOrCreate()
    try {
      val row = s2.sql(
        "SELECT graft_ws_tokens('a b c') AS n, graft_lang_id('the of and is') AS l")
        .collect()(0)
      assert(row.getInt(0) === 3)
      assert(row.getString(1) === "en")
    } finally s2.stop()
  }
}
