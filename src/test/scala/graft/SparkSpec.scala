package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Shared local SparkSession for all specs. */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session
  override def afterAll(): Unit = ()
}

object SparkSpec {
  lazy val session: SparkSession = {
    // Multi-JVM suite knob (round 11): SPARK_GRAFT_TEST_MASTER=
    // local-cluster[2,4,4096] runs every spec across separate executor
    // processes, exercising task/broadcast serialization that local[4]
    // never does. Executors then need the app AND test classes —
    // SPARK_GRAFT_TEST_JARS must list both `sbt package` jars
    // (bigartmspark_*.jar,bigartmspark_*-tests.jar) PLUS the
    // scalatest/scalactic/scalacheck jars from the local dependency
    // cache (spec closures shipped to executors reference their spec
    // class, whose scalatest superclasses must resolve there — missing
    // ones surface as NoClassDefFoundError: org/scalatest/...; note
    // scalatest-compatible is a plain-Java artifact, no _2.13 suffix).
    // The launcher also needs SPARK_SCALA_VERSION=2.13 (spark-submit
    // normally sets it). Full suite certified 406/406 under
    // local-cluster[2,4,4096] in round 11.
    val master = sys.env.getOrElse("SPARK_GRAFT_TEST_MASTER", "local[4]")
    val b = SparkSession.builder()
      .master(master)
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
    sys.env.get("SPARK_GRAFT_TEST_JARS").foreach(j => b.config("spark.jars", j))
    val s = b.getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
