ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "bigartmspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// GraftExtensionsConfigSpec must CREATE the SparkContext (static
// spark.sql.extensions conf), so it runs alone in its own forked JVM;
// everything else shares one forked JVM as before. Groups are
// serialized (ForkedTestGroup limit) so two local Spark sessions never
// contend for the machine.
Test / testGrouping := {
  val tests = (Test / definedTests).value
  val opts = (Test / javaOptions).value
  val base = baseDirectory.value
  val forkOpts = ForkOptions()
    .withRunJVMOptions(opts.toVector)
    .withWorkingDirectory(base)
  val (iso, rest) = tests.partition(_.name == "graft.GraftExtensionsConfigSpec")
  Seq(
    Tests.Group("graft-extensions-config", iso, Tests.SubProcess(forkOpts)),
    Tests.Group("shared-session", rest, Tests.SubProcess(forkOpts)))
}
Global / concurrentRestrictions += Tags.limit(Tags.ForkedTestGroup, 1)
// Pass forked-run output through UNPREFIXED: sbt's default logger tags
// every stdout line with "[info] ", which keeps the driver's bench
// parser (expects a raw one-line {"metric":...} JSON) from matching.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
