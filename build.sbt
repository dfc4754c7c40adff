ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "dataengineeringnddatalakeproject4spark"
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
// The bench driver captures sbt's stdout tail and parses the LAST line as
// bare JSON. sbt's default forked-run output strategy routes the child's
// stdout through the sbt logger ("[info] " prefix) and then appends its own
// "[success] Total time..." line — so the driver's parse failed every round
// (BENCH_r01..r11 all read "parsed": null) even after Bench printed a
// compact final summary. Pass the child's streams through untouched and
// suppress the success banner so Bench's final println IS the process's
// last stdout line.
run / outputStrategy := Some(StdoutOutput)
Global / showSuccess := false
Global / excludeLintKeys += showSuccess
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
  // local[32] with an 8g heap GC-thrashes on shuffle-heavy queries; the
  // image has 128 GiB, so default higher (override via SPARK_DRIVER_MEM)
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
)
// r13: one forked JVM PER SUITE, four at a time — a single `sbt test`
// invocation ran all 18 suites sequentially in one local[4] JVM (~2 h)
// and has never fit the driver's verification budget (r11/r12 VERDICT
// item). Suites are independent (own SparkSessions, tmp dirs are
// per-test createTempDirectory or suite-unique /tmp/graft_fuzz paths,
// nothing asserts on wall time), and the box is 32 cores / 128 GiB, so
// 4 concurrent local[4] suites x 10g heap fit with headroom. Depth is
// unchanged — same specs, same seeds (SPARK_GRAFT_FUZZ_SEEDS still
// scales the fuzz battery up for builder-round deep runs).
Test / testGrouping := (Test / definedTests).value.map { t =>
  Tests.Group(t.name, Seq(t), Tests.SubProcess(ForkOptions()
    .withRunJVMOptions(((Test / javaOptions).value :+ "-Xmx10g").toVector)))
}
Global / concurrentRestrictions := Seq(
  Tags.limit(Tags.ForkedTestGroup, 4),
  Tags.limitAll(16))
// per-test durations in the suite log (the SUITE_r13 artifact needs
// per-suite wall attribution; scalatest's default reporter omits it)
Test / testOptions += Tests.Argument(TestFrameworks.ScalaTest, "-oD")
