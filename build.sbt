ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "etl_omsspark"
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
// r20: run test suites in N concurrently-forked JVM "lanes". The full
// suite had grown to ~27 min of per-test time run sequentially in one
// forked JVM, and the driver's test budget killed it mid-suite
// (VERIFY_r19 tests_ok=false, VERDICT r19 #2). Suites are round-robined
// (name-sorted, deterministic) into lane groups; WITHIN a lane suites
// still run sequentially in one JVM, so the suites that toggle
// shared-session confs (autoBroadcastJoinThreshold, exchange.reuse, ...)
// cannot race; ACROSS lanes the sessions live in separate JVMs — the
// cross-process discipline the index/maintenance code already enforces
// and tests (file build lock, per-pid table names, host-aware leases:
// CrossProcessLockSpec, TwoProcessWalkSpec). Lane count: env override
// GRAFT_TEST_LANES, else cores/4 clamped to [2, 8].
val graftTestLanes: Int = sys.env.get("GRAFT_TEST_LANES").map(_.toInt)
  .getOrElse(math.max(2, math.min(8,
    java.lang.Runtime.getRuntime.availableProcessors / 4)))
Test / testGrouping := {
  val opts = ForkOptions()
    .withRunJVMOptions((Test / javaOptions).value.toVector)
    .withEnvVars((Test / envVars).value)
    .withWorkingDirectory(Some((ThisBuild / baseDirectory).value))
  val sorted = (Test / definedTests).value.sortBy(_.name)
  sorted.zipWithIndex.groupBy(_._2 % graftTestLanes).toSeq.sortBy(_._1)
    .map { case (i, ts) =>
      Tests.Group(s"lane$i", ts.map(_._1), Tests.SubProcess(opts))
    }
}
// sbt's default concurrentRestrictions cap forked test groups at 1;
// allow the lanes (plus headroom for ordinary tasks)
Global / concurrentRestrictions := Seq(
  Tags.limitAll(math.max(graftTestLanes + 2, 4)),
  Tags.limit(Tags.ForkedTestGroup, graftTestLanes))
// keep sbt's "[success] Total time ..." trailer off stdout: the bench
// driver captures only the final ~2000 chars, and the trailer would eat
// ~80 chars of the budget for Bench's compact JSON line
Global / showSuccess := false
// pass the forked run JVM's stdout through RAW (VERDICT r04 #1): the
// default LoggedOutput routes every child line through sbt's logger,
// which prefixes "[info] " — so the driver's JSON parse of the bench
// tail saw "[info] {...}" and recorded parsed:null four rounds running.
// Set at project level and on Compile/run — the two scopes forkOptions
// actually consumes (bare run/runMain-scoped keys trip sbt's
// unused-setting lint as dead).
outputStrategy := Some(StdoutOutput)
Compile / run / outputStrategy := Some(StdoutOutput)
// showSuccess is consumed by sbt's command layer, not a task — exclude it
// from the unused-key lint
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
  "-Dfile.encoding=UTF-8",
  "-Dsun.jnu.encoding=UTF-8",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
// forked JVMs must decode non-ASCII filenames (reference golden dirs) as
// UTF-8; sun.jnu.encoding alone is ignored without a UTF-8 locale
Test / envVars += "LANG" -> "C.UTF-8"
run / envVars += "LANG" -> "C.UTF-8"
