ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "analystspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
// A dangling operator on a continuation line (e.g. a two-line arithmetic
// Column expression without parentheses) silently becomes a discarded
// statement under semicolon inference; this warning catches that class of
// bug at compile time. Benign side-effect idioms (parser advance(),
// warm-up collect()/count(), awaitTermination) are silenced by type so a
// discarded Column/DataFrame still warns.
scalacOptions ++= Seq(
  "-Wnonunit-statement",
  "-Wconf:msg=unused value of type org\\.apache\\.spark:w," +
    "msg=unused value:s",
)
Test / fork := true
run / fork := true
// Pass forked-run output through unprefixed: the bench/verify harness parses
// stdout lines as JSON, and sbt's default logger prepends "[info] " to every
// forked line, which breaks `json.loads` on the bench result line.
run / outputStrategy := Some(StdoutOutput)
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
  // Pin the initial heap to the max: with a small default -Xms, the
  // FIRST allocation-heavy stage in a JVM pays the whole heap-expansion
  // GC thrash (measured on graft.AnnScale at 96g: the first 1M-vector
  // index build in a session read 100-240 s while an IDENTICAL build
  // moments later read 4-5 s — whichever scale step allocated big first
  // absorbed a ~40× spike, masquerading as an algebra regression).
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // 100 bench queries × whole-stage codegen ≈ thousands of generated
  // classes; the JDK default 240 MB code cache fills late in the run,
  // stalling C2 so new/cold code runs interpreted (observed as 10-40×
  // spikes on whichever query first touches a heavyweight lazy init).
  "-XX:ReservedCodeCacheSize=512m",
)
