ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "warcatrsspark"
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
// forked mains write DIRECTLY to this process's stdout/stderr instead of
// through sbt's logger: the logger prefixes every stdout line with
// "[info] ", and the driver parses graft.Bench's single JSON line out of
// a raw ~2000-char output tail — "[info] {...}" is not a JSON line
// (BENCH_r02.json shows exactly that prefixed line with "parsed": null)
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
// the extract sink's conflict markers (⬧) are non-ASCII filename bytes;
// a POSIX-locale JVM cannot map them through java.nio paths
// (sun.jnu.encoding follows the process locale, not -D overrides)
Test / envVars += "LC_ALL" -> "C.UTF-8"
run / envVars += "LC_ALL" -> "C.UTF-8"
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dfile.encoding=UTF-8",
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // 16g default for forked mains/tests. Note: bench CHILD JVMs get their
  // own fixed 10g + AlwaysPreTouch (graft.Bench) — on this microVM cold
  // guest pages are host-backed, so a lazily-faulted big heap costs
  // ~100 s of kernel time inside timed rounds
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  // NO AlwaysPreTouch here: on this microVM faulting costs ~4.7 s/GB of
  // kernel time (measured: `java -Xms10g -XX:+AlwaysPreTouch -version`
  // = 47 s wall), so pre-touching 16g would add ~75 s to EVERY forked
  // main (Verify, tests) for pages mostly never used. Bench children
  // amortize their fault cost across repeated in-JVM timed rounds.
)
