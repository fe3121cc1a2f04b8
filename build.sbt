ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "ducklakexlspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
// The DSv2 catalog registry and the session's current-catalog are shared
// session state; suites must not interleave lake.sql scopes.
Test / parallelExecution := false
run / fork := true
// r20 (VERDICT r19 item 1): the driver parses the bench's one-line JSON from
// `sbt "runMain graft.Bench"` stdout, and has parsed NULL in every round —
// not (only) because of line length, but because the default fork output
// strategy (LoggedOutput) prefixes every forked-stdout line with "[info] ",
// so no stdout line ever *starts* with '{' (BENCH_r01.json's tail shows the
// full JSON inside the 2000-char window, still unparsed). StdoutOutput
// passes the forked process's stdout/stderr through unwrapped.
run / outputStrategy := Some(StdoutOutput)
// ...and suppress the trailing "[success] Total time ..." logger line so the
// bench JSON is the LAST line sbt prints on stdout.
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
