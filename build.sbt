ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "wordpresssqltocontentstackexporterspark"
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
// Emit the forked program's stdout RAW instead of through sbt's logger:
// the logger prefixes every line with "[info] ", which breaks harnesses
// that tail-capture stdout and json-parse the final line (every round's
// bench artifact had parsed:null because of it).
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// ...and drop sbt's own trailing "[success] Total time: ..." line, which
// otherwise lands AFTER the program's final JSON and defeats a
// parse-the-last-line harness even with raw stdout above.
Global / showSuccess := false
// showSuccess is consumed by sbt's command loop, not a task — exclude it
// from the unused-key lint.
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
)
