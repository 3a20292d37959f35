ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
ThisBuild / scalacOptions ++= Seq("-deprecation")
name := "datafusiongpuspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
// tools/run.sh launches java straight from target/scala-2.13/classes, so
// plain `sbt compile` must also stage resources (the DataSourceRegister
// services file that binds the `arrowipc` short name) into that dir.
Compile / compile := (Compile / compile).dependsOn(Compile / copyResources).value
Test / fork := true
run / fork := true
run / connectInput := true  // REPL (graft.Main) reads stdin
// The bench driver JSON-decodes the LAST stdout line of `sbt "runMain
// graft.Bench"`. By default sbt relays forked stdout with an "[info] "
// prefix and appends a "[success] Total time…" epilogue — both break the
// parse (BENCH parsed=null rounds 2–4). StdoutOutput passes the child's
// stdout/stderr through unprefixed; showSuccess drops the epilogue.
run / outputStrategy := Some(StdoutOutput)
Global / showSuccess := false
Global / excludeLintKeys += showSuccess  // command-loop setting; lint can't see its use
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
