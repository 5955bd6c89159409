ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "bigdatalogsspark"
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
// Forked runMain output normally routes through the sbt logger, which
// prefixes every stdout line with "[info] " — corrupting the ONE
// machine-read artifact this build emits (Bench's single JSON line on
// stdout: a parser that json.loads the captured line gets the prefix
// too, the BENCH_r{9..11} parsed:null class). StdoutOutput passes the
// child's streams through raw.
outputStrategy := Some(OutputStrategy.StdoutOutput)
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}", // local[32] headroom (host has 128 GiB)
)

// Shipping gate: correctness specs + physical-plan assertions + plan-shape
// drift vs the committed baseline. Each stage exits non-zero on FAIL, so
// `sbt gate` is red if any layer regresses.
addCommandAlias("gate", ";test ;runMain graft.PlanCheck ;runMain graft.PlanDrift")
