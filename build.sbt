ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "zacksestimatesfinancialstatementsspark"
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
// Pass the forked child's stdout through verbatim — sbt's default logger
// wraps every line in "[info] ", which breaks any consumer that expects a
// bare JSON line on stdout (the driver's BENCH tail parse).
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
  // local[32] with every query's caches resident needs headroom — 8g
  // produced multi-second GC pauses in Bench on the 128 GiB test box
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // 85 queries x (warmup + 2 timed runs) of whole-stage-codegen classes
  // overflow the default 240m JIT code cache; eviction then deoptimizes the
  // document-parser hot loops and a 2.5s pipeline reads as 15s
  "-XX:ReservedCodeCacheSize=1g",
) ++ sys.env.get("SPARK_GC_LOG").map(f => s"-Xlog:gc*:file=$f").toSeq
