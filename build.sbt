ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "lightlanespark"
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
  // 20g default (overridable via SPARK_DRIVER_MEM): a local[32] driver
  // IS the whole cluster — 32 concurrent tasks' execution memory plus
  // the block manager's persisted/checkpointed blocks live in this one
  // heap, and the old 8g default showed measurable GC drag on the
  // dedup/ANN rows (same-mode A/B: jaccard_topk 5.8 -> 3.9 s min,
  // dedup_semantic 1.8 -> 1.2 s min, triangle_parts 4.3 -> 3.4 s min).
  // The host carries 128 GiB; a real cluster sizes executor heaps to
  // cores exactly the same way.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "20g")}",
)
