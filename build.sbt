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
  // 12g default (overridable via SPARK_DRIVER_MEM): a local[32] driver
  // IS the whole cluster — 32 concurrent tasks' execution memory plus
  // the block manager's persisted/checkpointed blocks live in this one
  // heap. Same-mode A/Bs at 8g/12g/20g: 8g shows GC drag on the
  // dedup/ANN rows (jaccard_topk 3.96 -> 3.32 s, dedup_semantic 1.90 ->
  // 1.02, triangle_parts 3.35 -> 2.83 at 12g); 20g overshoots — the
  // shuffle-heavy cluster rows develop a LASTING mid-run degradation
  // (dedup_clusters_scalable reps 4.4,4.5,4.7 then 16.4,12.7,11.5 —
  // G1 old-gen growth outpacing the async cleaner), gone at 12g where
  // collections run often enough to keep cleaner backlogs bounded.
  // A real cluster sizes executor heaps to cores exactly the same way.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "12g")}",
)
