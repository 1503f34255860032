ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "cranestreamprocessingspark"
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
  // ObjectHashAggregate falls back to SORT-BASED aggregation past this
  // many distinct groups per partition (Spark default: 128). The
  // k-bounded TopKAgg tails group by query id — thousands of tiny
  // k-bounded buffers — and at 128 the fallback SORTED the whole
  // 160M-row pair stream (measured: 8-14 GB spill, >90% of the deep
  // rung chain-serve wall time). 65536 keeps k-bounded aggs on the
  // hash path while wide-group object aggs (collect_list over a
  // corpus-wide key) still fall back to the spill-protected sort.
  "-Dspark.sql.objectHashAggregate.sortBased.fallbackThreshold=65536",
  // 16g default (was 8g): the r14 quiet bench showed sticky ~1.2s
  // full-GC pauses landing inside sub-second queries' timed windows
  // once the old gen filled mid-run (324-query session); the host has
  // 128 GiB — headroom is cheaper than polluted records. Override via
  // SPARK_DRIVER_MEM.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
)
