ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "eucliddatabasespark"
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
// Pass the forked run's stdout through UNPREFIXED: the default
// LoggedOutput strategy stamps every line with "[info] ", which makes
// Bench's one-line JSON summary unparseable to the driver's tail
// capture (every BENCH_r*.json through round 9 carried parsed=null —
// a json.loads of the tail's lines can never succeed on a prefixed
// line). StdoutOutput keeps the driver-facing contract bytes exact.
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
  // ~185 registry queries share one JVM in Bench/Verify; 8g caused
  // storage-cache eviction + GC contention visible as ~2x inflation on
  // the shuffle-heavy scale queries when run inside the full suite,
  // and at 16g the round-7 additions (streaming state stores, the
  // committed ANN/graph stores, the 3M-row table) pushed the same
  // contention back (vt_scale_300k 14.8s solo vs 34s in-suite). The
  // host has 128 GiB; 28g keeps the suite in the solo regime.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "28g")}",
  // -XX:-DontCompileHugeMethods was carried from round 7 for the wide
  // unrolled signature projections; the fused native kernels
  // (simhash128, lsh_scale_vec) retired those, and a 6-run quiet-host
  // A/B (BASELINE.md round 9) showed with/without indistinguishable
  // on every scale row — so the suite now runs a STOCK JVM, matching
  // what a real cluster executor would do.
)
