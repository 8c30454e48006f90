ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "vectordbretrievalspark"
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
// The round driver reads a ~2KB TAIL of `sbt runMain graft.Bench` stdout
// and json-parses the artifact line. Two sbt behaviors broke that for six
// rounds: (a) forked run output is wrapped by sbt's logger as `[info] {…}`,
// (b) sbt appends `[success] Total time…` AFTER the artifact, so last-line
// parsers read the wrong line. Pass the child's stdout through verbatim
// and drop the success trailer entirely.
run / outputStrategy := Some(StdoutOutput)
Global / showSuccess := false
// showSuccess is consumed by sbt's command engine, not a task — exclude it
// from the unused-key lint so the warning doesn't land in the stdout tail
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
  // optional SIMD distance kernels (graft.operators.SimdDist); the
  // library degrades to scalar kernels when the module is absent
  "--add-modules=jdk.incubator.vector",
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // Xms == Xmx: the allocation-heavy driver-side builds (HNSW graph,
  // union-find) otherwise pay one-time heap-expansion pauses INSIDE their
  // timed window — the "first full-size build ~2×" effect HnswEfcSweep
  // measured. 16g default: the box has 128 GiB and the bench context
  // holds multiple cached workload artifacts while building; at 8g the
  // build's garbage rate turned into a ~5× context-vs-standalone
  // inflation (r6: msmarco hnsw 83.5 s in-bench vs ~16 s standalone).
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  // many sequential queries generate many codegen classes; the default
  // 240m code cache overflows and the JIT stops compiling (later queries
  // then run interpreted, 10-30x slower)
  "-XX:ReservedCodeCacheSize=1g",
)
