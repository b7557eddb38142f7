ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "alcospark"
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
// SPARK_LOCAL_DIRS in the environment OVERRIDES spark.local.dir in local
// mode (SparkConf warns about exactly this). If the parent process exports
// it pointing at the shared virtio disk, every forked run's shuffle/spill
// serializes on one device queue and the N-vs-4N scaling measurement
// measures the DISK, not the pipeline. Pin forked JVMs to tmpfs — the
// sandbox analog of per-executor local disks (BASELINE.md protocol).
lazy val tmpfsLocalDirs: Map[String, String] = {
  val shm = new java.io.File("/dev/shm")
  if (shm.isDirectory && shm.canWrite) {
    val d = new java.io.File(shm, "graft_spark_local")
    d.mkdirs()
    Map("SPARK_LOCAL_DIRS" -> d.getAbsolutePath)
  } else Map.empty
}
run / envVars ++= tmpfsLocalDirs
Test / envVars ++= tmpfsLocalDirs
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
  // local[32] runs 32 concurrent tasks in ONE JVM. Two traps on this
  // Firecracker-style VM: (a) 8g thrashes GC once 32 parquet writers +
  // hash-agg state are live; (b) a huge lazily-faulted heap page-fault-
  // storms the microVM (sys-time dominates). 16g pre-touched is the sweet
  // spot; writer row-group size is capped in the session conf instead.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  // batch-throughput collector: lower total GC overhead than G1 for this
  // allocate-and-drop pipeline profile, and GC time otherwise grows with
  // thread count (it taxes the 4N leg of the scaling measurement).
  "-XX:+UseParallelGC",
)
// A/B knob for the GC-thread co-scheduling experiment (BASELINE.md r5):
// ParallelGC sizes its worker pool from the 32 vCPUs (~23 threads), and a
// stop-the-world pause needs them CO-SCHEDULED — on a steal-prone host
// that stretches pauses superlinearly in exactly the 4N legs the scaling
// gate measures. Unset = JVM default.
javaOptions ++= sys.env.get("SPARK_GC_THREADS")
  .map(n => s"-XX:ParallelGCThreads=$n").toSeq
