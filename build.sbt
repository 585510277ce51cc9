ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "raphtoryspark"
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
// Driver heap: SPARK_DRIVER_MEM wins; otherwise derive from the box so the
// default is portable — 32g on a >=64 GiB host (at 8g the allocation-heavy
// superstep loops spend a growing share of wall in G1 young GC as core
// count rises: measured 2x superstep cost at local[8] vs a 48g heap, which
// silently destroys scaling-efficiency measurements), half of RAM (min 2g)
// on smaller machines so sbt still starts.
val driverHeap: String = sys.env.getOrElse("SPARK_DRIVER_MEM", {
  val memGb =
    try scala.io.Source.fromFile("/proc/meminfo").getLines()
      .collectFirst { case l if l.startsWith("MemTotal:") =>
        (l.trim.split("\\s+")(1).toLong / (1024L * 1024L)).toInt }
      .getOrElse(16)
    catch { case _: Throwable => 16 }
  if (memGb >= 64) "32g" else s"${math.max(2, memGb / 2)}g"
})
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx$driverHeap",
  // pre-size the heap: a lazily-grown heap gives G1 a tiny young gen for
  // the first minutes of a run — measured 30%+ of wall in young GC on the
  // allocation-heavy superstep loops
  s"-Xms$driverHeap",
)
