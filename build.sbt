ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "fsstlikespark"
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
// Forked run output goes straight to this process's stdout/stderr with NO
// "[info]" prefix — the bench driver parses graft.Bench's single JSON line
// from stdout, and the sbt log decoration broke that parse in round 1.
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
// Young-gen size must stay below the heap: derive it from SPARK_DRIVER_MEM
// (a third of the heap, floor 1g) instead of a fixed 8g that breaks any
// heap request <= 8g.
val driverMem = sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")
val youngGen: Option[String] = {
  val m = "(?i)^(\\d+)([gm])$".r
  driverMem match {
    case m(n, u) =>
      val mb = if (u.equalsIgnoreCase("g")) n.toLong * 1024 else n.toLong
      // -Xmn must stay well below -Xmx: for small heaps (<2g) skip the
      // explicit young gen entirely rather than risk -Xmn >= -Xmx.
      if (mb < 2048) None else Some(s"-Xmn${math.max(mb / 3, 512)}m")
    case _ => None // unparseable heap spec: let the GC size the young gen
  }
}
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx$driverMem",
  s"-Xms$driverMem",
  // Batch-throughput GC: G1 showed pathological pause inflation with 32
  // concurrent encode tasks (task runtimes 10-15x at local[32] vs local[8]);
  // fixed spaces + fast tenuring stop adaptive-sizing oscillation and
  // survivor ping-pong of medium-lived chunk buffers.
  "-XX:+UseParallelGC",
  "-XX:MaxTenuringThreshold=2",
) ++ youngGen
