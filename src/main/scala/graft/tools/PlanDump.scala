package graft.tools

import org.apache.spark.sql.SparkSession

/** Write `.explain("formatted")` of named SparkEntry queries to files —
  * the plan evidence for OPTIMIZATION_r06.md (plans/r06/<q>_<suffix>.txt).
  * Run: sbt "runMain graft.tools.PlanDump <suffix> <query> [query ...]"
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <suffix> <query>...")
    val suffix = args(0)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-plandump")
      .config("spark.sql.shuffle.partitions", math.max(cpus, 8).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", "/dev/shm/spark-tmp")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = java.nio.file.Paths.get("plans", "r06")
    java.nio.file.Files.createDirectories(dir)
    for (name <- args.drop(1)) {
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(dir.resolve(s"${name}_$suffix.txt"), txt)
      println(s"wrote plans/r06/${name}_$suffix.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
