package graft

import org.apache.spark.sql.SparkSession

/** Throwaway formatted-plan dumper (not part of the driver contract):
  * writes `.explain("formatted")` output for each named query to
  * `<outDir>/<query>_<suffix>.txt` — the before/after plan evidence the
  * optimization rounds commit under plans/.
  */
object PlanDumpFmt {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("PLANDUMP_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val outDir = args(0)
    val suffix = args(1)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    for (name <- args.drop(2)) {
      try {
        val df = SparkEntry.queries(name)(spark, dir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"), txt)
        println(s"[plandump] wrote $name ($suffix): ${txt.length} chars")
      } catch {
        case e: Throwable => println(s"[plandump] $name failed: ${e.getMessage}")
      } finally graft.operators.CacheScope.releaseAll()
    }
    spark.stop()
  }
}
