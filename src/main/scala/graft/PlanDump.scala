package graft

import org.apache.spark.sql.SparkSession

/** Throwaway plan-inspection main (not part of the driver contract). */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("PLANDUMP_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val time = sys.env.contains("PLANDUMP_TIME")
    for (name <- args.drop(1)) {
      println(s"===== $name =====")
      if (time) {
        for (i <- 1 to 2) {
          val t0 = System.nanoTime()
          Queries.all(name)(spark, dir).write.format("noop").mode("overwrite").save()
          graft.operators.CacheScope.releaseAll()
          println(f"--- $name iter $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
        }
      } else {
        val df = Queries.all(name)(spark, dir)
        println(df.queryExecution.executedPlan.toString.take(12000))
        val exchanges = "Exchange hashpartitioning".r.findAllIn(df.queryExecution.executedPlan.toString).size
        println(s"--- hash exchanges: $exchanges")
        graft.operators.CacheScope.releaseAll()
      }
    }
    spark.stop()
  }
}
