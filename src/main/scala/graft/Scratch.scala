package graft

import graft.operators.Dedup
import org.apache.spark.sql.SparkSession

object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    docs.count()
    time("shingles")(Dedup.shingles(docs).write.format("noop").mode("overwrite").save())
    time("minhash")(Dedup.minhash(docs).write.format("noop").mode("overwrite").save())
    time("bandSignatures")(Dedup.bandSignatures(docs).write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
