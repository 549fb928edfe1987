package graft.sinks

import graft.model.ScoredRow
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Result materialization (SNK1/SNK2 made concrete): the reference
  * renders frames to a UI and disk-caches load_cdx results
  * (main.py:129,393-571); the engine's equivalent is a partitioned
  * parquet dataset a serving layer reads directly.
  *
  * Layout: hash-bucketed by url so (a) one url's whole series lands in
  * one partition directory (the dashboard's point-lookup), (b) writes
  * spread evenly however skewed the url population, (c) bucket count —
  * not url count — bounds the file count, the thing that kills object
  * stores at 100 TB. Rows are sorted (url, day) within partitions so
  * per-url scans are contiguous and parquet min/max statistics prune
  * day ranges.
  */
object Sinks {

  val DefaultBuckets = 64

  private def bucketed(df: DataFrame, buckets: Int): DataFrame =
    df.withColumn("url_bucket", pmod(xxhash64(col("url")), lit(buckets)))

  /** Write a scored (or daily) table for serving. */
  def writeScored(scored: DataFrame, path: String, buckets: Int = DefaultBuckets): Unit =
    bucketed(scored, buckets)
      .repartition(col("url_bucket"))
      .sortWithinPartitions("url", "day")
      .write
      .partitionBy("url_bucket")
      .mode("overwrite")
      .parquet(path)

  /** Read the materialization back; `forUrl` prunes to the one bucket
    * partition the url hashes into (partition pruning does the work —
    * check PushedFilters/PartitionFilters in the scan).
    */
  def readScored(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def forUrl(spark: SparkSession, path: String, url: String, buckets: Int = DefaultBuckets): DataFrame =
    readScored(spark, path)
      .filter(col("url_bucket") === pmod(xxhash64(lit(url)), lit(buckets)) && col("url") === url)

  /** Wire the incremental scorer into an append-only parquet dataset
    * with exactly-once checkpointing — the streaming serving path: each
    * closed day's scores land durably as they finalize.
    */
  def scoredStreamSink(
      scored: Dataset[ScoredRow],
      path: String,
      checkpoint: String): StreamingQuery =
    scored.writeStream
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .start()
}
