package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Capture sources.
  *
  * The reference streams CDX lines over HTTP (reference: main.py:112-126);
  * this engine reads the same shape from files (space-separated text or
  * parquet) or adapts the driver's synthetic `events` table into a
  * deterministic capture stream for oracle-checked testing.
  *
  * Scale note: file-based sources get Catalyst column pruning and
  * predicate pushdown for free; at 100 TB the capture scan reads only
  * (url, ts, status, digest) and prunes partitions on `url` filters.
  */
object Cdx {

  /** Parse raw CDX text lines `"<ts> <status> <digest>"` for one URL
    * (reference line split at main.py:144). `seq` preserves stream order
    * via the line's position so order-sensitive operators stay exact.
    */
  def parseLines(spark: SparkSession, lines: DataFrame, url: String): DataFrame = {
    val parts = split(col("value"), " ")
    lines
      .withColumn("seq", monotonically_increasing_id())
      .select(
        lit(url).as("url"),
        parts.getItem(0).as("ts"),
        parts.getItem(1).as("status"),
        parts.getItem(2).as("digest"),
        col("seq"))
  }

  /** Deterministic adapter: driver `events` table -> capture stream.
    *
    * Must stay EXACTLY in sync with the `captures` CTE in
    * [[graft.Oracle.capturesCte]] — the DuckDB oracle re-derives the same
    * stream from the same parquet, so every expression here has a
    * lexically-identical SQL twin.
    */
  def fromEvents(spark: SparkSession, sfDir: String): DataFrame =
    fromEventsDf(spark.read.parquet(s"$sfDir/events.parquet"))

  def fromEventsDf(events: DataFrame): DataFrame = {
    val e = col("event_id")
    events.select(
      concat(lit("u"), (col("user_id") % 20).cast("string")).as("url"),
      date_format(col("ts"), "yyyyMMddHHmmss").as("ts"),
      when(e % 13 === 0, "-")
        .when(e % 7 === 0, "404")
        .when(e % 5 === 0, "503")
        .when(e % 3 === 0, "301")
        .otherwise("200")
        .as("status"),
      md5(concat(lit("d"), (col("user_id") % 20).cast("string"), (e % 6).cast("string")))
        .as("digest"),
      e.as("seq"))
  }
}
