package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

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
    * so order-sensitive operators (A4 imputation, W1/W2 chaos, A2
    * tie-break) stay exact: `zipWithIndex` assigns a GLOBAL, contiguous
    * index from (partition, offset) — deterministic for file sources
    * whose partitions are ordered by (file, byte offset) regardless of
    * split count. `monotonically_increasing_id` would only be file-order
    * under single-split reads.
    */
  def parseLines(spark: SparkSession, lines: DataFrame, url: String): DataFrame = {
    import spark.implicits._
    val indexed = lines
      .select(col("value").cast("string"))
      .rdd.map(_.getString(0))
      .zipWithIndex()
      .toDF("value", "seq")
    val parts = split(col("value"), " ")
    indexed.select(
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
  /** Raw-nanos read schema for [[readEvents]]'s fallback path (see
    * there).
    */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** events.parquet has shipped with `ts` in two encodings across
    * driver testdata generations: TIMESTAMP(NANOS), which Spark 4's
    * reader rejects outright ([PARQUET_TYPE_ILLEGAL]), and plain
    * TIMESTAMP(MICROS). Decide from the file FOOTER (schema inference
    * throws on nanos — never from the values, which would make the
    * reader data-dependent): micros files read natively with the
    * NTZ→LTZ cast resolving under the session's pinned UTC zone, nanos
    * files read as raw INT64 and convert losslessly with integer
    * arithmetic. No session conf needed either way, so the driver's
    * own SparkSession works too.
    */
  def readEvents(spark: SparkSession, sfDir: String): DataFrame = {
    val path = s"$sfDir/events.parquet"
    val microsFooter =
      scala.util.Try(spark.read.parquet(path).schema("ts").dataType)
        .toOption.exists(t => t == TimestampType || t == TimestampNTZType)
    if (microsFooter)
      spark.read.parquet(path)
        .withColumn("ts", col("ts").cast(TimestampType))
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
    else
      spark.read.schema(eventsSchema).parquet(path)
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  def fromEvents(spark: SparkSession, sfDir: String): DataFrame =
    fromEventsDf(readEvents(spark, sfDir))

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
