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

  /** [[eventsSchema]] with `ts` kept as TIMESTAMP_NTZ — the explicit
    * read schema for the micros-NTZ footer case, so the wall clock
    * reaches the conversion expression untouched by any zone cast.
    */
  val eventsNtzSchema: StructType = StructType(
    eventsSchema.map(f => if (f.name == "ts") f.copy(dataType = TimestampNTZType) else f))

  /** The nanos rejection is the ONE footer-probe failure that routes to
    * the raw-int64 fallback; anything else (missing path, corrupt
    * footer, absent `ts` column) is a real error and must surface as
    * itself instead of resurfacing later as a confusing null-ts shape.
    */
  private def isNanosRejection(e: Throwable): Boolean = e match {
    case a: org.apache.spark.sql.AnalysisException =>
      val cond = Option(a.getCondition).getOrElse("")
      cond.contains("PARQUET_TYPE_ILLEGAL") || cond.contains("ILLEGAL_PARQUET_TYPE") ||
        Option(a.getMessage).exists(_.toLowerCase.contains("illegal parquet type"))
    case _ => false
  }

  /** events.parquet has shipped with `ts` in two encodings across
    * driver testdata generations: TIMESTAMP(NANOS), which Spark 4's
    * reader rejects outright ([PARQUET_TYPE_ILLEGAL]), and
    * TIMESTAMP(MICROS) without the UTC-adjusted flag (TIMESTAMP_NTZ to
    * Spark). Decide from the file FOOTER (schema inference throws on
    * nanos — never from the values, which would make the reader
    * data-dependent). Every branch is ZONE-INDEPENDENT — the data
    * contract is "naive wall clock == UTC instant" (the DuckDB oracle
    * reads naive timestamps as UTC), and none of the conversions below
    * consults spark.sql.session.timeZone:
    *   - TIMESTAMP_NTZ footer: read as NTZ and rebuild epoch micros
    *     from the wall-clock FIELDS (date/hour/minute/fractional
    *     second), which NTZ extraction defines without a zone. A plain
    *     NTZ→LTZ cast here would resolve through the session zone and
    *     shift every instant under a non-UTC driver session.
    *   - TIMESTAMP (LTZ) footer: the file stores UTC-adjusted instants;
    *     the native read is already zone-free.
    *   - nanos footer: raw INT64 + integer div — zone-free.
    */
  def readEvents(spark: SparkSession, sfDir: String): DataFrame = {
    val path = s"$sfDir/events.parquet"
    val footerTs: Option[DataType] =
      try Some(spark.read.parquet(path).schema("ts").dataType)
      catch { case e: Throwable if isNanosRejection(e) => None }
    footerTs match {
      case Some(TimestampNTZType) =>
        spark.read.schema(eventsNtzSchema).parquet(path)
          .withColumn("ts", timestamp_micros(
            expr("unix_date(CAST(ts AS DATE)) * CAST(86400000000 AS BIGINT)" +
              " + (hour(ts) * 3600 + minute(ts) * 60) * CAST(1000000 AS BIGINT)" +
              " + CAST(date_part('SECOND', ts) * 1000000 AS BIGINT)")))
          .select("event_id", "ts", "user_id", "event_type", "value", "props")
      case Some(_) =>
        spark.read.parquet(path)
          .withColumn("ts", col("ts").cast(TimestampType))
          .select("event_id", "ts", "user_id", "event_type", "value", "props")
      case None =>
        spark.read.schema(eventsSchema).parquet(path)
          .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    }
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
