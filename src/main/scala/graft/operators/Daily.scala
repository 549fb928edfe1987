package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Capture-stream enrichment and the per-day aggregate table.
  *
  * Re-expresses the reference's single fused streaming pass
  * (reference: main.py:143-182) as declarative Spark stages:
  *
  *   - P3 status-class bucketing (main.py:147)
  *   - A4 digest-status imputation for revisit records (main.py:148-151)
  *   - W1/W2 chaos running + sliding windows (main.py:139-142,170-181)
  *   - A1 per-day status-class counts (main.py:162, archive.py:51-57)
  *   - A2 specimen argmax with first-wins tie-break (main.py:163-169)
  *   - A3 content change flag vs previous observed day (main.py:155,168)
  *
  * Shuffle layout (scale design): one shuffle keyed by (url, digest) for
  * the imputation window, one by (url) for the chaos windows, then a
  * partial-aggregated shuffle by (url, day). Per-URL data is bounded
  * (~3M captures max under the reference's page cap), so no key skew
  * beyond AQE's comfort zone; millions of URLs parallelize freely.
  */
object Daily {

  /** P3: `"2xx"` for "200" <= s <= "599" (LEXICOGRAPHIC string compare —
    * deliberately admits junk like "30x", reference main.py:147),
    * everything else passes through untouched.
    */
  def statusClass(s: Column): Column =
    when(s.between("200", "599"), concat(s.substr(1, 1), lit("xx"))).otherwise(s)

  /** Per-capture enrichment: status class, imputed status, day key,
    * digest prefix, chaos counters. Input: (url, ts, status, digest, seq).
    *
    * PRECONDITION: stream order == (ts, seq) order. The windows sort by
    * (ts, seq); the reference processes raw stream order and, on
    * out-of-order input, would re-flush a recurring day (overwriting the
    * earlier row, main.py:153-159) — pathological behavior we do not
    * replicate. The CDX server contract guarantees sorted input; `seq`
    * breaks same-second ties by stream position.
    */
  def enrich(captures: DataFrame): DataFrame = {
    // A4: a "-" (revisit) record inherits the status class last recorded
    // for the same FULL digest strictly earlier in the stream, else "~".
    // Order-sensitive: a "-" before its digest's first real status
    // resolves to "~" (reference main.py:148-151), hence a running
    // window, not a join against a digest-level aggregate.
    val wDig = Window
      .partitionBy("url", "digest")
      .orderBy("ts", "seq")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wUrl = Window.partitionBy("url").orderBy("ts", "seq")
    val wRun = wUrl.rowsBetween(Window.unboundedPreceding, 0)
    // W2: the reference's 1000-slot ring buffer works out to a window of
    // the last 999 transition indicators over a denominator of
    // min(1000, n) — an off-by-one we replicate for bit parity
    // (reference main.py:135,170-181).
    val wSlide = wUrl.rowsBetween(-998, 0)

    captures
      .withColumn("cls", statusClass(col("status")))
      .withColumn(
        "s",
        when(
          col("cls") === "-",
          coalesce(
            last(when(col("cls") =!= "-", col("cls")), ignoreNulls = true).over(wDig),
            lit("~")))
          .otherwise(col("cls")))
      .withColumn(
        "day",
        concat_ws("-", substring(col("ts"), 1, 4), substring(col("ts"), 5, 2), substring(col("ts"), 7, 2)))
      .withColumn("d8", substring(col("digest"), 1, 8))
      // W1: transition indicator; the first capture compares against "~"
      // so it always counts as one transition (reference main.py:141,172).
      .withColumn("chg", (col("s") =!= lag(col("s"), 1, "~").over(wUrl)).cast("long"))
      .withColumn("rs", count(lit(1)).over(wRun))
      .withColumn("us", sum(col("chg")).over(wRun))
      .withColumn("uw", sum(col("chg")).over(wSlide))
      .withColumn("chaos", col("us").cast("double") / col("rs"))
      .withColumn("chaosn", col("uw").cast("double") / least(lit(1000L), col("rs")))
      // A2 priority ladder STPR (reference main.py:134). Priority-0
      // statuses CAN become the specimen: the reference initializes the
      // per-day best priority to -1, so the day's first capture always
      // sets it (main.py:137,160,163-169).
      .withColumn(
        "priority",
        when(col("s") === "2xx", 4)
          .when(col("s") === "4xx", 3)
          .when(col("s") === "5xx", 2)
          .when(col("s") === "3xx", 1)
          .otherwise(0))
  }

  /** A1+A2+A3+chaos snapshot: collapse enriched captures to one row per
    * (url, day). Column layout matches [[graft.model.FilledRow]] minus
    * the fill-specific fields.
    */
  def daily(enriched: DataFrame): DataFrame = {
    val wDay = Window.partitionBy("url").orderBy("day")
    enriched
      .groupBy(col("url"), col("day"))
      .agg(
        // A1: counts of the four standard classes; junk classes are
        // silently dropped (reference archive.py:51-57).
        sum(when(col("s") === "2xx", 1L).otherwise(0L)).as("c2xx"),
        sum(when(col("s") === "3xx", 1L).otherwise(0L)).as("c3xx"),
        sum(when(col("s") === "4xx", 1L).otherwise(0L)).as("c4xx"),
        sum(when(col("s") === "5xx", 1L).otherwise(0L)).as("c5xx"),
        // A2: earliest capture of the highest-priority class wins
        // (strict ">" comparison = first-wins tie-break).
        min_by(
          struct(col("ts"), col("s"), col("d8")),
          struct((-col("priority")).as("np"), col("ts"), col("seq"))).as("spec"),
        // W1/W2 snapshot: chaos value after the day's LAST capture
        // (the reference flushes the previous day when the next day's
        // first capture arrives, main.py:153-159,179-182).
        max_by(struct(col("chaos"), col("chaosn")), struct(col("ts"), col("seq"))).as("chend"))
      .select(
        col("url"),
        col("day"),
        col("spec.ts").as("datetime"),
        col("c2xx"),
        col("c3xx"),
        col("c4xx"),
        col("c5xx"),
        col("spec.s").as("specimen"),
        col("spec.d8").as("digest"),
        col("chend.chaos").as("chaos"),
        col("chend.chaosn").as("chaosn"))
      // A3: vs previous OBSERVED day's specimen digest; first day lags
      // against "~" so it reads "Changed" (reference main.py:155,168).
      .withColumn(
        "content",
        when(col("digest") === lag(col("digest"), 1, "~").over(wDay), "Unchanged")
          .otherwise("Changed"))
  }

  /** Convenience: captures -> daily table. */
  def fromCaptures(captures: DataFrame): DataFrame = daily(enrich(captures))
}
