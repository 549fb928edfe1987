package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Headline metrics (reference main.py:376-405): the six st.metric
  * values — captures/OK%, span/last-seen, gaps/filled, resilience+delta,
  * fixity/changed%, chaos/chaosn — generalized per-url, plus the `ymd`
  * duration formatter (P7, main.py:31-42) and URIM links (P5,
  * main.py:231).
  */
object Metrics {

  val WBM = "https://web.archive.org/web"

  /** P7: days -> "1y3m"-style duration with the reference's bespoke
    * rounding (365/30 divisors; whole-month rounding once the span
    * exceeds half a year; 12-month carry). Pure integer arithmetic so
    * the oracle SQL mirrors it expression-for-expression.
    */
  def ymd(days: Column): Column = {
    // floor() on both sides: DuckDB's double->int CAST rounds while
    // Spark's truncates, so the twins agree only via explicit floor.
    val y0 = floor(days / 365).cast("long")
    val r = days % 365
    val m0 = floor(r / 30).cast("long")
    val d0 = r % 30
    val cond1 = (y0 > 0) || (m0 > 6)
    val m1 = when(cond1 && d0 > 15, m0 + 1).otherwise(m0)
    val d1 = when(cond1, lit(0L)).otherwise(d0)
    val y2 = when(m1 === 12, y0 + 1).otherwise(y0)
    val m2 = when(m1 === 12, lit(0L)).otherwise(m1)
    concat(
      when(y2 > 0, concat(y2.cast("string"), lit("y"))).otherwise(""),
      when(m2 > 0, concat(m2.cast("string"), lit("m"))).otherwise(""),
      when(d1 > 0, concat(d1.cast("string"), lit("d"))).otherwise(""))
  }

  /** P12: URL scheme normalizer (reference main.py:588). */
  def normalizeUrl(url: Column): Column =
    when(url.startsWith("http://") || url.startsWith("https://"), url)
      .otherwise(concat(lit("https://"), url))

  /** P5: Wayback URIM link for a specimen capture. */
  def urim(datetime: Column, url: Column): Column =
    when(datetime =!= "~", format_string("%s/%s/%s", lit(WBM), datetime, url))
      .otherwise("#")

  /** Calendar-shape metrics per url over the densified table — the
    * score-free parts of the headline row (span, gaps, activity,
    * capture totals), all oracle-checkable.
    */
  def spanMetrics(densified: DataFrame, asOf: String): DataFrame =
    densified
      .groupBy("url")
      .agg(
        count(lit(1)).as("n_days"),
        sum(when(col("call") > 0, 1L).otherwise(0L)).as("n_active"),
        sum(when(col("filled"), 1L).otherwise(0L)).as("n_filled"),
        min("day").as("first_day"),
        max(when(col("call") > 0, col("day"))).as("last_active_day"),
        sum("call").as("captures"),
        round(sum("c2xx").cast("double") / sum("call") * 100, 6).as("ok_pct"),
        max_by(struct(col("datetime"), col("url").as("u")),
          when(col("call") > 0, col("day"))).as("last_spec"))
      .withColumn("n_gaps", col("n_days") - col("n_active"))
      .withColumn("inactive", datediff(to_date(lit(asOf)), to_date(col("last_active_day"))))
      .select(
        col("url"),
        col("n_days"),
        col("n_active"),
        col("n_filled"),
        col("n_gaps"),
        col("first_day"),
        col("last_active_day"),
        col("inactive").cast("long").as("inactive"),
        ymd(col("n_days")).as("span_ymd"),
        when(col("inactive") === 0, "Today").otherwise(ymd(col("inactive").cast("long"))).as("last_ymd"),
        col("captures"),
        col("ok_pct"),
        urim(col("last_spec.datetime"), col("url")).as("last_urim"))

  /** The full six-metric headline row per url (reference
    * main.py:393-405) over the scored series. Score columns make this
    * rows-only for the oracle; the score-free half is covered by
    * [[spanMetrics]].
    */
  def headline(scored: DataFrame): DataFrame = {
    val w = Window.partitionBy("url").orderBy("day")
    val wAll = Window.partitionBy("url")
    val last = scored
      .withColumn("prev_res", lag("resilience", 1, 0.5).over(w))
      .withColumn("rn_desc", row_number().over(Window.partitionBy("url").orderBy(col("day").desc)))
      .withColumn("n_days", count(lit(1)).over(wAll))
      .withColumn("n_active", sum(when(col("call") > 0, 1L).otherwise(0L)).over(wAll))
      .withColumn("n_filled", sum(when(col("filled"), 1L).otherwise(0L)).over(wAll))
      .withColumn("n_changed", sum(when(col("content") === "Changed", 1L).otherwise(0L)).over(wAll))
      .withColumn("captures", sum("call").over(wAll))
      .withColumn("ok", sum("c2xx").over(wAll))
      .filter(col("rn_desc") === 1)
    last.select(
      col("url"),
      col("day").as("last_day"),
      col("captures"),
      round(col("ok").cast("double") / col("captures") * 100, 6).as("ok_pct"),
      ymd(col("n_days")).as("span_ymd"),
      (col("n_days") - col("n_active")).as("n_gaps"),
      col("n_filled"),
      round(col("resilience"), 6).as("resilience"),
      round(col("resilience") - col("prev_res"), 6).as("res_delta"),
      round(col("fixity"), 6).as("fixity"),
      round(col("n_changed").cast("double") / col("n_active") * 100, 6).as("changed_pct"),
      round(col("chaos"), 6).as("chaos"),
      round(col("chaosn"), 6).as("chaosn"),
      urim(col("datetime"), col("url")).as("urim"))
  }

  /** Trailing-window length, minimum history, and z threshold for
    * [[dailyAnomalies]].
    */
  val AnomalyWin = 7
  val AnomalyMinWin = 3
  val AnomalyZ = 3L

  /** Capture-volume anomaly detection — the monitoring read on the
    * daily series: flag days whose capture count sits more than
    * [[AnomalyZ]] population standard deviations from the trailing
    * [[AnomalyWin]]-day mean (a crawl outage or a crawl storm). Cold
    * start: fewer than [[AnomalyMinWin]] trailing days never flags.
    *
    * Determinism: the window carries only exact integer sums (count,
    * Σx, Σx²), and the FLAG is pure integer arithmetic — z² > k² ⇔
    * dev² > k²·varnum with dev = x·n − Σx and varnum = n·Σx² − (Σx)²
    * (both longs) — so the decision never touches floating point. The
    * REPORTED mean and z are single divisions/sqrts of those exact
    * integers, IEEE-identical across engines, rounded at birth. A
    * zero-variance history reports z = 0 but still flags any deviation
    * (z is infinite there; the integer rule needs no limit).
    *
    * Scale shape: one shuffle on url (the window partition key), frames
    * bounded at [[AnomalyWin]] rows — no global window, no self-join;
    * per-url day counts are bounded (calendar length), so no skew.
    */
  def dailyAnomalies(daily: DataFrame): DataFrame = {
    val w = Window.partitionBy("url").orderBy("day").rowsBetween(-AnomalyWin, -1)
    daily
      .select(
        col("url"),
        col("day"),
        (col("c2xx") + col("c3xx") + col("c4xx") + col("c5xx")).as("call"))
      .withColumn("win_n", count(lit(1)).over(w))
      .withColumn("win_sum", coalesce(sum("call").over(w), lit(0L)))
      .withColumn("win_sumsq", coalesce(sum(col("call") * col("call")).over(w), lit(0L)))
      .withColumn("dev", col("call") * col("win_n") - col("win_sum"))
      .withColumn("varnum", col("win_n") * col("win_sumsq") - col("win_sum") * col("win_sum"))
      .withColumn(
        "win_mean",
        when(col("win_n") > 0, round(col("win_sum").cast("double") / col("win_n"), 6))
          .otherwise(0.0))
      .withColumn(
        "z",
        when(
          col("varnum") > 0,
          round(col("dev").cast("double") / sqrt(col("varnum").cast("double")), 6))
          .otherwise(0.0))
      .withColumn(
        "is_anomaly",
        col("win_n") >= AnomalyMinWin &&
          (col("dev") * col("dev") > lit(AnomalyZ * AnomalyZ) * col("varnum")))
      .select("url", "day", "call", "win_n", "win_mean", "z", "is_anomaly")
  }
}
