package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization of the event stream — the classic
  * clickstream/telemetry operator: consecutive events of one user
  * belong to one session while the gap between them stays under
  * [[SessionGapHours]]; a longer silence starts a new session.
  *
  * Spark-first shape: the grouping key IS Spark's native
  * `session_window(ts, gap)` — Catalyst's SessionWindow node with
  * merge-on-overlap semantics, usable identically in batch and
  * Structured Streaming (state store + watermark expiry on the stream
  * side, [[sessionizeStream]]). No self-join, no corpus-wide window:
  * the aggregation shuffles once on (user, session candidate) and the
  * in-partition session merge is linear in each user's events. The
  * only row-windowed step is the per-user session sequence number,
  * which runs over SESSION rows (dozens per user), not events.
  *
  * Determinism: session bounds are reported as the min/max event
  * timestamps in epoch micros (exact integers) — not the open
  * `window.end = last + gap` bound, which is a Spark-internal
  * convention a SQL oracle reproduces only by re-adding the gap.
  * `sum_value` goes through DECIMAL(18,2) so the sum is exact and
  * order-free.
  */
object Sessions {

  /** Session gap: a new session starts when a user is silent for MORE
    * than this long — an inter-event difference of exactly the gap
    * still merges (`session_window` treats a next event touching
    * `last + gap` as part of the session; pinned in SessionsSpec), so
    * the SQL twin breaks on `diff > gap`.
    */
  val SessionGapHours = 12

  /** The shared session aggregate — streaming-legal (no row windows):
    * one row per (user, session) with bounds, event count, and exact
    * value sum.
    */
  private def sessionAgg(events: DataFrame): DataFrame =
    events
      .groupBy(
        col("user_id"),
        session_window(col("ts"), s"$SessionGapHours hours").as("w"))
      .agg(
        count(lit(1)).as("n_events"),
        unix_micros(min(col("ts"))).as("start_us"),
        unix_micros(max(col("ts"))).as("end_us"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select("user_id", "start_us", "end_us", "n_events", "sum_value")

  /** Batch sessionization, plus the per-user session sequence number
    * (a window over session rows only — batch-side luxury the
    * streaming twin skips, since row windows are illegal on streams).
    */
  def sessionize(events: DataFrame): DataFrame =
    sessionAgg(events)
      .withColumn(
        "session_seq",
        row_number().over(Window.partitionBy("user_id").orderBy("start_us")))
      .select("user_id", "session_seq", "start_us", "end_us", "n_events", "sum_value")

  /** Streaming sessionization: the same plan over an unbounded source.
    * The watermark bounds session state — a session's window closes
    * (and its one result row emits, append mode) once the watermark
    * passes its end+gap, which is exactly when no future event can
    * merge into it.
    */
  def sessionizeStream(events: DataFrame, watermarkDelay: String): DataFrame =
    sessionAgg(events.withWatermark("ts", watermarkDelay))

  /** Cohort retention matrix — the product-analytics read on the event
    * stream: users cohort by first-active day; each (cohort_day,
    * day_offset) cell counts how many of that cohort were active
    * day_offset days later, with the percentage against the cohort's
    * size (its offset-0 cell — every user is active on their first
    * day by construction).
    *
    * Scale shape: the (user, day) distinct is one shuffle with map-side
    * combine; the cohort day is a per-user window min (user-keyed
    * shuffle — bounded rows per user, no skew); the cell aggregate
    * re-keys by (cohort, offset). Cohort sizes are one row per calendar
    * day — kilobytes — and join back by broadcast. Counts are exact
    * integers; the one division rounds at birth.
    */
  def retention(events: DataFrame): DataFrame = {
    val act = events
      .select(
        col("user_id"),
        date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"))
      .distinct()
    val withCohort = act
      .withColumn("cohort_day", min("day").over(Window.partitionBy("user_id")))
      .withColumn(
        "day_offset",
        datediff(to_date(col("day")), to_date(col("cohort_day"))).cast("long"))
    // rows are distinct (user, day), so each user hits a cell at most
    // once — count(*) IS the distinct-user count
    val cells = withCohort
      .groupBy("cohort_day", "day_offset")
      .agg(count(lit(1)).as("n_users"))
    val sizes = cells
      .filter(col("day_offset") === 0)
      .select(col("cohort_day"), col("n_users").as("n_cohort"))
    cells
      .join(broadcast(sizes), "cohort_day")
      .withColumn(
        "pct",
        round(col("n_users").cast("double") * 100 / col("n_cohort"), 6))
      .select("cohort_day", "day_offset", "n_users", "n_cohort", "pct")
  }
}
