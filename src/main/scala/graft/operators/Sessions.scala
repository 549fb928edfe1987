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
  /** The ordered conversion funnel's step sequence: a user "converts"
    * through step i+1 only with an event STRICTLY after their first
    * qualifying step-i event. First-touch semantics — the funnel
    * timestamps are the earliest chain, not any chain.
    */
  val FunnelSteps: Seq[String] = Seq("view", "click", "purchase")

  /** Ordered funnel conversion — the other bread-and-butter event
    * analytic next to sessionization: per user, the earliest
    * view → click → purchase chain where each step happens strictly
    * after the previous step's earliest qualifying event.
    *
    * Spark-first shape: no self-joins (the naive three-way
    * events×events×events join explodes quadratically on active
    * users). Two running-min window passes over the SAME (user_id,
    * ordered by time) sort — Catalyst plans one exchange + one sort
    * and stacks both Window nodes on it — then one per-user aggregate.
    * Cost at 100 TB: a single user-keyed shuffle, linear in each
    * user's events, same bound as sessionize.
    *
    * Determinism: step qualification compares event-time micros
    * strictly (`run_min < us`), so rows tying on timestamp cannot
    * change the outcome whatever their sort order; the window
    * tie-break on event_id makes the intermediate frames themselves
    * stable too. Bounds are exact integer micros.
    */
  def funnel(events: DataFrame): DataFrame = {
    val runFrame = Window
      .partitionBy("user_id")
      .orderBy("us", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val e = events.select(
      col("user_id"),
      col("event_id"),
      unix_micros(col("ts")).as("us"),
      col("event_type"))
    val qualified = e
      .withColumn(
        "run_v",
        min(when(col("event_type") === FunnelSteps(0), col("us"))).over(runFrame))
      .withColumn(
        "q_click",
        when(col("event_type") === FunnelSteps(1) && col("run_v") < col("us"), col("us")))
      .withColumn("run_c", min(col("q_click")).over(runFrame))
      .withColumn(
        "q_pur",
        when(col("event_type") === FunnelSteps(2) && col("run_c") < col("us"), col("us")))
    qualified
      .groupBy("user_id")
      .agg(
        min(when(col("event_type") === FunnelSteps(0), col("us"))).as("step1_us"),
        min(col("q_click")).as("step2_us"),
        min(col("q_pur")).as("step3_us"))
      .withColumn(
        "steps_completed",
        when(col("step3_us").isNotNull, 3)
          .when(col("step2_us").isNotNull, 2)
          .when(col("step1_us").isNotNull, 1)
          .otherwise(0)
          .cast("int"))
      .select("user_id", "steps_completed", "step1_us", "step2_us", "step3_us")
  }

  /** First-order Markov transition matrix over each user's event
    * sequence: how often event type A is immediately followed by B
    * (within the same user's stream), with the row-normalized
    * probability — the user-journey read that powers "what happens
    * after an error" questions and next-event models.
    *
    * Scale shape: one user-keyed window (lag) — the only shuffle that
    * sees event volume — then a (prev, cur)-keyed count with map-side
    * combine into at most |types|² rows; the row totals are a window
    * over those few rows, not a second pass over events. Counts exact,
    * the one division rounds at 6.
    */
  def markovTransitions(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
    val counts = events
      .select(
        col("user_id"),
        col("event_id"),
        unix_micros(col("ts")).as("us"),
        col("event_type"))
      .withColumn("prev_type", lag("event_type", 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type").as("cur_type"))
      .agg(count(lit(1)).as("n"))
    counts
      .withColumn("n_prev", sum("n").over(Window.partitionBy("prev_type")))
      .withColumn("p", round(col("n").cast("double") / col("n_prev"), 6))
      .select("prev_type", "cur_type", "n", "n_prev", "p")
  }

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
