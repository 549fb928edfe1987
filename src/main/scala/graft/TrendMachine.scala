package graft

import graft.model.{ScoredRow, TrendQuery}
import graft.operators.{Daily, GapFill, Metrics, Report, Trend}
import org.apache.spark.sql.{DataFrame, Dataset}

/** The engine's public API (SURVEY §7.1 module 7) — what the
  * reference's `load_data` + report block (main.py:186-405) returns,
  * generalized per-url and lazy: every frame is a plan, nothing runs
  * until the caller acts on it.
  */
object TrendMachine {

  /** All result frames for one query over a capture set. */
  final case class TrendResult(
      daily: DataFrame,
      scored: Dataset[ScoredRow],
      transitions: DataFrame,
      headline: DataFrame)

  /** captures (url, ts, status, digest, seq) -> full result bundle.
    *
    * The daily table is the natural caching boundary (the reference's
    * load_cdx cache): callers re-running with new sigmoid parameters
    * should persist `daily` and call [[rescore]].
    */
  def run(captures: DataFrame, query: TrendQuery = TrendQuery()): TrendResult = {
    val daily = Daily.fromCaptures(captures)
    fromDaily(daily, query)
  }

  /** Warm path: re-parameterize from a (persisted) daily table without
    * re-running the capture scan and window stages.
    */
  def fromDaily(daily: DataFrame, query: TrendQuery): TrendResult = {
    val scored = Trend.runFromDaily(daily, query)
    val densified = GapFill.densify(
      GapFill.fill(daily, query.fill, query.policy), query.asOf)
    TrendResult(
      daily = daily,
      scored = scored,
      transitions = Report.transitions(densified),
      headline = Metrics.headline(scored.toDF()))
  }

  /** Alias for [[fromDaily]] matching the reference's warm-path naming. */
  def rescore(daily: DataFrame, query: TrendQuery): TrendResult = fromDaily(daily, query)
}
