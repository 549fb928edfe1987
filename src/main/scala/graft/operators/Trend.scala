package graft.operators

import graft.model.{Capture, FilledRow, ScoredRow, TrendQuery}
import org.apache.spark.sql.{DataFrame, Dataset}

/** Public batch API: captures in, scored daily series out
  * (reference lifecycle: main.py:371, load_data at main.py:186-248).
  */
object Trend {

  /** Full pipeline in ONE url-keyed shuffle: each url's captures fold
    * through the fused daily pass (the same loop the reference runs,
    * main.py:143-182, shared with the streaming engine), then gap-fill +
    * densify + the sigmoid recurrence run in-memory on the ~11k-row day
    * series — no intermediate shuffles, no window sorts.
    *
    * The staged declarative pipeline ([[runStaged]]) is bit-identical
    * (both halves are oracle-verified independently); it remains the
    * right shape when the daily table is a persisted intermediate shared
    * across many downstream queries ([[runFromDaily]]). This path wins
    * when scoring straight from captures: per-url capture sets are
    * bounded (~3M under the reference's page cap) so the in-partition
    * fold is O(bounded), and millions of urls spread on the url hash.
    */
  def run(captures: DataFrame, query: TrendQuery): Dataset[ScoredRow] = {
    val spark = captures.sparkSession
    import spark.implicits._
    captures
      .select("url", "ts", "status", "digest", "seq")
      .as[Capture]
      .groupByKey(_.url)
      .flatMapGroups { (url, it) =>
        val observed = graft.streaming.Streaming.runBatch(url, it).map { d =>
          FilledRow(d.url, d.day, d.datetime, d.c2xx, d.c3xx, d.c4xx, d.c5xx,
            d.specimen, d.digest, d.content, Some(d.chaos), Some(d.chaosn))
        }.toArray
        Score.scoreObservedDaily(url, observed, query.fill, query.policy, query.params, query.asOf)
      }
  }

  /** The declarative staged pipeline: daily aggregation -> gap fill ->
    * densify+score. Same results as [[run]]; used when the daily table
    * should remain a Catalyst-visible (pushdown/prune-able) DataFrame.
    */
  def runStaged(captures: DataFrame, query: TrendQuery): Dataset[ScoredRow] =
    runFromDaily(Daily.fromCaptures(captures), query)

  /** Stage-split variant mirroring the reference's cache boundary
    * (main.py:129 vs 186): the daily table is the natural materialized
    * intermediate — persist it, then re-run only fill+score on
    * parameter changes.
    */
  def runFromDaily(dailyDf: DataFrame, query: TrendQuery): Dataset[ScoredRow] = {
    val filled = GapFill.fill(dailyDf, query.fill, query.policy)
    Score.scoreFilled(filled, query.params, query.asOf)
  }
}
