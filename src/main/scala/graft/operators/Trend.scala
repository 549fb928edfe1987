package graft.operators

import graft.model.{ScoredRow, TrendQuery}
import org.apache.spark.sql.{DataFrame, Dataset}

/** Public batch API: captures in, scored daily series out
  * (reference lifecycle: main.py:371, load_data at main.py:186-248).
  */
object Trend {

  /** Full pipeline: daily aggregation -> gap fill -> densify+score.
    * Single url-keyed shuffle downstream of the daily table.
    */
  def run(captures: DataFrame, query: TrendQuery): Dataset[ScoredRow] = {
    val dailyDf = Daily.fromCaptures(captures)
    val filled = GapFill.fill(dailyDf, query.fill, query.policy)
    Score.scoreFilled(filled, query.params, query.asOf)
  }

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
