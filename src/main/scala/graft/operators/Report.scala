package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Report-layer aggregations: the specimen transition matrix
  * (A11/A12/J4) over a densified day series.
  *
  * Reference: main.py:232-246. The reference walks the day-ordered rows
  * with a pointer `pr`; for each row `r` it increments
  * `trs[r.specimen][pr.specimen]` and advances `pr = r` — but the
  * increment is guarded by a caught KeyError, so rows whose specimen is
  * outside {2xx,3xx,4xx,5xx} are skipped WITHOUT advancing `pr`.
  * Consequences we replicate exactly:
  *
  *   - transitions are counted between consecutive VALID-specimen days
  *     (invalid days in between are transparent);
  *   - if the FIRST day's specimen is invalid, `pr` can never advance
  *     (the inner-dict lookup keeps raising), so the whole matrix stays
  *     all-zero — the "first-row deadlock" quirk;
  *   - absent transitions still appear with count 0 because the 4x4 grid
  *     is pre-initialized (main.py:233-237) — here an outer join against
  *     a broadcast 16-row grid (J4).
  *
  * In the melted frame (main.py:246) the OUTER dict key (current row's
  * specimen) becomes the column => Target, and the INNER key (previous)
  * becomes the index => Source. So src = previous day, tgt = current.
  *
  * Scale: one url-keyed window pass + a hash aggregate; the grid join
  * broadcasts 16 rows against the distinct-url set. No all-pairs work.
  */
object Report {

  val Classes: Seq[String] = Seq("2xx", "3xx", "4xx", "5xx")

  /** (url, src, tgt, cnt) — 16 rows per url. */
  def transitions(densified: DataFrame): DataFrame = {
    val spark = densified.sparkSession
    import spark.implicits._

    val wDay = Window.partitionBy("url").orderBy("day")
    val isValid = col("specimen").isin(Classes: _*)

    // First row's specimen per url decides the deadlock branch.
    val withFirst = densified
      .select(col("url"), col("day"), col("specimen"))
      .withColumn("first_spec", first("specimen").over(wDay))

    // Valid rows of non-deadlocked urls; lag over this filtered frame
    // pairs consecutive valid days (invalid days are transparent).
    val counts = withFirst
      .filter(isValid && col("first_spec").isin(Classes: _*))
      .withColumn("src", lag("specimen", 1).over(wDay))
      .filter(col("src").isNotNull)
      .groupBy(col("url"), col("src"), col("specimen").as("tgt"))
      .agg(count(lit(1)).as("cnt"))

    val grid = Classes
      .flatMap(s => Classes.map(t => (s, t)))
      .toDF("src", "tgt")
    val urls = densified.select("url").distinct()

    urls
      .crossJoin(broadcast(grid))
      .join(counts, Seq("url", "src", "tgt"), "left")
      .select(
        col("url"),
        col("src"),
        col("tgt"),
        coalesce(col("cnt"), lit(0L)).as("cnt"))
  }
}
