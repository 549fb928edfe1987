package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — for each left row, the single most recent right
  * row at or before (non-strict) / strictly before (strict) the left
  * row's ordering value, within the same key group. The time-series
  * primitive Spark's built-in joins lack (pandas `merge_asof`, the
  * reference's "previous known state" lookups).
  *
  * Scale shape (the reason this is not a join): both sides union into
  * one stream tagged by side, ONE hash shuffle on the keys, and a
  * running `last(payload, ignoreNulls)` window carries the latest right
  * payload forward onto every left row. No range-bucketed join, no
  * per-row subquery, no explode of candidate windows — the cost is one
  * shuffle of |left| + |right| rows and a single ordered pass per key
  * partition, which is the floor for this semantics on any engine. A
  * range join would shuffle candidate *pairs*; this ships each row
  * exactly once.
  */
object AsOf {

  /** @param left     probe side; all its columns survive
    * @param right    reference side; must be unique on (keys, rightOn),
    *                 otherwise "the" latest row is ill-defined
    * @param keys     equi-join group (e.g. url)
    * @param leftOn   left ordering column (orderable type, e.g. day)
    * @param rightOn  right ordering column, same type as leftOn
    * @param payload  right columns to carry onto each left row; names
    *                 must not collide with left's columns
    * @param strict   true = match right rows with ts strictly before
    *                 the left ts ("previous state"); false = at-or-before
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftOn: String,
      rightOn: String,
      payload: Seq[String],
      strict: Boolean = false): DataFrame = {
    require(payload.intersect(left.columns.toSeq).isEmpty,
      s"payload ${payload.mkString(",")} collides with left columns")
    val leftRest = left.columns.toSeq.filterNot(keys.contains)
    // Side tag orders right rows BEFORE same-ts left rows for at-or-before
    // semantics, AFTER them for strictly-before — the running frame ends
    // at the current (left) row, so placement at equal ts decides whether
    // an equal-ts right row is visible.
    val rightSide = if (strict) 1 else -1
    val l = left.select(
      keys.map(col) ++
        Seq(col(leftOn).as("__t"), lit(0).as("__side")) ++
        leftRest.map(col) ++
        payload.map(p => lit(null).cast(right.schema(p).dataType).as(p)): _*)
    val r = right.select(
      keys.map(col) ++
        Seq(col(rightOn).as("__t"), lit(rightSide).as("__side")) ++
        leftRest.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        payload.map(col): _*)
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .select(
        (keys ++ leftRest).map(col) ++
          Seq(col("__side")) ++
          payload.map(p => last(col(p), ignoreNulls = true).over(w).as(p)): _*)
      .filter(col("__side") === 0)
      .drop("__side")
  }
}
