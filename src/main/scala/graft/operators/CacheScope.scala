package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Registry for operator-internal persists, so a harness running many
  * queries in one session can release them between queries.
  *
  * Operators persist intermediates that feed several branches of their
  * own plan (shingles feeding both LSH and Jaccard-verify, the verified
  * pair set feeding the cluster iteration). Those persists are scoped to
  * the operator invocation — but `DataFrame.persist` has session
  * lifetime, so in a 60+-query session they accumulate and compete with
  * every later query's execution memory (the round-4 bench regressions).
  * Registering them here lets the harness (Bench/Verify) call
  * [[releaseAll]] after each query: within-query reuse is preserved,
  * cross-query accumulation is not.
  *
  * Long-lived pipelines that WANT cross-query reuse (the daily-table
  * cache mirrors the reference's load_cdx disk cache) keep their own
  * persists and are untouched by [[releaseAll]].
  */
object CacheScope {
  private val registered = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  /** Persist `df` (MEMORY_AND_DISK) and register it for scoped release. */
  def persist(df: DataFrame): DataFrame = {
    val p = df.persist(StorageLevel.MEMORY_AND_DISK)
    registered.add(p)
    p
  }

  /** Unpersist every registered frame (non-blocking). Safe at any point:
    * an unpersisted plan simply recomputes if referenced again.
    */
  def releaseAll(): Unit = {
    var df = registered.poll()
    while (df != null) {
      try df.unpersist(blocking = false) catch { case _: Throwable => () }
      df = registered.poll()
    }
  }
}
