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

  // Innermost-first stack of active lexical scopes on this thread.
  // Plan construction (where persist() is called) is driver-side and
  // single-threaded per query, so a thread-local is the right owner.
  private val scopes =
    new ThreadLocal[List[java.util.concurrent.ConcurrentLinkedQueue[DataFrame]]] {
      override def initialValue: List[java.util.concurrent.ConcurrentLinkedQueue[DataFrame]] = Nil
    }

  /** Persist `df` (MEMORY_AND_DISK) and register it for scoped release:
    * into the innermost active [[withScope]] block if one is open on
    * this thread, else into the session-global registry drained by
    * [[releaseAll]].
    *
    * Consults the session cache registry first (`Dataset.storageLevel`
    * reads the CacheManager entry for this plan): if a plan-equal
    * entry ALREADY exists — the caller's own raw `.persist()` — our
    * persist would dedupe onto it, and a scope-exit unpersist would
    * evict the caller's entry too (eviction is by plan equality). Such
    * frames stay unregistered: they belong to whoever created them,
    * and within-scope reuse still hits the caller's cache entry.
    */
  def persist(df: DataFrame): DataFrame =
    if (df.storageLevel != StorageLevel.NONE) df
    else {
      val p = df.persist(StorageLevel.MEMORY_AND_DISK)
      scopes.get.headOption.getOrElse(registered).add(p)
      p
    }

  /** Run `body` with a fresh release scope: every [[persist]] issued
    * inside it (on this thread) is unpersisted when the block exits,
    * success or failure. This is how NON-harness callers — long-lived
    * library sessions that never call [[releaseAll]] — get the same
    * no-accumulation guarantee the Bench/Verify harnesses get, and how
    * an operator can drop its own heavyweight intermediates the moment
    * a cheap materialized artifact (e.g. a checkpointed edge list)
    * supersedes them, instead of holding storage memory until the whole
    * query finishes.
    *
    * External (raw `.persist()`) cache entries: one that exists BEFORE
    * the scoped operator persists a plan-equal frame is protected —
    * [[persist]] consults the session CacheManager and leaves
    * pre-existing entries unregistered, so scope exit never evicts
    * them. The one remaining gap is the REVERSE order: a caller who
    * raw-persists a plan-equal frame AFTER the scope already registered
    * its own dedupes onto the scope's cache entry, which scope exit
    * then drops (the CacheManager keeps one entry per plan, with no
    * owner count to consult). Callers mixing raw persists with scoped
    * operators should register those frames via [[persist]] instead.
    */
  def withScope[T](body: => T): T = {
    val q = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()
    scopes.set(q :: scopes.get)
    try body
    finally {
      scopes.set(scopes.get.tail)
      // `Dataset.unpersist` evicts from the CacheManager by PLAN
      // equality, not by Dataset identity — and operators deliberately
      // share cache entries across registrations (decontaminate's
      // shingles persist dedupes with the one nearDupPairs creates over
      // the same input). If a plan-equal frame is still registered in
      // the session-global queue or an outer scope, unpersisting ours
      // would silently evict theirs too, re-introducing exactly the
      // cross-operator recompute scoping exists to prevent — so those
      // frames are skipped here and released by their own owner.
      import scala.jdk.CollectionConverters._
      val survivors =
        (registered.iterator().asScala ++
          scopes.get.iterator.flatMap(_.iterator().asScala)).toVector
      var df = q.poll()
      while (df != null) {
        val d = df
        val sharedElsewhere = survivors.exists { s =>
          try s.queryExecution.analyzed.sameResult(d.queryExecution.analyzed)
          catch { case _: Throwable => false }
        }
        if (!sharedElsewhere) {
          try d.unpersist(blocking = false) catch { case _: Throwable => () }
        }
        df = q.poll()
      }
    }
  }

  /** Release ONE registered frame early — the operator knows at plan
    * time the persist bought nothing (e.g. a skew census that came back
    * empty) and drops it instead of holding cache until scope exit or
    * [[releaseAll]]. Deregisters from whichever queue owns it, then
    * unpersists unless a plan-equal frame is still registered elsewhere
    * (the same sharing rule [[withScope]] applies on exit).
    */
  def release(df: DataFrame): Unit = {
    registered.remove(df)
    scopes.get.foreach(_.remove(df))
    import scala.jdk.CollectionConverters._
    val survivors =
      (registered.iterator().asScala ++
        scopes.get.iterator.flatMap(_.iterator().asScala)).toVector
    val sharedElsewhere = survivors.exists { s =>
      try s.queryExecution.analyzed.sameResult(df.queryExecution.analyzed)
      catch { case _: Throwable => false }
    }
    if (!sharedElsewhere) {
      try df.unpersist(blocking = false) catch { case _: Throwable => () }
    }
  }

  /** Frames currently registered session-globally (not in any lexical
    * scope) — the leak-detection seam: a well-scoped operator call
    * leaves this unchanged.
    */
  private[graft] def registeredCount: Int = registered.size

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
