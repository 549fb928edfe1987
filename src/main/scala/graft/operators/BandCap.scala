package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-(band, key) bucket-size cap for banded LSH candidate joins.
  *
  * Every near-dup modality in the engine (text MinHash, SimHash,
  * embedding hyperplane, image/audio/video perceptual) generates
  * candidates with a self-equi-join on LSH band buckets. That join is
  * linear for non-pathological corpora, but one boilerplate mega-bucket
  * (the cookie banner every crawl carries, the all-black video lead-in)
  * makes a single (band, key) group quadratic: 10M members = 50
  * trillion candidate pairs in one reducer. At 100 TB that bucket is a
  * statistical certainty, so the candidate core needs a hard bound, not
  * a hope.
  *
  * The bound: buckets at or under `cap` pass untouched; a bucket above
  * `cap` keeps a deterministic hash-sample of ~`cap` members (each
  * member survives iff an md5-derived coin on (keys, member) modulo the
  * bucket size lands under `cap`), so the worst bucket contributes
  * O(cap²) pairs instead of O(n²). The trade is recall on mega-bucket
  * membership only — and a bucket that large is boilerplate whose
  * representative pairs are still found, while EXACT duplicates are
  * upstream's job ([[Dedup.exact]] hashes full content and never runs
  * through banding). Sampling is md5-deterministic so the DuckDB oracle
  * replays it bit-for-bit ([[graft.Oracle.capCte]] is the SQL twin).
  *
  * Scale shape: the bucket census is one map-side-combinable aggregate
  * whose output after the `> cap` filter is tiny (at most n/cap rows by
  * pigeonhole, in practice a handful), so the join back is a runtime
  * broadcast under AQE; the coin is evaluated only for rows in oversize
  * buckets. No sort, no per-bucket window — nothing that funnels a
  * mega-bucket through one task before the cap lands.
  */
object BandCap {

  /** Default member cap per (band, key) bucket. High enough that honest
    * near-dup buckets (tens of members) never see it; low enough that a
    * pathological bucket's pair count (~cap²/2 ≈ 32k) stays a rounding
    * error next to the corpus.
    */
  val DefaultCap = 256

  /** The md5 sampling coin over (keys..., member), a uniform value in
    * [0, 2^32) — `coin % bucket_n < cap` keeps ~cap of bucket_n members
    * (and everything when bucket_n <= cap, since the modulo is then
    * always under the cap).
    */
  def coin(keyCols: Seq[String], memberCol: String): Column = {
    val parts = (keyCols :+ memberCol).map(c => s"CAST($c AS STRING)").mkString(", ")
    expr(s"CAST(conv(substr(md5(concat_ws('|', $parts)), 1, 8), 16, 10) AS BIGINT)")
  }

  /** `rows` minus the hash-sampled overflow of every (keyCols) bucket
    * larger than `cap` — deterministic, oracle-replayable; see object
    * doc for the scale rationale.
    *
    * ONE data-independent plan: the census aggregate joins back as the
    * left side of a runtime-sized join, and the coin filter fires only
    * on rows whose bucket is oversize (the `isNull ||` short-circuit —
    * honest rows pay a null check, never an md5). On an honest corpus
    * the census output is EMPTY, so under AQE the join executes as a
    * broadcast of an empty relation — per-row cost ≈ zero — while a
    * skewed corpus broadcasts its handful of oversize buckets (at most
    * n/cap rows by pigeonhole; AQE decides from the ACTUAL census
    * size, so even an adversarial all-boilerplate corpus degrades to a
    * shuffled join instead of a driver OOM). The census is computed
    * IN-PLAN, exactly once per leg: callers embed the capped frame in
    * self-join sides, and the census's shuffle/broadcast exchange is
    * plan-identical on both sides, so exchange reuse dedupes it.
    *
    * Deliberately NO plan-time driver action and NO plan fork (the
    * earlier design probed the census eagerly with `isEmpty` and chose
    * a narrow plan for honest corpora): the eager probe ran a Spark
    * job at DataFrame-CONSTRUCTION time, froze the decision against
    * the data observed then (wrong for a source that grows a
    * mega-bucket between build and execution), and — when the cap
    * activated — paid the census twice, once in the probe and again
    * inside the join. The always-join plan is decided by the data each
    * run actually reads, costs one census always, and leaves honest
    * corpora with an empty-broadcast join that AQE makes free.
    * Batch-only: streaming paths bound their state in the fold
    * ([[graft.streaming.Streaming.bucketFold]]), never through here.
    */
  def capBuckets(
      rows: DataFrame,
      keyCols: Seq[String],
      memberCol: String,
      cap: Int = DefaultCap): DataFrame = {
    val over = rows
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("__bucket_n"))
      .filter(col("__bucket_n") > cap)
    rows
      .join(over, keyCols, "left")
      .filter(
        col("__bucket_n").isNull || coin(keyCols, memberCol) % col("__bucket_n") < cap)
      .drop("__bucket_n")
  }

  /** [[capBuckets]] as a FLAG instead of a filter: every row of `rows`
    * with a `kept` boolean recording whether the cap retains it — the
    * write-time face of the census. A stored signature base
    * ([[graft.sinks.Sinks.writeNearDupBase]]) materializes this flag
    * ONCE when the corpus is written, so every subsequent batch probe
    * reads a precomputed verdict (`WHERE kept`) instead of
    * re-aggregating the corpus census per probe — and keeps the FULL
    * row set on disk, which is what lets a later compaction recompute
    * the census over base ∪ segments without re-deriving signatures
    * from text. Same census join and md5 coin as [[capBuckets]], so
    * `flagBuckets(...).filter(kept)` ≡ `capBuckets(...)` row-for-row.
    */
  def flagBuckets(
      rows: DataFrame,
      keyCols: Seq[String],
      memberCol: String,
      cap: Int = DefaultCap): DataFrame = {
    val over = rows
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("__bucket_n"))
      .filter(col("__bucket_n") > cap)
    rows
      .join(over, keyCols, "left")
      .withColumn(
        "kept",
        col("__bucket_n").isNull || coin(keyCols, memberCol) % col("__bucket_n") < cap)
      .drop("__bucket_n")
  }

  /** The buckets [[capBuckets]] would sample: one row per (keyCols)
    * bucket above `cap` with its true size — the logged/reported
    * overflow census, so a capped run is never a silent truncation.
    */
  def overflowBuckets(
      rows: DataFrame,
      keyCols: Seq[String],
      cap: Int = DefaultCap): DataFrame =
    rows
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("bucket_n"))
      .filter(col("bucket_n") > cap)
}
