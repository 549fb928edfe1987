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
    * Plan-time skew census + conditional sampling plan. Skew is the
    * EXCEPTION: on an honest corpus no bucket exceeds the cap, and the
    * right answer is the caller's original narrow plan — pipelined
    * self-join sides, no extra join. So the census runs ONCE here,
    * PERSISTED, and is probed with a driver-side `isEmpty` at
    * DataFrame-construction time; only when an oversize bucket EXISTS
    * does the sampling join enter the plan, and that join reads the
    * already-materialized census from cache — the census is never
    * aggregated twice, probe and plan share one computation.
    *
    * EAGER-ACTION / FROZEN-DECISION CONTRACT (deliberate): the probe
    * runs a Spark job when the plan is BUILT, and the narrow-vs-
    * sampling decision is frozen against the data observed then.
    * Callers must build and execute against the same immutable input
    * snapshot — the operator registry, the stored bases, and every
    * batch pipeline in this engine do (parquet snapshots, persisted
    * frames); a caller re-executing one built plan against a source
    * that has since grown a mega-bucket must rebuild the plan. The
    * data-independent alternative (always emit the sampling join, let
    * AQE broadcast the usually-empty census at runtime) was built and
    * measured: it re-plans correctly but costs ~25-30% per banded leg
    * in AQE stage latency at bench scale — a fixed per-stage price
    * that buys nothing on snapshot inputs. Streaming paths never come
    * through here; they bound state in the fold
    * ([[graft.streaming.Streaming.bucketFold]]).
    */
  def capBuckets(
      rows: DataFrame,
      keyCols: Seq[String],
      memberCol: String,
      cap: Int = DefaultCap): DataFrame = {
    val over = CacheScope.persist(
      rows
        .groupBy(keyCols.map(col): _*)
        .agg(count(lit(1)).as("__bucket_n"))
        .filter(col("__bucket_n") > cap))
    if (over.isEmpty) {
      // honest corpus: the census is empty and the sampling join never
      // enters the plan, so the just-persisted frame would sit in cache
      // until scope exit buying nothing — drop it now
      CacheScope.release(over)
      rows
    } else rows
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
