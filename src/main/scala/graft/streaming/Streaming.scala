package graft.streaming

import graft.model.{Capture, DimState, ScoredRow, SigParams, TrendQuery}
import graft.operators.GapFill
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** ST1: incremental daily aggregation as a stateful stream.
  *
  * The reference recomputes everything per run behind a 1h cache
  * (main.py:129,186); the streaming engine instead keys the capture
  * stream by url and holds the fused-pass loop state (main.py:131-142)
  * in `GroupState` — digest->status map, 1000-slot chaos ring buffer,
  * current-day accumulator — emitting a finalized [[DailyOut]] row
  * whenever a day closes, exactly like the reference's day flush
  * (main.py:153-159). Scoring stays a batch pass over the emitted daily
  * table (it re-bases on every parameter change anyway, mirroring the
  * reference's warm path).
  *
  * Ordering contract (ST3): rows are sorted by (ts, seq) within each
  * micro-batch; cross-batch order must be non-decreasing (CDX pagination
  * guarantees it at the source). A watermark + buffer would relax this;
  * the divergence window is documented in SURVEY §2.9.
  *
  * Scale: state per url is O(1) (bounded ring + digest map capped by
  * distinct digests per url); urls hash-partition across executors, the
  * same layout as the batch pipeline's groupBy(url).
  */
object Streaming {

  /** Finalized per-day row (pre-scoring). */
  case class DailyOut(
      url: String,
      day: String,
      datetime: String,
      c2xx: Long,
      c3xx: Long,
      c4xx: Long,
      c5xx: Long,
      specimen: String,
      digest: String,
      content: String,
      chaos: Double,
      chaosn: Double)

  /** Open-day accumulator (reference `dr` + `cp`). */
  case class DayAcc(
      day: String,
      datetime: String,
      c2xx: Long,
      c3xx: Long,
      c4xx: Long,
      c5xx: Long,
      specimen: String,
      digest: String,
      content: String,
      cp: Int)

  /** Full per-url loop state (reference main.py:131-142). */
  case class UrlState(
      digestStatus: Map[String, String],
      sw: Seq[String],
      pc: String,
      ps: String,
      rs: Long,
      us: Long,
      uw: Long,
      acc: Option[DayAcc])

  val SWS = 1000

  private def emptyState: UrlState =
    UrlState(Map.empty, Vector.fill(SWS)("~"), "~", "~", 0L, 0L, 0L, None)

  private val STPR = Map("2xx" -> 4, "4xx" -> 3, "5xx" -> 2, "3xx" -> 1)

  /** One capture through the fused pass; returns the flushed day, if a
    * day just closed.
    */
  /** Python-slice / SQL-substring tolerant slicing: out-of-range bounds
    * clamp to the string instead of throwing, so a junk short `ts` yields
    * a junk day string — the same tolerance as `Daily.enrich`'s SQL
    * substring and the reference's `ts[:4]` (main.py:146). Junk days
    * still refuse to SCORE (LocalDate.parse, like the reference's
    * pd.date_range) — the tolerance is about matching the daily table.
    */
  private def slice(s: String, from: Int, until: Int): String =
    s.substring(math.min(from, s.length), math.min(until, s.length))

  private def step(st: UrlState, c: Capture): (UrlState, Option[DailyOut]) = {
    val t = s"${slice(c.ts, 0, 4)}-${slice(c.ts, 4, 6)}-${slice(c.ts, 6, 8)}"
    val cls =
      if ("200" <= c.status && c.status <= "599") c.status.substring(0, 1) + "xx" else c.status
    val (s, digestStatus) =
      if (cls == "-") (st.digestStatus.getOrElse(c.digest, "~"), st.digestStatus)
      else (cls, st.digestStatus.updated(c.digest, cls))
    val d8 = c.digest.substring(0, math.min(8, c.digest.length))

    // day flush (reference main.py:153-159)
    val (flushed, pc, acc0) = st.acc match {
      case Some(a) if a.day != t =>
        val out = DailyOut(c.url, a.day, a.datetime, a.c2xx, a.c3xx, a.c4xx, a.c5xx,
          a.specimen, a.digest, a.content,
          st.us.toDouble / st.rs, st.uw.toDouble / math.min(SWS, st.rs))
        (Some(out), a.digest, DayAcc(t, "~", 0, 0, 0, 0, "~", "~", "Unknown", -1))
      case Some(a) => (None, st.pc, a)
      case None    => (None, st.pc, DayAcc(t, "~", 0, 0, 0, 0, "~", "~", "Unknown", -1))
    }

    val acc1 = s match {
      case "2xx" => acc0.copy(c2xx = acc0.c2xx + 1)
      case "3xx" => acc0.copy(c3xx = acc0.c3xx + 1)
      case "4xx" => acc0.copy(c4xx = acc0.c4xx + 1)
      case "5xx" => acc0.copy(c5xx = acc0.c5xx + 1)
      case _     => acc0
    }
    val pr = STPR.getOrElse(s, 0)
    val acc2 =
      if (pr > acc1.cp)
        acc1.copy(
          specimen = s, datetime = c.ts, digest = d8,
          content = if (d8 == pc) "Unchanged" else "Changed", cp = pr)
      else acc1

    // chaos counters + ring buffer (reference main.py:170-181)
    val wp = (st.rs % SWS).toInt
    val rs = st.rs + 1
    val (ps, us, uw0) =
      if (s != st.ps) (s, st.us + 1, st.uw + 1) else (st.ps, st.us, st.uw)
    val wrapped = ((wp - SWS + 1) % SWS + SWS) % SWS
    val uw = if (st.sw(wp) != st.sw(wrapped)) uw0 - 1 else uw0
    val sw = st.sw.updated(wp, s)

    (UrlState(digestStatus, sw, pc, ps, rs, us, uw, Some(acc2)), flushed)
  }

  /** Fold time-ordered captures through the daily loop, invoking
    * `onFlush` for each closed day — THE core shared by every batch and
    * streaming variant, so the fold semantics live in exactly one place.
    */
  private def foldSorted(start: UrlState, caps: Seq[Capture])(onFlush: DailyOut => Unit): UrlState = {
    var st = start
    caps.foreach { c =>
      val (next, flushed) = step(st, c)
      st = next
      flushed.foreach(onFlush)
    }
    st
  }

  private def timeOrdered(rows: IterableOnce[Capture]): Seq[Capture] =
    rows.iterator.toSeq.sortBy(c => (c.ts, c.seq))

  /** flatMapGroupsWithState body: fold the batch's (sorted) captures
    * through the loop state, emit closed days.
    */
  def processGroup(
      url: String,
      rows: Iterator[Capture],
      state: GroupState[UrlState]): Iterator[DailyOut] = {
    val out = Vector.newBuilder[DailyOut]
    val st = foldSorted(state.getOption.getOrElse(emptyState), timeOrdered(rows))(out += _)
    state.update(st)
    out.result().iterator
  }

  /** Wire a capture stream into the incremental daily table. */
  def dailyStream(captures: Dataset[Capture]): Dataset[DailyOut] = {
    val spark = captures.sparkSession
    import spark.implicits._
    captures
      .groupByKey(_.url)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(processGroup)
  }

  /** ST3: late/out-of-order tolerant variant. Incoming rows are held in
    * a per-url buffer and only folded through the (order-sensitive) loop
    * once the event-time watermark has passed them — any row arriving
    * within the lateness bound lands in its correct stream position;
    * rows later than the bound are dropped by the watermark upstream.
    * This defines the semantics the reference leaves undefined (its
    * algorithm silently corrupts on unsorted input, SURVEY §2.9 ST3).
    */
  case class LateState(pending: Seq[Capture], core: UrlState)

  /** Parse ts in the SAME zone `to_timestamp` used to derive the
    * watermark column (the session timezone) — a hard-coded UTC here
    * would release rows up to a zone-offset early on non-UTC sessions,
    * letting in-bound stragglers corrupt the order-sensitive fold.
    */
  private[streaming] def tsMillis(ts: String, zone: java.time.ZoneId): Long =
    java.time.LocalDateTime
      .parse(ts, java.time.format.DateTimeFormatter.ofPattern("yyyyMMddHHmmss"))
      .atZone(zone).toInstant.toEpochMilli

  /** Split (pending ∪ batch) into the watermark-released prefix and the
    * new hold-back buffer. STRICT <: Spark's late-data filter keeps rows
    * with event time >= watermark, so a row at exactly the watermark can
    * still arrive in a later batch — folding its equal-timestamp peers
    * now would break (ts, seq) order.
    */
  private def release(
      pending: Seq[Capture],
      batch: Iterator[Capture],
      zone: java.time.ZoneId,
      wm: Long): (Seq[Capture], Seq[Capture]) =
    timeOrdered(pending.iterator ++ batch).partition(c => tsMillis(c.ts, zone) < wm)

  def processGroupLate(zone: java.time.ZoneId)(
      url: String,
      rows: Iterator[Capture],
      state: GroupState[LateState]): Iterator[DailyOut] = {
    val st = state.getOption.getOrElse(LateState(Vector.empty, emptyState))
    val (ready, hold) = release(st.pending, rows, zone, state.getCurrentWatermarkMs())
    val out = Vector.newBuilder[DailyOut]
    val core = foldSorted(st.core, ready)(out += _)
    state.update(LateState(hold, core))
    out.result().iterator
  }

  /** Watermarked stream: tolerate up to `lateness` of event-time
    * disorder. The watermark both bounds the hold-back buffer and drops
    * too-late rows before they can corrupt the order-sensitive fold.
    */
  /** The watermark scaffold shared by both late-data variants: resolve
    * the session zone (the hold-back predicate MUST use the same zone
    * `to_timestamp` derives event time in — see [[tsMillis]]) and attach
    * the watermark. Keeping this in one place keeps the zone contract
    * in one place.
    */
  private def withEventTimeWatermark(
      captures: Dataset[Capture],
      lateness: String): (java.time.ZoneId, Dataset[CaptureWithTime]) = {
    val spark = captures.sparkSession
    import spark.implicits._
    val zone = java.time.ZoneId.of(
      spark.conf.get("spark.sql.session.timeZone", java.util.TimeZone.getDefault.getID))
    val ds = captures
      .withColumn("event_time", to_timestamp(col("ts"), "yyyyMMddHHmmss"))
      .withWatermark("event_time", lateness)
      .as[CaptureWithTime]
    (zone, ds)
  }

  def dailyStreamWatermarked(captures: Dataset[Capture], lateness: String): Dataset[DailyOut] = {
    val spark = captures.sparkSession
    import spark.implicits._
    val (zone, ds) = withEventTimeWatermark(captures, lateness)
    val process = processGroupLate(zone) _
    ds.groupByKey(_.url)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        (url: String, rows: Iterator[CaptureWithTime], state: GroupState[LateState]) =>
          process(url, rows.map(_.toCapture), state))
  }

  case class CaptureWithTime(
      url: String,
      ts: String,
      status: String,
      digest: String,
      seq: Long,
      event_time: java.sql.Timestamp) {
    def toCapture: Capture = Capture(url, ts, status, digest, seq)
  }

  // ------------------------------------------------------------ ST1 full
  /** Recurrence state carried between closed days: the two sigmoid
    * dimensions plus the last scored day's (day, specimen, chaos) — all
    * the incremental scorer needs to fill and score the next span.
    */
  case class ScoreCore(
      res: DimState,
      fix: DimState,
      lastDay: String,
      lastSpec: String,
      chaos: Double,
      chaosn: Double)

  /** Full incremental-pipeline state: daily fold + recurrence. */
  case class ScoredState(core: UrlState, score: Option[ScoreCore])

  /** Score one newly closed day: first the interior gap days since the
    * previous closed day (gap-filled per policy via [[GapFill.fillDays]],
    * unfilled days densify to "~"; chaos inherits the previous observed
    * day, reference main.py:199-207), then the day itself. Emitted rows
    * are exactly the batch scored table's rows for those days — the
    * recurrence is forward-only, so a closed prefix never changes.
    *
    * Days AFTER `query.asOf` neither emit nor advance the recurrence:
    * the batch calendar ends at asOf (reference main.py:199), so scoring
    * past it would diverge from the batch table and its oracle. The
    * fill endpoints still track the real observed days (lastDay may
    * exceed asOf) so gap arithmetic stays correct.
    */
  private def scoreClosedDay(
      url: String,
      prev: Option[ScoreCore],
      d: DailyOut,
      query: TrendQuery): (ScoreCore, Vector[ScoredRow]) = {
    def p(key: String, dflt: String): SigParams =
      query.params.getOrElse(key, query.params(dflt))
    val out = Vector.newBuilder[ScoredRow]
    var res = prev.map(_.res).getOrElse(DimState.resilienceInit)
    var fix = prev.map(_.fix).getOrElse(DimState.fixityInit)
    prev.foreach { pc =>
      val pd = java.time.LocalDate.parse(pc.lastDay)
      val gap = java.time.temporal.ChronoUnit.DAYS
        .between(pd, java.time.LocalDate.parse(d.day)) - 1
      if (gap > 0) {
        val fills = GapFill
          .fillDays(Vector((pc.lastDay, pc.lastSpec), (d.day, d.specimen)), query.fill, query.policy)
          .toMap
        var pos = 0L
        var within = true
        while (pos < gap && within) {
          val day = pd.plusDays(pos + 1).toString
          if (day > query.asOf) within = false
          else {
            val spec = fills.getOrElse(day, "~")
            res = res.step(spec, p(spec, "~"))
            fix = fix.step("Unknown", p("Unknown", "Unknown"))
            out += ScoredRow(url, day, "~", 0, 0, 0, 0, 0, spec, spec != "~",
              res.h, "~", "Unknown", fix.h, pc.chaos, pc.chaosn)
            pos += 1
          }
        }
      }
    }
    if (d.day <= query.asOf) {
      res = res.step(d.specimen, p(d.specimen, "~"))
      fix = fix.step(d.content, p(d.content, "Unknown"))
      val call = d.c2xx + d.c3xx + d.c4xx + d.c5xx
      out += ScoredRow(url, d.day, d.datetime, d.c2xx, d.c3xx, d.c4xx, d.c5xx, call,
        d.specimen, d.specimen != "~" && call == 0, res.h, d.digest, d.content,
        fix.h, d.chaos, d.chaosn)
    }
    (ScoreCore(res, fix, d.day, d.specimen, d.chaos, d.chaosn), out.result())
  }

  /** Routes closed days through [[scoreClosedDay]], accumulating emitted
    * rows and the recurrence state — the one scoring sink every scored
    * variant (streamed, watermarked, bounded) plugs into [[foldSorted]].
    *
    * Junk days (unparseable as ISO dates — possible because the daily
    * fold deliberately tolerates junk timestamps) are SKIPPED here
    * without touching the recurrence state: they exist in the daily
    * stream but have no calendar position to score. Storing one in
    * `ScoreCore.lastDay` would poison the checkpoint — every later
    * batch would throw on `LocalDate.parse` and the stream could never
    * recover. Same drop rule as the batch scorer
    * ([[graft.operators.Score]]).
    */
  private final class ScoringSink(url: String, query: TrendQuery, init: Option[ScoreCore]) {
    private var scoreState = init
    private val rows = Vector.newBuilder[ScoredRow]
    def onFlush(d: DailyOut): Unit = {
      if (graft.operators.Score.parseDay(d.day).isEmpty) return
      val (sc, emitted) = scoreClosedDay(url, scoreState, d, query)
      scoreState = Some(sc)
      emitted.foreach(rows += _)
    }
    def score: Option[ScoreCore] = scoreState
    def result: Vector[ScoredRow] = rows.result()
  }

  /** ST1 in full: captures stream in, SCORED daily rows stream out — the
    * whole reference pipeline (daily fold + gap fill + densify + sigmoid
    * recurrence) as one stateful stage. A day's scores emit the moment
    * the day closes; the batch pipeline over the same captures produces
    * an identical prefix (see StreamingSpec), so consumers can switch
    * between the two freely. Same ordering contract as [[dailyStream]].
    */
  def scoredStream(captures: Dataset[Capture], query: TrendQuery): Dataset[ScoredRow] = {
    val spark = captures.sparkSession
    import spark.implicits._
    captures
      .groupByKey(_.url)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (url: String, rows: Iterator[Capture], state: GroupState[ScoredState]) =>
          val st = state.getOption.getOrElse(ScoredState(emptyState, None))
          val sink = new ScoringSink(url, query, st.score)
          val core = foldSorted(st.core, timeOrdered(rows))(sink.onFlush)
          state.update(ScoredState(core, sink.score))
          sink.result.iterator
      }
  }

  /** Watermarked scored-stream state: hold-back buffer + daily fold +
    * recurrence.
    */
  case class ScoredLateState(pending: Seq[Capture], core: UrlState, score: Option[ScoreCore])

  /** ST1 + ST3 combined: the full incremental pipeline under an
    * event-time watermark. Rows within the lateness bound are buffered
    * per url and folded in correct (ts, seq) position once the watermark
    * passes them; rows beyond the bound are dropped upstream — the same
    * hold-back contract as [[dailyStreamWatermarked]], extended through
    * scoring.
    */
  def scoredStreamWatermarked(
      captures: Dataset[Capture],
      query: TrendQuery,
      lateness: String): Dataset[ScoredRow] = {
    val spark = captures.sparkSession
    import spark.implicits._
    val (zone, ds) = withEventTimeWatermark(captures, lateness)
    ds.groupByKey(_.url)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (url: String, rows: Iterator[CaptureWithTime], state: GroupState[ScoredLateState]) =>
          val st = state.getOption.getOrElse(ScoredLateState(Vector.empty, emptyState, None))
          val (ready, hold) =
            release(st.pending, rows.map(_.toCapture), zone, state.getCurrentWatermarkMs())
          val sink = new ScoringSink(url, query, st.score)
          val core = foldSorted(st.core, ready)(sink.onFlush)
          state.update(ScoredLateState(hold, core, sink.score))
          sink.result.iterator
      }
  }

  /** ST2 as a true stream: event-time tumbling 1-day windows with a
    * watermark (the batch analog is Queries.eventDailyWindows — same
    * output shape). Append mode emits a window only once the watermark
    * passes its end, so every emitted row is final — a windowed
    * aggregation needs no custom state at all, exactly why it stays a
    * declarative groupBy(window(...)) and not flatMapGroupsWithState.
    * Input: (ts TIMESTAMP, event_type STRING, value DOUBLE).
    *
    * Day-bucket contract: `window()` aligns to the epoch (UTC), while
    * the batch analog's `date_trunc` follows the session timezone — the
    * two agree under a UTC session, which is the engine default (set in
    * every entry point); non-UTC sessions shift which wall-clock day an
    * event lands in.
    */
  def eventDailyWindowStream(
      events: org.apache.spark.sql.DataFrame,
      lateness: String): org.apache.spark.sql.DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd").as("day"),
        col("event_type"), col("n"), col("sum_value"))

  /** The scored stream's fold over one url's bounded capture set with a
    * final flush — the batch harness giving the incremental scorer an
    * oracle-checkable row set: the scored table restricted to observed
    * days no later than `query.asOf` (the stream's closed prefix after
    * the last day flushes).
    */
  def runBatchScored(
      url: String,
      rows: Iterator[Capture],
      query: TrendQuery): Iterator[ScoredRow] = {
    val sink = new ScoringSink(url, query, None)
    val st = foldSorted(emptyState, timeOrdered(rows))(sink.onFlush)
    finalizeDay(url, st).foreach(sink.onFlush)
    sink.result.iterator
  }

  /** Run the exact streaming fold over one url's bounded capture set and
    * close the final day — the batch harness for the streaming code
    * path, giving it an oracle-checkable correctness row identical to
    * the batch daily table.
    */
  def runBatch(url: String, rows: Iterator[Capture]): Iterator[DailyOut] = {
    val out = Vector.newBuilder[DailyOut]
    val st = foldSorted(emptyState, timeOrdered(rows))(out += _)
    finalizeDay(url, st).foreach(out += _)
    out.result().iterator
  }

  /** Batch-mode flush: finalize every url's open day from the state the
    * stream would hold — used by the equivalence test to close the books.
    */
  def finalizeDay(url: String, st: UrlState): Option[DailyOut] =
    st.acc.map { a =>
      DailyOut(url, a.day, a.datetime, a.c2xx, a.c3xx, a.c4xx, a.c5xx,
        a.specimen, a.digest, a.content,
        st.us.toDouble / st.rs, st.uw.toDouble / math.min(SWS, st.rs))
    }

  // ----------------------------------------------------- streaming dedup
  /** (doc_id, content-hash) pair entering the dedup stream. */
  case class DocKeyed(doc_id: Long, h: String)

  /** Dedup verdict: `canonical` is the hash group's keeper. */
  case class DedupOut(doc_id: Long, h: String, canonical: Long, is_dup: Boolean)

  /** The per-hash dedup fold shared by the stream and its batch
    * harness: the first arrival claims the hash, everything after is a
    * duplicate. `prior` is the already-claimed canonical, if any.
    */
  private def dedupFold(rows: Iterator[DocKeyed], prior: Option[Long]): (Long, Vector[DedupOut]) = {
    val sorted = rows.toSeq.sortBy(_.doc_id)
    val canonical = prior.getOrElse(sorted.head.doc_id)
    (canonical, sorted.iterator.map(d =>
      DedupOut(d.doc_id, d.h, canonical, d.doc_id != canonical)).toVector)
  }

  /** Streaming exact dedup — the ingest-pipeline stage that drops
    * already-seen content as documents arrive: stream keyed by
    * `md5(text)`, first-seen doc claims the hash, later arrivals emit
    * as duplicates of it. State per hash is ONE long (the canonical
    * id), hash-partitioned across executors — the smallest possible
    * state for exact dedup, and the reason this scales to an unbounded
    * crawl where a batch groupBy cannot even start until the scan ends.
    *
    * Ordering: within a micro-batch, rows fold in doc_id order (so a
    * batch containing a whole group picks the same canonical as the
    * batch operator [[graft.operators.Dedup.exact]]); across batches,
    * first-ARRIVAL wins — the streaming-native semantics, since a
    * stream cannot know a smaller id arrives tomorrow. The batch
    * harness [[runBatchDedup]] closes over a bounded input, where the
    * two definitions coincide.
    */
  def dedupStream(docs: org.apache.spark.sql.DataFrame): Dataset[DedupOut] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), md5(col("text")).as("h")).as[DocKeyed]
      .groupByKey(_.h)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (h: String, rows: Iterator[DocKeyed], state: GroupState[Long]) =>
          val (canonical, out) = dedupFold(rows, state.getOption)
          state.update(canonical)
          out.iterator
      }
  }

  /** Ingest-time dedup against the PERSISTED corpus: each arriving
    * document's fingerprint probes the bucketed base table AND its
    * delta segments ([[graft.sinks.Sinks.appendDedupDelta]]) via a
    * stream-static join — the production front door of incremental
    * dedup, where "have we ever crawled this?" must answer against
    * the full historical corpus, not just this stream's state
    * ([[dedupStream]] covers the within-stream face; compose both
    * for the complete ingest verdict).
    *
    * Scale shape: the stream side is batch-sized per trigger and
    * hashes into the static side's bucketing (the base never
    * re-shuffles); the segment probe is a broadcast of
    * batch-sized fingerprints. Crash states of an interrupted
    * compaction read correctly ([[graft.sinks.Sinks.dedupBaseState]]).
    *
    * OPERATIONAL CONTRACT — the base view is resolved ONCE at stream
    * start: a [[graft.sinks.Sinks.compactDedupBase]] (or a writer's
    * crash repair) that runs while this stream is live renames/drops
    * the resolved base and segment tables out from under the running
    * plan, failing subsequent micro-batches. Run compactions between
    * ingest sessions, exactly the
    * [[graft.sinks.Sinks.appendAnnIndex]] discipline; construction
    * fails fast with a named error when the base is already missing
    * (rather than an opaque mid-stream AnalysisException), and a
    * mid-stream disappearance surfaces as the micro-batch error
    * naming the vanished table.
    *
    * The expression tree is input-agnostic: over a bounded batch frame
    * it IS the dup_of_base face of
    * [[graft.operators.Dedup.incrementalDedupStored]] (spec-pinned),
    * which is what gives the stream an oracle-checkable twin.
    */
  def dedupStoredStream(
      docs: org.apache.spark.sql.DataFrame, table: String): org.apache.spark.sql.DataFrame = {
    val spark = docs.sparkSession
    val (baseTable, _) = graft.sinks.Sinks.dedupBaseState(spark, table)
    if (!spark.catalog.tableExists(baseTable))
      throw new IllegalStateException(
        s"dedup base '$table' does not exist (no '$baseTable' in the catalog) — " +
          "write it with Sinks.writeDedupBase before starting the ingest stream")
    val baseFps = spark.table(baseTable)
      .select("fp").distinct().withColumn("in_base", lit(true))
    val probed = docs.select(col("doc_id"), md5(col("text")).as("fp"))
      .join(baseFps, Seq("fp"), "left")
    val withSeg = graft.sinks.Sinks.dedupSegmentFps(spark, table) match {
      case Some(segFps) => probed.join(broadcast(segFps), Seq("fp"), "left")
      case None => probed.withColumn("in_seg", lit(null).cast("boolean"))
    }
    withSeg.select(
      col("doc_id"),
      col("fp"),
      (coalesce(col("in_base"), lit(false)) || coalesce(col("in_seg"), lit(false)))
        .as("dup_of_base"))
  }

  /** The COMPLETE ingest loop [[dedupStoredStream]] only reads for:
    * each micro-batch verdicts against base ∪ segments
    * ([[graft.operators.Dedup.incrementalDedupStored]]), hands the
    * NOVEL documents to `onKept` (the pipeline's corpus write), and
    * appends their fingerprints as the batch's own delta segment
    * ([[graft.sinks.Sinks.appendDedupDelta]]) — so the NEXT batch
    * dedups against everything this one admitted, without waiting
    * for a compaction. The segment-stamped delta layout is what makes
    * this safe to run while a compaction folds older segments.
    *
    * Delivery semantics: foreachBatch is at-least-once — a crashed
    * batch re-runs, and its re-appended fingerprints land as a
    * SECOND segment holding the same fps. That is harmless by
    * construction (the probe reads DISTINCT fps; the fold unions),
    * but `onKept` sees the batch again — give it an idempotent write
    * (overwrite-by-batch-id, the usual foreachBatch discipline).
    * Run [[graft.sinks.Sinks.compactDedupBase]] between ingest
    * sessions, as [[dedupStoredStream]] documents.
    */
  def dedupIngestLoop(
      docs: org.apache.spark.sql.DataFrame,
      table: String,
      checkpoint: String,
      onKept: (org.apache.spark.sql.DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val verdict = graft.operators.Dedup
          .incrementalDedupStored(spark, table, batch)
          .filter(col("is_new"))
          .select("doc_id")
        val kept = batch.join(verdict, "doc_id")
        // persist: kept feeds BOTH the pipeline write and the segment
        // append — without it the verdict joins run twice per batch
        val k = kept.persist()
        try {
          onKept(k, batchId)
          if (!k.isEmpty) graft.sinks.Sinks.appendDedupDelta(k, table)
        } finally {
          k.unpersist(blocking = false)
          ()
        }
      }
      .outputMode("update")
      .start()

  /** The END-TO-END continuous-ingest loop for the VECTOR serving
    * stack — [[dedupIngestLoop]]'s shape on the ANN tier: each vector
    * micro-batch (1) lands in the raw-vector store (rebuilds need raw
    * embeddings — quantized codes are not invertible), (2) enters the
    * IVF index's delta lifecycle via
    * [[graft.sinks.Sinks.upsertAnnIndex]] (encoded against the frozen
    * geometry; latest copy wins), and (3) runs the graph tier's
    * cadence check ([[graft.sinks.Sinks.maybeRebuildHnswIndex]]) — so
    * the rebuild-only HNSW index follows the stream automatically:
    * quiet below the drift threshold (the check is metadata + delta
    * reads, never an index scan), exactly one rebuild+flip when
    * ingest pushes live-vs-served drift past it, self-disarming after
    * the flip.
    *
    * Delivery semantics: foreachBatch is at-least-once, and every
    * step tolerates a re-run — the upsert is idempotent on the live
    * set (the re-run's tombstone + same-segment rows reproduce the
    * same live copies), the store append lands duplicate rows that
    * the latest-wins resolution below collapses, and a duplicate
    * cadence check is a no-op once the flip disarmed it. The raw
    * store stamps each row with its micro-batch id; the canonical
    * vector set handed to a rebuild is the per-id argmax over
    * batch_id — latest-wins, so a re-ingested id rebuilds with its
    * newest embedding. That resolution shuffles the store ONLY when a
    * rebuild actually fires (the frame is lazy; the no-op path never
    * executes it).
    *
    * Run [[graft.sinks.Sinks.compactAnnIndex]] between ingest
    * sessions (each micro-batch adds a delta segment — the
    * [[graft.sinks.Sinks.appendAnnIndex]] discipline); `onRebuild`
    * fires with the triggering batch id, the observability hook the
    * spec pins exactly-one on.
    *
    * SEEDING CONTRACT: `vecStorePath` must start with the raw vectors
    * of everything the IVF index already holds (stamp them
    * `batch_id = -1`) — a rebuild serves exactly the canonical store,
    * so a store missing the initial corpus would silently shrink the
    * graph at the first flip ([[graft.sinks.Sinks.writeHnswIndex]]
    * has no id-coverage guard; it builds what it is given).
    */
  def annIngestWithCadence(
      vecs: org.apache.spark.sql.DataFrame,
      ivfPath: String,
      hnswPath: String,
      vecStorePath: String,
      checkpoint: String,
      driftFraction: Double = graft.sinks.Sinks.HnswRebuildDriftFraction,
      onRebuild: Long => Unit = _ => ())
      : org.apache.spark.sql.streaming.StreamingQuery =
    vecs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        // At-least-once inputs can repeat a vec_id WITHIN one trigger;
        // the upsert contract is one row per id (duplicates would land
        // at the SAME delta segment, where the tombstone hides neither
        // copy — both would stay live). Collapse deterministically:
        // identical redeliveries (the common case) coalesce to their
        // single row, and a genuine same-trigger double update resolves
        // by embedding-hash order, not partition luck.
        val dupW = org.apache.spark.sql.expressions.Window
          .partitionBy("vec_id").orderBy(xxhash64(col("embedding")).desc)
        val b = batch.select(col("vec_id"), col("embedding"))
          .withColumn("__rn", row_number().over(dupW))
          .filter(col("__rn") === 1).drop("__rn")
          .persist()
        try {
          if (!b.isEmpty) {
            b.withColumn("batch_id", lit(batchId))
              .write.mode("append").parquet(vecStorePath)
            graft.sinks.Sinks.upsertAnnIndex(spark, ivfPath, b)
          }
          val fs = new org.apache.hadoop.fs.Path(vecStorePath)
            .getFileSystem(spark.sparkContext.hadoopConfiguration)
          if (fs.exists(new org.apache.hadoop.fs.Path(vecStorePath))) {
            // same-batch_id ties (a retried batch re-appending its rows)
            // break on the embedding hash — the same determinism rule as
            // the in-batch collapse above
            val w = org.apache.spark.sql.expressions.Window
              .partitionBy("vec_id")
              .orderBy(col("batch_id").desc, xxhash64(col("embedding")).desc)
            val canonical = spark.read.parquet(vecStorePath)
              .withColumn("rn", row_number().over(w))
              .filter(col("rn") === 1)
              .select("vec_id", "embedding")
            if (graft.sinks.Sinks.maybeRebuildHnswIndex(
                spark, ivfPath, hnswPath, canonical, driftFraction))
              onRebuild(batchId)
          }
        } finally {
          b.unpersist(blocking = false)
          ()
        }
      }
      .outputMode("update")
      .start()

  /** The dedup stream's fold over one bounded hash group — the batch
    * harness giving the streaming code path an oracle-checkable twin
    * (equals min-per-hash on bounded input).
    */
  def runBatchDedup(h: String, rows: Iterator[DocKeyed]): Iterator[DedupOut] =
    dedupFold(rows, None)._2.iterator

  /** [[runBatchDedup]] wired over a whole documents table — the one
    * batch-harness pipeline shared by the registered query and the
    * equivalence spec, so both always exercise the same keying + fold.
    */
  def batchDedup(docs: org.apache.spark.sql.DataFrame): Dataset[DedupOut] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), md5(col("text")).as("h")).as[DocKeyed]
      .groupByKey(_.h)
      .flatMapGroups((h: String, rows: Iterator[DocKeyed]) => runBatchDedup(h, rows))
  }

  // --------------------------------------- streaming near-dup candidates
  /** One (doc, band, signature) bucket row entering the LSH stream. */
  case class BandKeyed(doc_id: Long, band: Int, sig: String)

  /** A band-bucket collision: doc_a < doc_b share `sig` in `band`. A
    * pair colliding in several bands emits once per band (state is
    * per-bucket; global dedup is the downstream verify join's first
    * step, exactly as in the batch pipeline).
    */
  case class CandidateOut(doc_a: Long, doc_b: Long, band: Int)

  /** Per-bucket fold shared by the stream and its batch harness: each
    * doc joining the bucket pairs with every member already there.
    * State is the member list — the honest cost of streaming LSH (the
    * batch self-join holds the same bucket in memory); a pathological
    * bucket is a giant duplicate cluster, whose pair list is the
    * answer, not overhead.
    */
  private[graft] def bucketFold(
      rows: Iterator[BandKeyed],
      prior: Vector[Long],
      cap: Int = Int.MaxValue): (Vector[Long], Vector[CandidateOut]) = {
    // membership probes go through a Set (O(1)); the Vector stays the
    // arrival-ordered state representation. Without the Set, a giant
    // bucket pays O(n) per arrival ON TOP of the inherent O(n²) pair
    // emission — the avoidable half of the quadratic.
    //
    // `cap` bounds the member vector (the streaming face of
    // [[graft.operators.BandCap]]): once a bucket holds `cap` members,
    // later arrivals are dropped — no state growth AND no pair
    // emission, so a boilerplate mega-bucket costs at most cap²/2
    // pairs per epoch instead of n² (arrival order decides the
    // survivors here where the batch cap hash-samples; a streaming
    // fold cannot replay the coin — it would need the bucket's final
    // size). The exact variants pass no cap: their oracle twins
    // replay every pair.
    var members = prior
    val seen = scala.collection.mutable.HashSet.from(prior)
    val out = Vector.newBuilder[CandidateOut]
    rows.toSeq.sortBy(_.doc_id).foreach { r =>
      if (members.size < cap && seen.add(r.doc_id)) {
        members.foreach(m =>
          out += CandidateOut(math.min(m, r.doc_id), math.max(m, r.doc_id), r.band))
        members = members :+ r.doc_id
      }
    }
    (members, out.result())
  }

  /** Streaming MinHash-LSH candidate generation: documents arrive, their
    * per-row band signatures ([[graft.operators.Dedup
    * .rowBandSignatures]] — scalar HOFs, so no aggregation precedes the
    * stateful stage) key them into band buckets, and each bucket's
    * GroupState emits collision pairs as later members arrive. The
    * streaming face of the dedup modality: candidates surface while the
    * crawl is still running, instead of after a full-corpus scan.
    */
  /** State bound: exact candidates require remembering every bucket
    * member for the stream's lifetime (total state == one long per
    * (band, doc) = 4x corpus ids — small per doc, unbounded over an
    * endless crawl). [[nearDupCandidateStreamTtl]] is the bounded-state
    * production variant — event-time TTL eviction, trading cross-epoch
    * dup detection for bounded state; the exact variant here is the
    * oracle-checkable semantics.
    */
  def nearDupCandidateStream(docs: org.apache.spark.sql.DataFrame): Dataset[CandidateOut] = {
    val spark = docs.sparkSession
    import spark.implicits._
    graft.operators.Dedup.rowBandSignatures(docs).as[BandKeyed]
      .groupByKey(r => s"${r.band}|${r.sig}")
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[BandKeyed], state: GroupState[Vector[Long]]) =>
          val (members, out) = bucketFold(rows, state.getOption.getOrElse(Vector.empty))
          state.update(members)
          out.iterator
      }
  }

  /** A band-bucket signature row carrying its document's event time —
    * the input shape of the TTL-evicting stream.
    */
  case class BandKeyedTs(doc_id: Long, band: Int, sig: String, event_ts: java.sql.Timestamp)

  /** TTL-bucket state: arrival-ordered members plus the newest member
    * event time ever observed. The timeout re-arms from `newestTs`, NOT
    * from the current batch's max — a valid late-but-in-watermark
    * arrival older than the bucket's newest member must extend nothing
    * but also shrink nothing (re-arming from the batch max would move
    * the armed timestamp BACKWARD and evict early).
    */
  case class TtlBucket(members: Vector[Long], newestTs: Long)

  /** [[nearDupCandidateStream]] with a REAL state bound: each band
    * bucket lives `ttlSeconds` of EVENT time past its newest member,
    * then its state is evicted, so total state is proportional to one
    * TTL window of the stream, not its lifetime. The trade is explicit:
    * a duplicate arriving after its bucket closed pairs with nothing —
    * cross-epoch dup detection is what bounded state costs.
    *
    * The clock is deterministic by construction: eviction is driven by
    * the event-time WATERMARK (data decides when time advances), not the
    * wall clock — a ProcessingTimeTimeout variant cannot even be tested
    * under `processAllAvailable`, which never lets processing time
    * settle. `docs` needs an `event_ts` timestamp column;
    * `watermarkDelay` is the usual out-of-order bound (rows later than
    * watermark − delay are dropped by the engine before the state ever
    * sees them).
    *
    * Timeout bookkeeping: every batch that touches a bucket re-arms its
    * timeout to (newest member event time ever seen) + TTL, so an
    * active bucket keeps living (sliding idle-timeout semantics —
    * matching state-store TTL retention) and a late-but-in-watermark
    * arrival can never move the armed timestamp backward; when the
    * watermark passes the armed timestamp the group fires with
    * `hasTimedOut` and the state is removed.
    *
    * State-schema note: the state type is [[TtlBucket]] (members +
    * newest event time, format version [[TtlStateVersion]]); a
    * checkpoint written by a pre-TtlBucket build (bare member vector)
    * cannot be restored by this version — restart such a stream from a
    * fresh checkpoint. Call [[guardTtlCheckpoint]] with the checkpoint
    * location BEFORE `start()` to turn the raw state-deserialization
    * failure a stale checkpoint would produce into a clear versioned
    * error at startup.
    */
  def nearDupCandidateStreamTtl(
      docs: org.apache.spark.sql.DataFrame,
      watermarkDelay: String,
      ttlSeconds: Long): Dataset[CandidateOut] = {
    val spark = docs.sparkSession
    import spark.implicits._
    graft.operators.Dedup.rowBandSignatures(docs, passthrough = Seq("event_ts"))
      .withWatermark("event_ts", watermarkDelay)
      .select("doc_id", "band", "sig", "event_ts").as[BandKeyedTs]
      .groupByKey(r => s"${r.band}|${r.sig}")
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key: String, rows: Iterator[BandKeyedTs], state: GroupState[TtlBucket]) =>
          if (state.hasTimedOut) {
            state.remove() // the bucket's epoch is over; a later arrival starts a fresh one
            Iterator.empty
          } else {
            val batch = rows.toVector
            val prior = state.getOption.getOrElse(TtlBucket(Vector.empty, Long.MinValue))
            val (members, out) = bucketFold(
              batch.iterator.map(r => BandKeyed(r.doc_id, r.band, r.sig)),
              prior.members,
              graft.operators.BandCap.DefaultCap)
            val newest = math.max(prior.newestTs, batch.map(_.event_ts.getTime).max)
            state.update(TtlBucket(members, newest))
            state.setTimeoutTimestamp(newest + ttlSeconds * 1000L)
            out.iterator
          }
      }
  }

  /** Format version of the TTL stream's state encoding. History:
    * v1 = bare `Vector[Long]` member list (no marker file written);
    * v2 = [[TtlBucket]] (members + newestTs).
    */
  val TtlStateVersion = 2

  private val TtlVersionMarker = "graft_ttl_state_version"

  /** Startup guard for [[nearDupCandidateStreamTtl]] checkpoints: call
    * with the `checkpointLocation` BEFORE `start()`. A state-schema
    * change (v1's bare member vector → v2's [[TtlBucket]]) makes Spark
    * fail checkpoint restore deep inside state deserialization with an
    * error that names neither the cause nor the fix; this check fails
    * FAST with both instead.
    *
    * Protocol: a fresh checkpoint dir gets a version marker file; a
    * dir that already carries streaming state but no marker predates
    * versioning (v1 or an unmarked v2) and is refused — restart from a
    * fresh checkpoint, or create the marker manually if the checkpoint
    * is known to be TtlBucket-format; a marker with a different version
    * is refused with both numbers.
    */
  def guardTtlCheckpoint(spark: SparkSession, checkpointDir: String): Unit = {
    val dir = new org.apache.hadoop.fs.Path(checkpointDir)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val marker = new org.apache.hadoop.fs.Path(dir, TtlVersionMarker)
    if (fs.exists(marker)) {
      val in = fs.open(marker)
      val found = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
      finally in.close()
      if (found != TtlStateVersion.toString)
        throw new IllegalStateException(
          s"TTL near-dup checkpoint at $checkpointDir holds state format v$found, " +
            s"but this build reads v$TtlStateVersion (TtlBucket). Restoring would fail " +
            "inside state deserialization — restart the stream from a fresh checkpoint.")
    } else {
      val hasState = Seq("offsets", "state")
        .exists(d => fs.exists(new org.apache.hadoop.fs.Path(dir, d)))
      if (hasState)
        throw new IllegalStateException(
          s"TTL near-dup checkpoint at $checkpointDir predates state-format versioning " +
            s"(pre-v$TtlStateVersion, likely the bare member-vector format). Restoring " +
            "would fail inside state deserialization — restart the stream from a fresh " +
            s"checkpoint, or create $TtlVersionMarker containing '$TtlStateVersion' in " +
            "the checkpoint dir if it is known to be TtlBucket-format.")
      // Two streams starting concurrently against the same fresh dir
      // race on the create — the loser re-reads the winner's marker and
      // treats a matching version as success rather than surfacing a
      // raw FileAlreadyExistsException.
      try {
        val out = fs.create(marker, false)
        try out.write(s"$TtlStateVersion\n".getBytes("UTF-8"))
        finally out.close()
      } catch {
        case _: java.io.IOException if fs.exists(marker) =>
          // the winner may have created the file but not yet written
          // its version bytes — retry briefly before judging, and
          // treat a still-empty marker as the I/O problem it is, not
          // as a format mismatch
          def readMarker(): String = {
            val in = fs.open(marker)
            try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
            finally in.close()
          }
          var found = readMarker()
          var tries = 0
          while (found.isEmpty && tries < 20) {
            Thread.sleep(50)
            found = readMarker()
            tries += 1
          }
          if (found.isEmpty)
            throw new java.io.IOException(
              s"TTL near-dup checkpoint marker at $checkpointDir exists but stayed " +
                "empty — a concurrent writer died mid-write or the filesystem lost " +
                "the content; inspect the checkpoint dir.")
          if (found != TtlStateVersion.toString)
            throw new IllegalStateException(
              s"TTL near-dup checkpoint at $checkpointDir holds state format v$found, " +
                s"but this build reads v$TtlStateVersion (TtlBucket). Restoring would " +
                "fail inside state deserialization — restart the stream from a fresh " +
                "checkpoint.")
      }
    }
  }

  // ------------------------------------ streaming perceptual near-dup
  /** One perceptual band-bucket row: a 16-bit slice key plus the full
    * hash halves (the within-bucket Hamming verify needs them).
    */
  case class MmBandKeyed(doc_id: Long, band: Int, key: Long, ph_hi: Long, ph_lo: Long)

  /** A verified perceptual collision: doc_a < doc_b share band `band`
    * and sit within [[graft.operators.Multimodal.MmHammingMax]] bits.
    */
  case class MmCandidateOut(doc_a: Long, doc_b: Long, band: Int, hamming: Int)

  /** Per-bucket fold shared by the perceptual stream and its batch
    * harness — [[bucketFold]]'s shape with the Hamming verify fused in
    * (state carries each member's hash halves, so a collision verifies
    * inside the bucket instead of a downstream join).
    */
  private[graft] def mmBucketFold(
      rows: Iterator[MmBandKeyed],
      prior: Vector[(Long, Long, Long)],
      cap: Int = Int.MaxValue,
      gate: Int = graft.operators.Multimodal.MmHammingMax)
      : (Vector[(Long, Long, Long)], Vector[MmCandidateOut]) = {
    // `cap` = the TTL streams' member-vector bound; see [[bucketFold]].
    // `gate` = the kernel family's Hamming verify (the spectral faces
    // ride tighter gates than the dHash default).
    var members = prior
    val seen = scala.collection.mutable.HashSet.from(prior.map(_._1))
    val out = Vector.newBuilder[MmCandidateOut]
    rows.toSeq.sortBy(_.doc_id).foreach { r =>
      if (members.size < cap && seen.add(r.doc_id)) {
        members.foreach { case (m, hi, lo) =>
          val ham = java.lang.Long.bitCount(hi ^ r.ph_hi) +
            java.lang.Long.bitCount(lo ^ r.ph_lo)
          if (ham <= gate)
            out += MmCandidateOut(
              math.min(m, r.doc_id), math.max(m, r.doc_id), r.band, ham)
        }
        members = members :+ ((r.doc_id, r.ph_hi, r.ph_lo))
      }
    }
    (members, out.result())
  }

  private def mmBandedRows(
      withPayload: org.apache.spark.sql.DataFrame): Dataset[MmBandKeyed] = {
    val spark = withPayload.sparkSession
    import spark.implicits._
    graft.operators.Multimodal
      .perceptualBanded(graft.operators.Multimodal.perceptualHash(withPayload).toDF())
      .select(
        col("doc_id"), col("band").cast("int").as("band"),
        col("key"), col("ph_hi"), col("ph_lo"))
      .as[MmBandKeyed]
  }

  /** [[mmBandedRows]] with the AUDIO fingerprint kernel
    * ([[graft.operators.Multimodal.audioFingerprint]] — PCM energy
    * dHash; non-WAV payloads drop rather than mis-decode) feeding the
    * same band projection.
    */
  private def mmAudioBandedRows(
      withPayload: org.apache.spark.sql.DataFrame): Dataset[MmBandKeyed] = {
    val spark = withPayload.sparkSession
    import spark.implicits._
    graft.operators.Multimodal
      .perceptualBanded(graft.operators.Multimodal.audioFingerprint(withPayload).toDF())
      .select(
        col("doc_id"), col("band").cast("int").as("band"),
        col("key"), col("ph_hi"), col("ph_lo"))
      .as[MmBandKeyed]
  }

  /** The image modality's ingest-time face: arriving payloads hash
    * through the ONE perceptual kernel
    * ([[graft.operators.Multimodal.phashOf]] — pixel-true 2-D dHash
    * when the payload decodes, byte-stream fallback otherwise; shared
    * verbatim with batch `mmPhash`), band into 16-bit buckets, and
    * each bucket's GroupState emits Hamming-verified pairs as later
    * members arrive — a crawler sees an image re-encode paired while
    * the crawl is still running. Same state bound as
    * [[nearDupCandidateStream]] (one (id, hash) per (band, doc) for
    * the stream's lifetime); a TTL variant would follow
    * [[nearDupCandidateStreamTtl]]'s eviction verbatim if cross-epoch
    * pairing is expendable.
    */
  def mmNearDupStream(
      withPayload: org.apache.spark.sql.DataFrame): Dataset[MmCandidateOut] = {
    val spark = withPayload.sparkSession
    import spark.implicits._
    mmBandedRows(withPayload)
      .groupByKey(r => s"${r.band}|${r.key}")
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[MmBandKeyed],
            state: GroupState[Vector[(Long, Long, Long)]]) =>
          val (members, out) = mmBucketFold(rows, state.getOption.getOrElse(Vector.empty))
          state.update(members)
          out.iterator
      }
  }

  /** A perceptual band-bucket row carrying its event time — the input
    * shape of the TTL-evicting image stream.
    */
  case class MmBandKeyedTs(
      doc_id: Long, band: Int, key: Long, ph_hi: Long, ph_lo: Long,
      event_ts: java.sql.Timestamp)

  /** TTL-bucket state for the image stream: (id, hash halves) members
    * plus the newest member event time — [[TtlBucket]]'s re-arming
    * semantics on the perceptual member tuple.
    */
  case class MmTtlBucket(members: Vector[(Long, Long, Long)], newestTs: Long)

  /** [[mmNearDupStream]] with the REAL state bound an endless crawl
    * needs: each perceptual band bucket lives `ttlSeconds` of EVENT
    * time past its newest member, then evicts —
    * [[nearDupCandidateStreamTtl]]'s watermark-driven eviction and
    * timeout re-arming verbatim, on image state (the trade is
    * identical: a re-encode arriving after its bucket closed pairs
    * with nothing). `withPayload` needs an `event_ts` column; the
    * hash kernel is still the one [[graft.operators.Multimodal
    * .phashOf]].
    */
  def mmNearDupStreamTtl(
      withPayload: org.apache.spark.sql.DataFrame,
      watermarkDelay: String,
      ttlSeconds: Long): Dataset[MmCandidateOut] = {
    val spark = withPayload.sparkSession
    import spark.implicits._
    // event_ts threads THROUGH the hash projection (a stream cannot
    // join back to itself to re-attach it); the kernel is still the
    // one shared phashOf
    val hashed = withPayload
      .select(col("doc_id"), col("payload"), col("event_ts"))
      .as[(Long, Array[Byte], java.sql.Timestamp)]
      .mapPartitions(_.map { case (id, p, ts) =>
        val (hi, lo) = graft.operators.Multimodal.phashOf(p)
        (id, hi, lo, ts)
      })
      .toDF("doc_id", "ph_hi", "ph_lo", "event_ts")
    graft.operators.Multimodal.perceptualBanded(hashed)
      .withWatermark("event_ts", watermarkDelay)
      .select(
        col("doc_id"), col("band").cast("int").as("band"),
        col("key"), col("ph_hi"), col("ph_lo"), col("event_ts"))
      .as[MmBandKeyedTs]
      .groupByKey(r => s"${r.band}|${r.key}")
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key: String, rows: Iterator[MmBandKeyedTs], state: GroupState[MmTtlBucket]) =>
          if (state.hasTimedOut) {
            state.remove() // the bucket's epoch is over; a later arrival starts a fresh one
            Iterator.empty
          } else {
            val batch = rows.toVector
            val prior = state.getOption.getOrElse(MmTtlBucket(Vector.empty, Long.MinValue))
            val (members, out) = mmBucketFold(
              batch.iterator.map(r => MmBandKeyed(r.doc_id, r.band, r.key, r.ph_hi, r.ph_lo)),
              prior.members,
              graft.operators.BandCap.DefaultCap)
            val newest = math.max(prior.newestTs, batch.map(_.event_ts.getTime).max)
            state.update(MmTtlBucket(members, newest))
            state.setTimeoutTimestamp(newest + ttlSeconds * 1000L)
            out.iterator
          }
      }
  }

  /** [[mmNearDupStream]]'s fold over bounded input — the
    * oracle-checkable batch twin (equals the band-bucket self-join
    * with the Hamming verify).
    */
  def batchMmNearDup(
      withPayload: org.apache.spark.sql.DataFrame): Dataset[MmCandidateOut] = {
    val spark = withPayload.sparkSession
    import spark.implicits._
    mmBandedRows(withPayload)
      .groupByKey(r => s"${r.band}|${r.key}")
      .flatMapGroups((key: String, rows: Iterator[MmBandKeyed]) =>
        mmBucketFold(rows, Vector.empty)._2.iterator)
  }

  /** The AUDIO modality's ingest-time face: arriving WAV payloads
    * fingerprint through the one PCM energy-dHash kernel, band into
    * 16-bit buckets, and each bucket's GroupState emits Hamming-
    * verified pairs as later members arrive — a crawler sees a
    * resampled re-encode of a recording paired while the crawl is
    * still running. [[mmNearDupStream]]'s state bound and fold,
    * verbatim, on the fourth modality.
    */
  def mmAudioNearDupStream(
      withPayload: org.apache.spark.sql.DataFrame): Dataset[MmCandidateOut] = {
    val spark = withPayload.sparkSession
    import spark.implicits._
    mmAudioBandedRows(withPayload)
      .groupByKey(r => s"${r.band}|${r.key}")
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[MmBandKeyed],
            state: GroupState[Vector[(Long, Long, Long)]]) =>
          val (members, out) = mmBucketFold(rows, state.getOption.getOrElse(Vector.empty))
          state.update(members)
          out.iterator
      }
  }

  /** [[mmAudioNearDupStream]] with the REAL state bound an endless
    * crawl needs — [[mmNearDupStreamTtl]]'s watermark-driven eviction
    * and timeout re-arming verbatim, on the audio fingerprint kernel:
    * each band bucket lives `ttlSeconds` of EVENT time past its newest
    * member, then evicts (a resample arriving after its bucket closed
    * pairs with nothing — the takedown-friendly trade). `withPayload`
    * needs an `event_ts` column.
    */
  def mmAudioNearDupStreamTtl(
      withPayload: org.apache.spark.sql.DataFrame,
      watermarkDelay: String,
      ttlSeconds: Long): Dataset[MmCandidateOut] = {
    val spark = withPayload.sparkSession
    import spark.implicits._
    val hashed = withPayload
      .select(col("doc_id"), col("payload"), col("event_ts"))
      .as[(Long, Array[Byte], java.sql.Timestamp)]
      .mapPartitions(_.flatMap { case (id, p, ts) =>
        graft.operators.Multimodal.audioDHash(p).map { case (hi, lo) => (id, hi, lo, ts) }
      })
      .toDF("doc_id", "ph_hi", "ph_lo", "event_ts")
    graft.operators.Multimodal.perceptualBanded(hashed)
      .withWatermark("event_ts", watermarkDelay)
      .select(
        col("doc_id"), col("band").cast("int").as("band"),
        col("key"), col("ph_hi"), col("ph_lo"), col("event_ts"))
      .as[MmBandKeyedTs]
      .groupByKey(r => s"${r.band}|${r.key}")
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key: String, rows: Iterator[MmBandKeyedTs], state: GroupState[MmTtlBucket]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val batch = rows.toVector
            val prior = state.getOption.getOrElse(MmTtlBucket(Vector.empty, Long.MinValue))
            val (members, out) = mmBucketFold(
              batch.iterator.map(r => MmBandKeyed(r.doc_id, r.band, r.key, r.ph_hi, r.ph_lo)),
              prior.members,
              graft.operators.BandCap.DefaultCap)
            val newest = math.max(prior.newestTs, batch.map(_.event_ts.getTime).max)
            state.update(MmTtlBucket(members, newest))
            state.setTimeoutTimestamp(newest + ttlSeconds * 1000L)
            out.iterator
          }
      }
  }

  /** Ingest-time WARC extraction: arriving archive FILES (one binary
    * payload per file, the shape a crawler's rolling uploads have)
    * record-scan, HTTP-parse, and text-extract inside the stream —
    * the [[graft.sources.Warc.parseWarcRecords]] kernel is a
    * stateless typed flatMap, so the streaming face IS the batch
    * kernel on an unbounded frame; no state, no watermark, exactly
    * the lang-ID/keep-mask stateless-ingest discipline.
    */
  def warcExtractStream(files: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val ex = graft.operators.TextStats.extractedTextCol("html")
    graft.sources.Warc.parseWarcRecords(files).toDF()
      .select(
        col("doc_id"), col("url"), col("warc_date"), col("status"),
        col("n_block_bytes"), ex.as("text"),
        length(col("html")).as("n_chars_raw"), length(ex).as("n_chars_text"))
  }

  /** The audio candidate stream's fold over bounded input — the
    * oracle-checkable batch twin (equals the audio band-bucket
    * self-join with the Hamming verify, kept per band).
    */
  def batchMmAudioNearDup(
      withPayload: org.apache.spark.sql.DataFrame): Dataset[MmCandidateOut] = {
    val spark = withPayload.sparkSession
    import spark.implicits._
    mmAudioBandedRows(withPayload)
      .groupByKey(r => s"${r.band}|${r.key}")
      .flatMapGroups((key: String, rows: Iterator[MmBandKeyed]) =>
        mmBucketFold(rows, Vector.empty)._2.iterator)
  }

  private def mmVideoBandedRows(
      withPayload: org.apache.spark.sql.DataFrame): Dataset[MmBandKeyed] = {
    val spark = withPayload.sparkSession
    import spark.implicits._
    graft.operators.Multimodal
      .perceptualBanded(graft.operators.Multimodal.videoFingerprint(withPayload).toDF())
      .select(
        col("doc_id"), col("band").cast("int").as("band"),
        col("key"), col("ph_hi"), col("ph_lo"))
      .as[MmBandKeyed]
  }

  /** The VIDEO modality's ingest-time face: arriving AVI payloads
    * fingerprint through the one temporal luma-dHash kernel, band into
    * 16-bit buckets, and each bucket's GroupState emits Hamming-
    * verified pairs as later members arrive — a crawler sees a
    * frame-rate re-encode of a clip paired while the crawl is still
    * running. [[mmNearDupStream]]'s state bound and fold, verbatim, on
    * the fifth modality.
    */
  def mmVideoNearDupStream(
      withPayload: org.apache.spark.sql.DataFrame): Dataset[MmCandidateOut] = {
    val spark = withPayload.sparkSession
    import spark.implicits._
    mmVideoBandedRows(withPayload)
      .groupByKey(r => s"${r.band}|${r.key}")
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[MmBandKeyed],
            state: GroupState[Vector[(Long, Long, Long)]]) =>
          val (members, out) = mmBucketFold(rows, state.getOption.getOrElse(Vector.empty))
          state.update(members)
          out.iterator
      }
  }

  /** [[mmVideoNearDupStream]] with the REAL state bound an endless
    * crawl needs — [[mmNearDupStreamTtl]]'s watermark-driven eviction
    * and timeout re-arming verbatim, on the video fingerprint kernel:
    * each band bucket lives `ttlSeconds` of EVENT time past its newest
    * member, then evicts (a re-encode arriving after its bucket closed
    * pairs with nothing — the takedown-friendly trade). `withPayload`
    * needs an `event_ts` column.
    */
  def mmVideoNearDupStreamTtl(
      withPayload: org.apache.spark.sql.DataFrame,
      watermarkDelay: String,
      ttlSeconds: Long): Dataset[MmCandidateOut] = {
    val spark = withPayload.sparkSession
    import spark.implicits._
    val hashed = withPayload
      .select(col("doc_id"), col("payload"), col("event_ts"))
      .as[(Long, Array[Byte], java.sql.Timestamp)]
      .mapPartitions(_.flatMap { case (id, p, ts) =>
        graft.operators.Multimodal.videoDHash(p).map { case (hi, lo) => (id, hi, lo, ts) }
      })
      .toDF("doc_id", "ph_hi", "ph_lo", "event_ts")
    graft.operators.Multimodal.perceptualBanded(hashed)
      .withWatermark("event_ts", watermarkDelay)
      .select(
        col("doc_id"), col("band").cast("int").as("band"),
        col("key"), col("ph_hi"), col("ph_lo"), col("event_ts"))
      .as[MmBandKeyedTs]
      .groupByKey(r => s"${r.band}|${r.key}")
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key: String, rows: Iterator[MmBandKeyedTs], state: GroupState[MmTtlBucket]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val batch = rows.toVector
            val prior = state.getOption.getOrElse(MmTtlBucket(Vector.empty, Long.MinValue))
            val (members, out) = mmBucketFold(
              batch.iterator.map(r => MmBandKeyed(r.doc_id, r.band, r.key, r.ph_hi, r.ph_lo)),
              prior.members,
              graft.operators.BandCap.DefaultCap)
            val newest = math.max(prior.newestTs, batch.map(_.event_ts.getTime).max)
            state.update(MmTtlBucket(members, newest))
            state.setTimeoutTimestamp(newest + ttlSeconds * 1000L)
            out.iterator
          }
      }
  }

  /** The video candidate stream's fold over bounded input — the
    * oracle-checkable batch twin (equals the video band-bucket
    * self-join with the Hamming verify, kept per band).
    */
  def batchMmVideoNearDup(
      withPayload: org.apache.spark.sql.DataFrame): Dataset[MmCandidateOut] = {
    val spark = withPayload.sparkSession
    import spark.implicits._
    mmVideoBandedRows(withPayload)
      .groupByKey(r => s"${r.band}|${r.key}")
      .flatMapGroups((key: String, rows: Iterator[MmBandKeyed]) =>
        mmBucketFold(rows, Vector.empty)._2.iterator)
  }

  // ---------------------------- streaming SPECTRAL near-dup (audio+video)
  /** [[mmAudioBandedRows]] on the autocorrelation lag-bank kernel
    * ([[graft.operators.Multimodal.audioSpectralFingerprint]]) — the
    * pad/trim/stretch-robust fingerprint's ingest face shares the
    * batch kernel verbatim, exactly as every energy-dHash face does.
    */
  private def mmAudioSpectralBandedRows(
      withPayload: org.apache.spark.sql.DataFrame): Dataset[MmBandKeyed] = {
    val spark = withPayload.sparkSession
    import spark.implicits._
    graft.operators.Multimodal
      .perceptualBanded(
        graft.operators.Multimodal.audioSpectralFingerprint(withPayload).toDF())
      .select(
        col("doc_id"), col("band").cast("int").as("band"),
        col("key"), col("ph_hi"), col("ph_lo"))
      .as[MmBandKeyed]
  }

  private def mmVideoSpectralBandedRows(
      withPayload: org.apache.spark.sql.DataFrame): Dataset[MmBandKeyed] = {
    val spark = withPayload.sparkSession
    import spark.implicits._
    graft.operators.Multimodal
      .perceptualBanded(
        graft.operators.Multimodal.videoSpectralFingerprint(withPayload).toDF())
      .select(
        col("doc_id"), col("band").cast("int").as("band"),
        col("key"), col("ph_hi"), col("ph_lo"))
      .as[MmBandKeyed]
  }

  /** The SPECTRAL audio ingest face: arriving WAV payloads fingerprint
    * through the lag-bank kernel, band, and Hamming-verify inside
    * their bucket at the spectral gate
    * ([[graft.operators.Multimodal.SpectralHammingMax]], tighter than
    * the dHash default — lag-bank bits are global-structure bits) — a
    * crawler sees the re-upload with a trimmed intro or a tempo
    * stretch paired while the crawl is still running, the transform
    * class the energy-dHash stream provably cannot pair. State bound
    * and fold shared with [[mmNearDupStream]]; a TTL variant would
    * follow [[mmAudioNearDupStreamTtl]]'s eviction verbatim (the
    * watermark machinery is kernel-agnostic — only the hash call and
    * the gate differ).
    */
  def mmAudioSpectralNearDupStream(
      withPayload: org.apache.spark.sql.DataFrame): Dataset[MmCandidateOut] = {
    val spark = withPayload.sparkSession
    import spark.implicits._
    mmAudioSpectralBandedRows(withPayload)
      .groupByKey(r => s"${r.band}|${r.key}")
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[MmBandKeyed],
            state: GroupState[Vector[(Long, Long, Long)]]) =>
          val (members, out) = mmBucketFold(
            rows, state.getOption.getOrElse(Vector.empty),
            gate = graft.operators.Multimodal.SpectralHammingMax)
          state.update(members)
          out.iterator
      }
  }

  /** [[mmAudioSpectralNearDupStream]]'s fold over bounded input — the
    * oracle-checkable batch twin.
    */
  def batchMmAudioSpectralNearDup(
      withPayload: org.apache.spark.sql.DataFrame): Dataset[MmCandidateOut] = {
    val spark = withPayload.sparkSession
    import spark.implicits._
    mmAudioSpectralBandedRows(withPayload)
      .groupByKey(r => s"${r.band}|${r.key}")
      .flatMapGroups((key: String, rows: Iterator[MmBandKeyed]) =>
        mmBucketFold(
          rows, Vector.empty,
          gate = graft.operators.Multimodal.SpectralHammingMax)._2.iterator)
  }

  /** The SPECTRAL video ingest face: arriving AVI payloads fingerprint
    * through the delta lag-bank kernel and verify at
    * [[graft.operators.Multimodal.VideoSpectralHammingMax]] — the
    * black-padded re-edit pairs in-stream, the transform class the
    * temporal-dHash stream provably cannot pair. Same sharing
    * contract as the audio face.
    */
  def mmVideoSpectralNearDupStream(
      withPayload: org.apache.spark.sql.DataFrame): Dataset[MmCandidateOut] = {
    val spark = withPayload.sparkSession
    import spark.implicits._
    mmVideoSpectralBandedRows(withPayload)
      .groupByKey(r => s"${r.band}|${r.key}")
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[MmBandKeyed],
            state: GroupState[Vector[(Long, Long, Long)]]) =>
          val (members, out) = mmBucketFold(
            rows, state.getOption.getOrElse(Vector.empty),
            gate = graft.operators.Multimodal.VideoSpectralHammingMax)
          state.update(members)
          out.iterator
      }
  }

  /** [[mmVideoSpectralNearDupStream]]'s fold over bounded input — the
    * oracle-checkable batch twin.
    */
  def batchMmVideoSpectralNearDup(
      withPayload: org.apache.spark.sql.DataFrame): Dataset[MmCandidateOut] = {
    val spark = withPayload.sparkSession
    import spark.implicits._
    mmVideoSpectralBandedRows(withPayload)
      .groupByKey(r => s"${r.band}|${r.key}")
      .flatMapGroups((key: String, rows: Iterator[MmBandKeyed]) =>
        mmBucketFold(
          rows, Vector.empty,
          gate = graft.operators.Multimodal.VideoSpectralHammingMax)._2.iterator)
  }

  /** The candidate stream's fold over bounded input — the oracle-
    * checkable batch twin (equals the band-bucket self-join). Feeds the
    * fold from the AGGREGATED signatures: on bounded input the shuffle-
    * combined minhash beats 16x per-row HOF evaluation, and StreamingSpec
    * pins the two signature forms bit-equal, so the fold under test is
    * identical to the stream's.
    */
  def batchNearDupCandidates(docs: org.apache.spark.sql.DataFrame): Dataset[CandidateOut] = {
    val spark = docs.sparkSession
    import spark.implicits._
    graft.operators.Dedup.bandSignatures(docs).as[BandKeyed]
      .groupByKey(r => s"${r.band}|${r.sig}")
      .flatMapGroups((key: String, rows: Iterator[BandKeyed]) =>
        bucketFold(rows, Vector.empty)._2.iterator)
  }

  // ------------------------------------------ embedding near-dup stream
  /** A hyperplane band-bucket row carrying the vector + norm the
    * verify step needs — the embedding modality's [[BandKeyed]].
    */
  case class EmbBandKeyed(
      vec_id: Long, band: Int, key: Long, embedding: Array[Float], norm: Double)

  /** One verified semantic candidate pair, kept per band. */
  case class EmbCandidateOut(vec_a: Long, vec_b: Long, band: Int, cos: Double)

  /** Per-bucket fold of the SEMANTIC near-dup stream: each arriving
    * vector exact-cosine-verifies against the bucket's members
    * (threshold [[graft.operators.Ann.NearDupCos]]) and joins the
    * member set. The dot product is the strict index-ascending
    * widen-to-double fold `float_dot` runs, and the rounding is
    * Spark's HALF_UP at 6 — so the emitted cos is bit-identical to
    * the batch operator's and to the DuckDB twin's. `cap` bounds the
    * member vector for the TTL variant ([[bucketFold]]'s discipline —
    * state AND emission stay O(cap) per bucket epoch).
    */
  private[graft] def embBucketFold(
      rows: Iterator[EmbBandKeyed],
      prior: Vector[(Long, Array[Float], Double)],
      cap: Int = Int.MaxValue)
      : (Vector[(Long, Array[Float], Double)], Vector[EmbCandidateOut]) = {
    var members = prior
    val seen = scala.collection.mutable.HashSet.from(prior.map(_._1))
    val out = Vector.newBuilder[EmbCandidateOut]
    rows.toSeq.sortBy(_.vec_id).foreach { r =>
      if (members.size < cap && seen.add(r.vec_id)) {
        members.foreach { case (m, me, mn) =>
          var d = 0.0
          var i = 0
          val n = math.min(me.length, r.embedding.length)
          while (i < n) {
            d += me(i).toDouble * r.embedding(i).toDouble
            i += 1
          }
          val cos = d / (mn * r.norm)
          if (cos >= graft.operators.Ann.NearDupCos)
            out += EmbCandidateOut(
              math.min(m, r.vec_id),
              math.max(m, r.vec_id),
              r.band,
              BigDecimal(cos).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        }
        members = members :+ ((r.vec_id, r.embedding, r.norm))
      }
    }
    (members, out.result())
  }

  /** SEMANTIC (embedding) near-dup candidates at ingest time — the
    * modality matrix's last streaming face (text shingles, image/
    * audio/video perceptual hashes, and now vectors all surface
    * near-dups while the crawl runs): arriving vectors band through
    * the one hyperplane signature ([[graft.operators.Ann
    * .nearDupBandedVectors]] — pure projections, so no pre-stateful
    * aggregation), and each bucket's GroupState exact-cosine-verifies
    * newcomers against its members. State holds the member VECTORS
    * (the verify needs them — the semantic analogue of the perceptual
    * streams' hash halves); [[embNearDupStreamTtl]] is the bounded
    * production variant.
    */
  def embNearDupStream(emb: org.apache.spark.sql.DataFrame): Dataset[EmbCandidateOut] = {
    val spark = emb.sparkSession
    import spark.implicits._
    graft.operators.Ann.nearDupBandedVectors(emb)
      .select(
        col("vec_id"), col("band").cast("int").as("band"), col("key"),
        col("embedding"), col("norm"))
      .as[EmbBandKeyed]
      .groupByKey(r => s"${r.band}|${r.key}")
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[EmbBandKeyed],
            state: GroupState[Vector[(Long, Array[Float], Double)]]) =>
          val (members, out) = embBucketFold(rows, state.getOption.getOrElse(Vector.empty))
          state.update(members)
          out.iterator
      }
  }

  /** A banded vector row carrying its event time — the TTL stream's
    * input shape.
    */
  case class EmbBandKeyedTs(
      vec_id: Long, band: Int, key: Long, embedding: Array[Float], norm: Double,
      event_ts: java.sql.Timestamp)

  /** TTL-bucket state for the embedding stream: (id, vector, norm)
    * members plus the newest member event time — [[TtlBucket]]'s
    * re-arming semantics on the semantic member tuple.
    */
  case class EmbTtlBucket(
      members: Vector[(Long, Array[Float], Double)], newestTs: Long)

  /** [[embNearDupStream]] with the REAL state bound an endless ingest
    * needs — [[nearDupCandidateStreamTtl]]'s watermark-driven eviction
    * and timeout re-arming on vector state, members bounded at
    * [[graft.operators.BandCap.DefaultCap]] (vector members are the
    * heaviest state in the engine — 64 floats each — so the cap
    * matters MORE here than anywhere): a near-copy arriving after its
    * bucket closed or filled pairs with nothing, the explicit trade.
    * `emb` needs an `event_ts` column.
    */
  def embNearDupStreamTtl(
      emb: org.apache.spark.sql.DataFrame,
      watermarkDelay: String,
      ttlSeconds: Long): Dataset[EmbCandidateOut] = {
    val spark = emb.sparkSession
    import spark.implicits._
    graft.operators.Ann.nearDupBandedVectors(emb, passthrough = Seq("event_ts"))
      .withWatermark("event_ts", watermarkDelay)
      .select(
        col("vec_id"), col("band").cast("int").as("band"), col("key"),
        col("embedding"), col("norm"), col("event_ts"))
      .as[EmbBandKeyedTs]
      .groupByKey(r => s"${r.band}|${r.key}")
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key: String, rows: Iterator[EmbBandKeyedTs], state: GroupState[EmbTtlBucket]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val batch = rows.toVector
            val prior = state.getOption.getOrElse(EmbTtlBucket(Vector.empty, Long.MinValue))
            val (members, out) = embBucketFold(
              batch.iterator.map(r =>
                EmbBandKeyed(r.vec_id, r.band, r.key, r.embedding, r.norm)),
              prior.members,
              graft.operators.BandCap.DefaultCap)
            val newest = math.max(prior.newestTs, batch.map(_.event_ts.getTime).max)
            state.update(EmbTtlBucket(members, newest))
            state.setTimeoutTimestamp(newest + ttlSeconds * 1000L)
            out.iterator
          }
      }
  }

  /** The embedding candidate stream's fold over bounded input — the
    * oracle-checkable batch twin (equals the hyperplane band-bucket
    * self-join with the exact-cosine verify, kept per band).
    */
  def batchEmbNearDup(emb: org.apache.spark.sql.DataFrame): Dataset[EmbCandidateOut] = {
    val spark = emb.sparkSession
    import spark.implicits._
    graft.operators.Ann.nearDupBandedVectors(emb)
      .select(
        col("vec_id"), col("band").cast("int").as("band"), col("key"),
        col("embedding"), col("norm"))
      .as[EmbBandKeyed]
      .groupByKey(r => s"${r.band}|${r.key}")
      .flatMapGroups((key: String, rows: Iterator[EmbBandKeyed]) =>
        embBucketFold(rows, Vector.empty)._2.iterator)
  }

  // ---------------------------------------------- streaming decontamination
  /** One decontamination verdict per arriving document. */
  case class DecontOut(
      doc_id: Long,
      n_shingles: Long,
      n_matched: Long,
      contamination: Double,
      contaminated: Boolean)

  /** The per-document overlap kernel shared by the stream and its
    * batch harness: distinct word 3-shingles (the exact
    * [[graft.operators.Dedup.shingles]] construction — `split(text,
    * ' ')` keeps empty tokens, docs under 3 words shingle to nothing),
    * membership-counted against the benchmark set, ratio rounded
    * HALF_UP at 6 like the batch operator's `round(..., 6)`.
    */
  def decontScore(id: Long, text: String, bench: Set[String]): DecontOut = {
    val w = text.split(" ", -1)
    var total = 0L
    var matched = 0L
    if (w.length >= 3) {
      val seen = scala.collection.mutable.HashSet.empty[String]
      var i = 0
      while (i <= w.length - 3) {
        val sh = w(i) + " " + w(i + 1) + " " + w(i + 2)
        if (seen.add(sh)) {
          total += 1
          if (bench(sh)) matched += 1
        }
        i += 1
      }
    }
    val frac = BigDecimal(matched.toDouble / math.max(total, 1L).toDouble)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    DecontOut(id, total, matched, frac, frac >= graft.operators.Corpus.ContaminationThreshold)
  }

  /** Decontamination AT INGEST: each arriving document scores its
    * benchmark overlap against a FROZEN benchmark shingle set — the
    * [[graft.sinks.Sinks.appendAnnIndex]] pattern on the text side
    * (eval suites are megabytes, frozen for a crawl; the set collects
    * once at stream start and ships in a broadcast). Stateless
    * per-row kernel, so the stream needs no watermark, no state store,
    * and scales with the scan; bit-equal to the batch
    * [[graft.operators.Corpus.decontaminate]] because both count the
    * same distinct-shingle set and divide the same integers
    * (StreamingSpec pins MemoryStream == batch).
    */
  def decontaminateStream(
      docs: org.apache.spark.sql.DataFrame,
      benchDocs: org.apache.spark.sql.DataFrame): Dataset[DecontOut] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bench = spark.sparkContext.broadcast(
      graft.operators.Dedup.shingles(benchDocs)
        .select("shingle").distinct().as[String].collect().toSet)
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions(_.map { case (id, t) => decontScore(id, t, bench.value) })
  }

  /** The stream kernel over bounded input with the registry's stand-in
    * `% BenchmarkMod` split — must equal `doc_decontaminate` row for
    * row (shared oracle twin).
    */
  def batchDecontaminate(docs: org.apache.spark.sql.DataFrame): Dataset[DecontOut] =
    decontaminateStream(
      docs.filter(col("doc_id") % graft.operators.Corpus.BenchmarkMod =!= 0),
      docs.filter(col("doc_id") % graft.operators.Corpus.BenchmarkMod === 0))

  // ------------------------------- streaming semantic decontamination
  /** One semantic-decontamination verdict per arriving vector — the
    * embedding-space face of [[DecontOut]].
    */
  case class EmbDecontOut(
      vec_id: Long,
      n_bench: Long,
      max_cos_fp: Long,
      max_cos: Double,
      contaminated: Boolean)

  /** Semantic decontamination AT INGEST: each arriving embedding
    * scores its max cosine against a FROZEN benchmark embedding set —
    * [[decontaminateStream]]'s shape in embedding space. The benchmark
    * vectors collect once at stream start (eval suites are megabytes,
    * frozen for a crawl) and ship in a broadcast; the per-row kernel
    * is [[graft.operators.Ann.embContamFp]] VERBATIM, so stream and
    * batch verdicts are bit-equal by construction (StreamingSpec pins
    * MemoryStream == batch). Stateless — no watermark, no state store;
    * the stream scales with the scan exactly like the batch operator's
    * one-pass map.
    */
  def embDecontaminateStream(
      vecs: org.apache.spark.sql.DataFrame,
      benchVecs: org.apache.spark.sql.DataFrame): Dataset[EmbDecontOut] = {
    val spark = vecs.sparkSession
    import spark.implicits._
    val (benchRows, bnorm) = graft.operators.Ann.collectBench(benchVecs)
    val bc = spark.sparkContext.broadcast((benchRows, bnorm))
    val nb = benchRows.length.toLong
    vecs.select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
      .mapPartitions(_.map { case (id, v) =>
        val (br, bn) = bc.value
        val fp = graft.operators.Ann.embContamFp(v, br, bn)
        val cos = BigDecimal(fp.toDouble / 1e9)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        EmbDecontOut(id, nb, fp, cos, fp >= graft.operators.Ann.EmbContamCosFp)
      })
  }

  /** The stream kernel over bounded input with the registry's stand-in
    * `% BenchmarkMod` split — must equal the `emb_decontaminate` row
    * set exactly (shared oracle twin).
    */
  def batchEmbDecontaminate(emb: org.apache.spark.sql.DataFrame): Dataset[EmbDecontOut] =
    embDecontaminateStream(
      emb.filter(col("vec_id") % graft.operators.Corpus.BenchmarkMod =!= 0),
      emb.filter(col("vec_id") % graft.operators.Corpus.BenchmarkMod === 0))

  // ---------------------------------------- streaming real-token stats
  /** One real-token statistic row per arriving document. */
  case class SubwordOut(
      doc_id: Long,
      n_tokens_ws: Long,
      n_tokens_bpe: Long,
      bpe_per_ws: Double)

  /** Real-token counting AT INGEST: each arriving document tokenizes
    * through a subword vocab TRAINED ON A FROZEN REFERENCE CORPUS at
    * stream start (a tokenizer must never refit per micro-batch, or
    * token counts stop being comparable across the stream — the
    * [[graft.sinks.Sinks.appendAnnIndex]] frozen-metadata rule on the
    * text side). The greedy longest-match kernel is
    * [[graft.operators.TextStats.greedyTokenCount]] verbatim;
    * stateless, no watermark, scales with the scan.
    */
  def tokenStatsSubwordStream(
      docs: org.apache.spark.sql.DataFrame,
      vocabCorpus: org.apache.spark.sql.DataFrame): Dataset[SubwordOut] =
    tokenStatsSubwordStreamWith(
      docs, graft.operators.TextStats.subwordVocab(vocabCorpus))

  /** [[tokenStatsSubwordStream]] through a SUPPLIED vocab frame — the
    * apply half of the tokenizer split: a persisted artifact
    * ([[graft.operators.TextStats.loadSubwordVocab]]) freezes at
    * stream start, so every micro-batch across every RESTART of the
    * stream counts tokens identically (re-training on a reference
    * corpus at each start is only stable while that corpus is).
    */
  def tokenStatsSubwordStreamWith(
      docs: org.apache.spark.sql.DataFrame,
      vocab: org.apache.spark.sql.DataFrame): Dataset[SubwordOut] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val byLen = graft.operators.TextStats.vocabByLenFrom(vocab)
    val bc = spark.sparkContext.broadcast(byLen)
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val vocab = bc.value
        val ws = text.split(" ", -1)
        var bpe = 0L
        var i = 0
        while (i < ws.length) {
          if (ws(i).nonEmpty)
            bpe += graft.operators.TextStats.greedyTokenCount(ws(i), vocab).toLong
          i += 1
        }
        val ratio = BigDecimal(bpe.toDouble / ws.length)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        SubwordOut(id, ws.length.toLong, bpe, ratio)
      })
  }

  /** The stream kernel over bounded input, vocab trained on the same
    * corpus — must equal `doc_token_stats_bpe` row for row (shared
    * oracle twin).
    */
  def batchTokenStatsSubword(docs: org.apache.spark.sql.DataFrame): Dataset[SubwordOut] =
    tokenStatsSubwordStream(docs, docs)

  // ------------------------------------------------ streaming keep verdict
  /** One ingest-time keep decision per arriving document. */
  case class KeepOut(
      doc_id: Long,
      n_tokens: Int,
      quality: Double,
      is_dup: Boolean,
      reason: String,
      keep: Boolean)

  /** (doc, content hash, per-row quality signals) entering the keep
    * stream.
    */
  case class QKeyed(doc_id: Long, h: String, n_tokens: Int, quality: Double)

  private val StopSet: Set[String] = graft.operators.TextStats.StopWords.toSet

  /** The per-row half of [[graft.operators.TextStats.quality]] as a
    * kernel — byte-identical semantics: ASCII-only char classes (the
    * batch regexes are `[A-Za-z0-9 ]`, NOT Unicode classes), all-
    * occurrence stopword counts over `split(text, ' ')` tokens (empty
    * tokens kept), the same left-associated double arithmetic, HALF_UP
    * rounding at 6 (Spark's `round`). StreamingSpec pins kernel ==
    * declarative on real data.
    */
  def qualityScore(text: String): (Int, Double) = {
    val w = text.split(" ", -1)
    val nTokens = w.length
    var nStop = 0
    var i = 0
    while (i < w.length) {
      if (StopSet.contains(w(i))) nStop += 1
      i += 1
    }
    var punct = 0
    var j = 0
    while (j < text.length) {
      val c = text.charAt(j)
      val clean =
        (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') || c == ' '
      if (!clean) punct += 1
      j += 1
    }
    if (text.isEmpty) (nTokens, Double.NaN)
    else {
      val q = math.min(1.0, nTokens.toDouble / 50) *
        (1.0 - punct.toDouble / text.length) *
        math.min(1.0, nStop.toDouble / nTokens * 5 + 0.5)
      (nTokens, BigDecimal(q).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
  }

  private def qKeyed(docs: org.apache.spark.sql.DataFrame): Dataset[QKeyed] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), md5(col("text")).as("h"), col("text"))
      .as[(Long, String, String)]
      .mapPartitions(_.map { case (id, h, t) =>
        val (n, q) = qualityScore(t)
        QKeyed(id, h, n, q)
      })
  }

  /** The keep fold over one hash group: canonical = prior state or the
    * group minimum (bounded == [[graft.operators.TextStats.keepMask]]'s
    * min-per-hash is_dup), reason precedence dup > too_short >
    * low_quality, identical to the batch verdict.
    */
  private def keepFold(rows: Iterator[QKeyed], prior: Option[Long]): (Long, Vector[KeepOut]) = {
    val sorted = rows.toSeq.sortBy(_.doc_id)
    val canonical = prior.getOrElse(sorted.head.doc_id)
    (canonical, sorted.iterator.map { d =>
      val isDup = d.doc_id != canonical
      val reason =
        if (isDup) "dup"
        else if (d.n_tokens < graft.operators.TextStats.MinTokens) "too_short"
        else if (d.quality < graft.operators.TextStats.QualityMin) "low_quality"
        else "keep"
      KeepOut(d.doc_id, d.n_tokens, d.quality, isDup, reason, reason == "keep")
    }.toVector)
  }

  /** The COMPLETE per-document keep verdict AT INGEST — what a crawler
    * actually runs online: per-row quality + length signals computed in
    * a stateless kernel, composed with the [[dedupStream]] hash state
    * (ONE long per seen hash) for the duplicate reason. Dup semantics
    * are first-ARRIVAL across batches (the streaming-native canonical,
    * as in [[dedupStream]]) and min-per-hash within a bounded input,
    * where the verdict equals the batch [[graft.operators.TextStats
    * .keepMask]] row for row — the registered bounded run shares
    * doc_keep_mask's oracle twin.
    */
  def keepStream(docs: org.apache.spark.sql.DataFrame): Dataset[KeepOut] = {
    val spark = docs.sparkSession
    import spark.implicits._
    qKeyed(docs)
      .groupByKey(_.h)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (h: String, rows: Iterator[QKeyed], state: GroupState[Long]) =>
          val (canonical, out) = keepFold(rows, state.getOption)
          state.update(canonical)
          out.iterator
      }
  }

  /** [[keepStream]]'s fold over bounded input — the oracle-checkable
    * batch harness (equals keepMask).
    */
  def batchKeep(docs: org.apache.spark.sql.DataFrame): Dataset[KeepOut] = {
    val spark = docs.sparkSession
    import spark.implicits._
    qKeyed(docs)
      .groupByKey(_.h)
      .flatMapGroups((h: String, rows: Iterator[QKeyed]) => keepFold(rows, None)._2.iterator)
  }

  case class LangOut(
      doc_id: Long,
      lang: String,
      score_en: Int,
      score_de: Int,
      score_es: Int,
      score_fr: Int,
      predicted: String,
      agrees: Boolean)

  private val LangNames: IndexedSeq[String] =
    graft.operators.TextStats.Markers.map(_._1).toIndexedSeq
  private val MarkerGroup: Map[String, Int] =
    graft.operators.TextStats.Markers.zipWithIndex
      .flatMap { case ((_, ws), i) => ws.map(_ -> i) }.toMap

  /** The per-row half of [[graft.operators.TextStats.langId]] as a
    * compiled kernel: all-occurrence marker counts over `split(text,
    * ' ')` tokens (note: a marker in two groups would double-count in
    * the batch broadcast join — the marker table is disjoint by
    * construction) and the identical first-wins argmax (first language
    * in [[graft.operators.TextStats.Markers]] order whose score is
    * positive and >= every LATER score; all-zero -> "und").
    */
  def langIdScore(doc_id: Long, lang: String, text: String): LangOut = {
    val s = new Array[Int](LangNames.length)
    val w = text.split(" ", -1)
    var i = 0
    while (i < w.length) {
      MarkerGroup.get(w(i)) match {
        case Some(g) => s(g) += 1
        case None    =>
      }
      i += 1
    }
    var predicted = "und"
    var k = 0
    var done = false
    while (k < s.length && !done) {
      if (s(k) > 0 && (k + 1 until s.length).forall(j => s(k) >= s(j))) {
        predicted = LangNames(k); done = true
      }
      k += 1
    }
    LangOut(doc_id, lang, s(0), s(1), s(2), s(3), predicted, predicted == lang)
  }

  /** Ingest-time language ID: [[langIdScore]] as a STATELESS streaming
    * map — language identification needs no corpus state, so the
    * operator is a pure per-row kernel that composes into any ingest
    * stream (the [[keepStream]] verdict chain) without adding a
    * stateful stage or a shuffle. Works identically on a streaming or
    * batch frame; the registered bounded run shares doc_lang_id's
    * oracle twin (StreamingSpec pins kernel == declarative).
    */
  def langIdStream(docs: org.apache.spark.sql.DataFrame): Dataset[LangOut] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("lang"), col("text"))
      .as[(Long, String, String)]
      .mapPartitions(_.map { case (id, lang, t) => langIdScore(id, lang, t) })
  }

  /** LM-perplexity filtering AT INGEST: each arriving document prices
    * its bigrams against a FROZEN stored LM (the
    * [[decontaminateStream]] contract — the pruned artifact is
    * kilobytes–megabytes by construction and ships in a broadcast).
    * The kernel is [[graft.operators.TextStats.lmScoreKernel]], the
    * very function the batch stored face runs, so stream ≡ batch by
    * construction: stateless per-row scoring, no watermark, no state
    * store, no shuffle — the filter scales with the scan.
    */
  def lmScoreStream(
      docs: org.apache.spark.sql.DataFrame,
      bi: Map[(String, String), Long],
      uni: Map[String, Long],
      v: Long): org.apache.spark.sql.DataFrame =
    graft.operators.TextStats.lmScoreStored(docs, bi, uni, v)

  /** Per-source running evidence for the streaming domain gate. */
  case class SourceGateState(nDocs: Long, qMicroSum: Long, nLow: Long)

  /** A source's CURRENT verdict — schema-identical to the batch
    * [[graft.operators.Corpus.sourceQualityGate]] row.
    */
  case class SourceGateOut(
      source: String,
      n_docs: Long,
      n_low: Long,
      mean_quality: Double,
      low_share: Double,
      keep_source: Boolean)

  /** Fold a batch of (quality_micro, is_low) evidence into a source's
    * state and emit its current verdict — the ONE function behind the
    * streaming face and its bounded batch harness. Evidence
    * accumulates as exact integers (each doc's rounded quality
    * quantized to micro — the batch operator's own sum terms), so the
    * running aggregates are order-free and the final verdict over
    * bounded input equals the batch gate bit-for-bit.
    */
  def sourceGateFold(
      source: String,
      rows: Iterator[(Long, Long)],
      prior: SourceGateState): (SourceGateState, SourceGateOut) = {
    var n = prior.nDocs
    var qs = prior.qMicroSum
    var low = prior.nLow
    rows.foreach { case (qm, isLow) => n += 1L; qs += qm; low += isLow }
    val st = SourceGateState(n, qs, low)
    val mean = qs.toDouble / 1e6 / n
    val lowShare = low.toDouble / n
    val out = SourceGateOut(
      source, n, low,
      BigDecimal(mean).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
      BigDecimal(lowShare).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
      mean >= graft.operators.Corpus.SourceMeanQualityMin &&
        lowShare <= graft.operators.Corpus.SourceLowShareMax)
    (st, out)
  }

  /** Per-row gate evidence: the spec-pinned [[qualityScore]] kernel,
    * quantized exactly like the batch sum term
    * `round(quality * 1000000)`.
    */
  private def gateEvidence(docs: org.apache.spark.sql.DataFrame): Dataset[(String, Long, Long)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("source"), col("text")).as[(String, String)]
      .mapPartitions(_.map { case (src, t) =>
        val (_, q) = qualityScore(t)
        val qm = BigDecimal(q * 1000000d)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
        (src, qm, if (q < graft.operators.TextStats.QualityMin) 1L else 0L)
      })
  }

  /** The domain gate AT INGEST: per-source evidence accumulates in
    * mapGroupsWithState and every micro-batch re-emits the source's
    * current verdict (update mode — a domain's keep/drop hardens as
    * its pages accrue; a spam farm flips to drop and STAYS visible as
    * drop in the sink). State is three longs per source —
    * domain-cardinality, the smallest state any face here carries;
    * no timeout because a domain's reputation has no event-time
    * expiry. Stream-final ≡ batch gate is StreamingSpec-pinned; the
    * registered bounded run shares source_quality_gate's twin.
    */
  def sourceGateStream(docs: org.apache.spark.sql.DataFrame): Dataset[SourceGateOut] = {
    val spark = docs.sparkSession
    import spark.implicits._
    gateEvidence(docs)
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (src: String, rows: Iterator[(String, Long, Long)], state: GroupState[SourceGateState]) =>
          val (st, out) = sourceGateFold(
            src, rows.map(r => (r._2, r._3)),
            state.getOption.getOrElse(SourceGateState(0L, 0L, 0L)))
          state.update(st)
          out
      }
  }

  /** The gate fold over bounded input — the oracle-checkable batch
    * harness (equals the declarative batch gate; the shared-twin
    * discipline of [[Queries.streamingDaily]]).
    */
  def batchSourceGate(docs: org.apache.spark.sql.DataFrame): Dataset[SourceGateOut] = {
    val spark = docs.sparkSession
    import spark.implicits._
    gateEvidence(docs)
      .groupByKey(_._1)
      .mapGroups { (src, rows) =>
        sourceGateFold(src, rows.map(r => (r._2, r._3)), SourceGateState(0L, 0L, 0L))._2
      }
  }
}
