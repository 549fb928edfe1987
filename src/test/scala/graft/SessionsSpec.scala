package graft

import graft.operators.Sessions
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Event row for MemoryStream encoders (top-level for Encoder derivation). */
case class SessEv(user_id: Long, ts: java.sql.Timestamp, value: Double)

/** Typed event row for funnel/markov tests (needs type + id columns). */
case class FunEv(user_id: Long, event_id: Long, ts: java.sql.Timestamp, event_type: String)

/** Gap-based sessionization: session_window merge semantics at the gap
  * boundary, and streaming ≡ batch on watermark-closed sessions.
  */
class SessionsSpec extends AnyFunSuite {

  private def ts(h: Long, m: Long = 0): java.sql.Timestamp =
    new java.sql.Timestamp(
      java.time.Instant.parse("2024-01-01T00:00:00Z").toEpochMilli + (h * 60 + m) * 60000)

  test("sessionize: exactly-gap merges (inclusive close), over-gap splits; exact sums and bounds") {
    val spark = TestSpark.spark
    import spark.implicits._
    val evs = Seq(
      SessEv(1L, ts(0), 1.25),
      SessEv(1L, ts(12), 2.50), // exactly 12 h after prev: still merges (inclusive)
      SessEv(1L, ts(24, 1), 0.25), // 12h01 after prev -> new session
      SessEv(2L, ts(5), 4.00))
    val out = Sessions.sessionize(evs.toDF()).orderBy("user_id", "session_seq").collect()
    assert(out.length == 3, out.mkString("; "))
    val s1 = out(0)
    assert(s1.getLong(0) == 1L && s1.getInt(1) == 1 && s1.getLong(4) == 2L)
    assert(s1.getDouble(5) == 3.75)
    assert(s1.getLong(2) == ts(0).getTime * 1000 && s1.getLong(3) == ts(12).getTime * 1000,
      "bounds must be the min/max event timestamps, not the open window end")
    assert(out(1).getInt(1) == 2 && out(1).getLong(4) == 1L)
    assert(out(2).getLong(0) == 2L && out(2).getInt(1) == 1)
  }

  test("streaming sessionization equals batch on watermark-closed sessions") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(7)
    val evs = (0 until 400).map { _ =>
      SessEv(rnd.nextInt(5).toLong, ts(rnd.nextInt(200).toLong, rnd.nextInt(60).toLong),
        rnd.nextInt(1000) / 100.0)
    }.sortBy(_.ts.getTime)
    // far-future sentinel pushes the watermark past every real session
    val sentinel = SessEv(99L, ts(100000), 0.0)

    val stream = MemoryStream[SessEv]
    val q = Sessions.sessionizeStream(stream.toDS().toDF(), "0 seconds")
      .writeStream.format("memory").queryName("sess_stream").outputMode("append").start()
    try {
      Seq(evs.take(150), evs.drop(150), Seq(sentinel)).foreach { c =>
        stream.addData(c); q.processAllAvailable()
      }
    } finally q.stop()

    val streamed = spark.table("sess_stream").filter(col("user_id") =!= 99L)
      .orderBy("user_id", "start_us").collect().map(_.toSeq).toSeq
    val batch = Sessions.sessionize(evs.toDF())
      .select("user_id", "start_us", "end_us", "n_events", "sum_value")
      .orderBy("user_id", "start_us").collect().map(_.toSeq).toSeq
    assert(streamed == batch,
      s"streamed ${streamed.length} vs batch ${batch.length} sessions")
  }

  test("retention: first-day cohorts; one hit per user per cell; pct against cohort size") {
    val spark = TestSpark.spark
    import spark.implicits._
    def dayTs(d: Int, h: Long = 0): java.sql.Timestamp = ts((d - 1) * 24L + h)
    // users 1,2 cohort Jan 1; user 3 cohort Jan 2.
    // user 1 active d1, d3 (twice — must count once); user 2 only d1;
    // user 3 active d2 and d3.
    val evs = Seq(
      SessEv(1L, dayTs(1), 0), SessEv(1L, dayTs(3), 0), SessEv(1L, dayTs(3, 5), 0),
      SessEv(2L, dayTs(1, 2), 0),
      SessEv(3L, dayTs(2), 0), SessEv(3L, dayTs(3), 0))
    val out = Sessions.retention(evs.toDF()).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(out(("2024-01-01", 0L)) == ((2L, 2L, 100.0)))
    assert(out(("2024-01-01", 2L)) == ((1L, 2L, 50.0)), "user 1's double-event day counts once")
    assert(out(("2024-01-02", 0L)) == ((1L, 1L, 100.0)))
    assert(out(("2024-01-02", 1L)) == ((1L, 1L, 100.0)))
    assert(!out.contains(("2024-01-01", 1L)), "no Jan-1 user was active on day 2")
  }

  test("funnel: strictly-after chain; ties don't qualify; first-touch timestamps") {
    val spark = TestSpark.spark
    import spark.implicits._
    def us(h: Long): Long = ts(h).getTime * 1000
    val evs = Seq(
      // user 1: click tying the first view must NOT qualify (strict >);
      // the purchase before any qualified click must not either.
      FunEv(1L, 1L, ts(0), "view"),
      FunEv(1L, 2L, ts(0), "click"),
      FunEv(1L, 3L, ts(1), "purchase"),
      FunEv(1L, 4L, ts(2), "click"),
      FunEv(1L, 5L, ts(3), "purchase"),
      // user 2: click precedes the first view -> stuck at step 1
      FunEv(2L, 6L, ts(0), "click"),
      FunEv(2L, 7L, ts(1), "view"),
      // user 3: never views -> zero steps
      FunEv(3L, 8L, ts(0), "purchase"))
    val out = Sessions.funnel(evs.toDF()).collect()
      .map(r => r.getLong(0) ->
        ((r.getInt(1), Option(r.get(2)), Option(r.get(3)), Option(r.get(4))))).toMap
    assert(out(1L) == ((3, Some(us(0)), Some(us(2)), Some(us(3)))),
      "earliest strictly-ordered chain: view@0 -> click@2 -> purchase@3")
    assert(out(2L) == ((1, Some(us(1)), None, None)))
    assert(out(3L) == ((0, None, None, None)))
  }

  test("markov: lag within user only; exact counts; row-normalized p") {
    val spark = TestSpark.spark
    import spark.implicits._
    val evs = Seq(
      FunEv(1L, 1L, ts(0), "a"), FunEv(1L, 2L, ts(1), "b"), FunEv(1L, 3L, ts(2), "b"),
      FunEv(2L, 4L, ts(0), "b"), FunEv(2L, 5L, ts(1), "a"))
    val out = Sessions.markovTransitions(evs.toDF()).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(out.size == 3, "user boundary must not create a cross-user transition")
    assert(out(("a", "b")) == ((1L, 1L, 1.0)))
    assert(out(("b", "b")) == ((1L, 2L, 0.5)))
    assert(out(("b", "a")) == ((1L, 2L, 0.5)))
  }
}
