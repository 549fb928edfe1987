package graft

import graft.model.{Capture, FillPolicy, SigParams, TrendQuery}
import graft.operators.Trend
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Golden parity: the Spark window/aggregate pipeline vs an independent
  * line-by-line port of the reference algorithm ([[ReferencePort]]), on
  * fixtures that exercise every tricky path: >1000 captures in one url
  * (chaosn ring-buffer warmup + off-by-one), revisit records before and
  * after their digest's first real status, same-day priority ties,
  * multi-day gaps under every fill policy, and the unobserved decay tail.
  */
class ScoreParitySpec extends AnyFunSuite {

  private val AsOf = "2024-04-15"

  private def fixture(url: String, seed: Int, n: Int, days: Int): Seq[Capture] = {
    val rnd = new Random(seed)
    val statuses = Seq("200", "200", "200", "301", "404", "503", "-", "-", "200", "404")
    val lines = (0 until n).map { _ =>
      val day = java.time.LocalDate.of(2024, 1, 1).plusDays(rnd.nextInt(days))
      val ts = f"${day.toString.replace("-", "")}${rnd.nextInt(24)}%02d${rnd.nextInt(60)}%02d${rnd.nextInt(60)}%02d"
      val status = statuses(rnd.nextInt(statuses.length))
      val digest = f"DIGEST${rnd.nextInt(12)}%02dREMAINDER"
      (ts, status, digest)
    }.sortBy(_._1)
    lines.zipWithIndex.map { case ((ts, s, d), i) => Capture(url, ts, s, d, i.toLong) }
  }

  private val params = SigParams.defaults.map { case (k, p) => k -> (p.shift, p.slope, p.spread) }

  private def check(policy: FillPolicy, fill: Int, caps: Map[String, Seq[Capture]]): Unit = {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = caps.values.flatten.toSeq.toDF()
    val got = Trend.run(df, TrendQuery(fill, policy, AsOf))
      .collect().groupBy(_.url).map { case (u, rows) => u -> rows.sortBy(_.day) }

    for ((url, capSeq) <- caps) {
      val want = ReferencePort.loadData(
        capSeq.map(c => (c.ts, c.status, c.digest)), fill, policy.name, AsOf, params)
      val rows = got(url)
      assert(rows.length == want.length, s"$url day count (${policy.name})")
      for ((g, w) <- rows.zip(want)) {
        assert(g.day == w.day, s"$url day")
        assert(g.c2xx == w.c2xx && g.c3xx == w.c3xx && g.c4xx == w.c4xx && g.c5xx == w.c5xx,
          s"$url ${g.day} counts (${policy.name})")
        assert(g.specimen == w.specimen, s"$url ${g.day} specimen (${policy.name})")
        assert(g.datetime == w.datetime, s"$url ${g.day} datetime")
        assert(g.digest == w.digest, s"$url ${g.day} digest")
        assert(g.content == w.content, s"$url ${g.day} content")
        assert(g.filled == w.filled, s"$url ${g.day} filled")
        assert(math.abs(g.chaos - w.chaos) < 1e-12, s"$url ${g.day} chaos ${g.chaos} vs ${w.chaos}")
        assert(math.abs(g.chaosn - w.chaosn) < 1e-12, s"$url ${g.day} chaosn ${g.chaosn} vs ${w.chaosn}")
        assert(math.abs(g.resilience - w.resilience) < 1e-12,
          s"$url ${g.day} resilience ${g.resilience} vs ${w.resilience}")
        assert(math.abs(g.fixity - w.fixity) < 1e-12, s"$url ${g.day} fixity")
      }
    }
  }

  private val fixtures: Map[String, Seq[Capture]] = Map(
    // dense: 1400 captures over 45 days -> crosses the 1000-capture
    // ring-buffer boundary mid-stream
    "dense" -> fixture("dense", seed = 1, n = 1400, days = 45),
    // sparse: 60 captures over 90 days -> real multi-day gaps
    "sparse" -> fixture("sparse", seed = 2, n = 60, days = 90),
    // tiny: single day, exercises the first-day edge + long decay tail
    "tiny" -> fixture("tiny", seed = 3, n = 5, days = 1))

  test("parity: fill disabled") { check(FillPolicy.Forward, 0, fixtures) }
  test("parity: forward fill any gap") { check(FillPolicy.Forward, -1, fixtures) }
  test("parity: backward fill any gap") { check(FillPolicy.Backward, -1, fixtures) }
  test("parity: closest fill any gap") { check(FillPolicy.Closest, -1, fixtures) }
  test("parity: identical fill any gap") { check(FillPolicy.Identical, -1, fixtures) }
  test("parity: bounded fill (gap <= 3)") { check(FillPolicy.Forward, 3, fixtures) }

  test("parity: revisit before first real status resolves to ~") {
    // a '-' record whose digest has no earlier real status must resolve
    // to "~" (order sensitivity of A4, reference main.py:148-151)
    val caps = Seq(
      Capture("u", "20240101080000", "-", "DIGX_FIRST", 0L),
      Capture("u", "20240101090000", "200", "DIGX_FIRST", 1L),
      Capture("u", "20240102080000", "-", "DIGX_FIRST", 2L))
    check(FillPolicy.Forward, -1, Map("u" -> caps))
  }

  test("parity: junk status codes bucket lexicographically") {
    // "30x" passes the string range check -> "3xx"; "foo" and "600" do
    // not -> pass through and are dropped by incr (counts stay 0)
    val caps = Seq(
      Capture("u", "20240101080000", "30x", "D1_________", 0L),
      Capture("u", "20240101090000", "200", "D2_________", 1L),
      Capture("u", "20240102080000", "600", "D3_________", 2L),
      Capture("u", "20240102090000", "404", "D4_________", 3L))
    check(FillPolicy.Forward, -1, Map("u" -> caps))
  }
}
