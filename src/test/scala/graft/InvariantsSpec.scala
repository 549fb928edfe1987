package graft

import graft.model.{Capture, FillPolicy, TrendQuery}
import graft.operators.{Daily, GapFill, Metrics, Report, Trend}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Engine invariants (SURVEY §5.2) and pinned quirks (SURVEY §5.1). */
class InvariantsSpec extends AnyFunSuite {

  private val AsOf = "2024-03-15"

  private def caps(url: String, seed: Int, n: Int, days: Int): Seq[Capture] = {
    val rnd = new Random(seed)
    val statuses = Seq("200", "200", "301", "404", "503", "-")
    (0 until n).map { _ =>
      val day = java.time.LocalDate.of(2024, 1, 1).plusDays(rnd.nextInt(days))
      val ts = f"${day.toString.replace("-", "")}${rnd.nextInt(24)}%02d${rnd.nextInt(60)}%02d${rnd.nextInt(60)}%02d"
      (ts, statuses(rnd.nextInt(statuses.length)), f"DG${rnd.nextInt(9)}%02dXXXXXXX")
    }.sortBy(_._1).zipWithIndex.map { case ((t, s, d), i) => Capture(url, t, s, d, i.toLong) }
  }

  private lazy val fixture = caps("a", 11, 300, 40) ++ caps("b", 12, 40, 70)

  test("scores stay in [0,1]; call = sum of counts; filled => call = 0") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rows = Trend.run(fixture.toDF(), TrendQuery(-1, FillPolicy.Forward, AsOf)).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.resilience >= 0 && r.resilience <= 1, s"resilience ${r.resilience}")
      assert(r.fixity >= 0 && r.fixity <= 1)
      assert(r.chaos >= 0 && r.chaos <= 1)
      assert(r.chaosn >= 0 && r.chaosn <= 1)
      assert(r.call == r.c2xx + r.c3xx + r.c4xx + r.c5xx)
      if (r.filled) assert(r.call == 0)
    }
  }

  test("pipeline is invariant under input row order and partitioning") {
    val spark = TestSpark.spark
    import spark.implicits._
    val q = TrendQuery(-1, FillPolicy.Closest, AsOf)
    val base = Trend.run(fixture.toDF(), q).collect().sortBy(r => (r.url, r.day))
    val shuffled = Trend.run(
      new Random(99).shuffle(fixture).toDF().repartition(7), q)
      .collect().sortBy(r => (r.url, r.day))
    assert(base.toSeq == shuffled.toSeq)
  }

  test("fused single-shuffle run equals the staged declarative pipeline") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = fixture.toDF()
    for (p <- FillPolicy.all; fill <- Seq(-1, 0, 3)) {
      val q = TrendQuery(fill, p, AsOf)
      val fused = Trend.run(df, q).collect().sortBy(r => (r.url, r.day))
      val staged = Trend.runStaged(df, q).collect().sortBy(r => (r.url, r.day))
      assert(fused.toSeq == staged.toSeq, s"fused != staged for policy=$p fill=$fill")
    }
  }

  test("fillDays (in-memory) generates exactly the DataFrame fill rows") {
    val spark = TestSpark.spark
    import spark.implicits._
    val daily = Daily.fromCaptures(fixture.toDF())
    val observed = daily.select("url", "day", "specimen").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
      .groupBy(_._1)
      .map { case (u, rs) => u -> rs.sortBy(_._2).map(t => (t._2, t._3)).toIndexedSeq }
    for (p <- FillPolicy.all; f <- Seq(-1, 2)) {
      val dfFills = GapFill.fill(daily, f, p)
        .filter(col("datetime") === "~")
        .select("url", "day", "specimen").collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
      val pure = observed.flatMap { case (u, obs) =>
        GapFill.fillDays(obs, f, p).map { case (d, sp) => (u, d, sp) }
      }.toSet
      assert(pure == dfFills, s"fillDays != fill for policy=$p fill=$f")
    }
  }

  test("densify yields empty calendar when first day is after asOf") {
    val spark = TestSpark.spark
    import spark.implicits._
    val future = Seq(Capture("z", "20250601120000", "200", "DIGFUTURE__", 0L))
    val daily = Daily.fromCaptures(future.toDF())
    assert(GapFill.densify(daily, AsOf).count() == 0)
  }

  test("fill policies never touch observed days and respect the bound") {
    val spark = TestSpark.spark
    import spark.implicits._
    val daily = Daily.fromCaptures(fixture.toDF())
    val observed = daily.select("url", "day").collect().map(r => (r.getString(0), r.getString(1))).toSet
    for (p <- FillPolicy.all) {
      val filled = GapFill.fill(daily, 2, p)
      val fRows = filled.filter(col("datetime") === "~").select("url", "day").collect()
      fRows.foreach { r =>
        assert(!observed.contains((r.getString(0), r.getString(1))), s"$p filled an observed day")
      }
      // bound: no fill row may sit in a gap wider than 2
      val obsByUrl = observed.groupBy(_._1).map { case (u, s) => u -> s.map(_._2).toSeq.sorted }
      fRows.foreach { r =>
        val days = obsByUrl(r.getString(0))
        val d = r.getString(1)
        val prev = days.filter(_ < d).last
        val next = days.filter(_ > d).head
        val gap = java.time.temporal.ChronoUnit.DAYS
          .between(java.time.LocalDate.parse(prev), java.time.LocalDate.parse(next)) - 1
        assert(gap <= 2, s"$p filled inside gap of $gap")
      }
    }
  }

  test("transition matrix: first-row deadlock pins the matrix at zero") {
    val spark = TestSpark.spark
    import spark.implicits._
    // url "dead": first densified day has specimen "~" (gap before asOf
    // start?) — construct directly: one capture day, then densify from a
    // '-'-only day so the first day's specimen is "~"
    val capsDead = Seq(
      Capture("dead", "20240101120000", "-", "NEVERSEEN__", 0L), // resolves "~"
      Capture("dead", "20240103120000", "200", "DIGA_______", 1L))
    val densified = GapFill.densify(Daily.fromCaptures(capsDead.toDF()), "2024-01-10")
    val m = Report.transitions(densified).collect()
    assert(m.length == 16)
    assert(m.forall(_.getLong(3) == 0L), "deadlocked matrix must stay all-zero")
  }

  test("transition matrix: invalid specimens are transparent") {
    val spark = TestSpark.spark
    import spark.implicits._
    // 2xx, ~, ~, 4xx => one 2xx->4xx transition (the ~ days are skipped
    // without advancing the pointer)
    val capsOk = Seq(
      Capture("u", "20240101120000", "200", "DIGA_______", 0L),
      Capture("u", "20240104120000", "404", "DIGB_______", 1L))
    val densified = GapFill.densify(Daily.fromCaptures(capsOk.toDF()), "2024-01-04")
    val m = Report.transitions(densified)
      .filter(col("cnt") > 0).collect()
    assert(m.length == 1)
    assert(m.head.getString(1) == "2xx" && m.head.getString(2) == "4xx" && m.head.getLong(3) == 1L)
  }

  test("ymd matches the reference formatter") {
    val spark = TestSpark.spark
    import spark.implicits._
    // pins computed from the reference ymd (main.py:31-42)
    val pins = Seq(
      0 -> "", 1 -> "1d", 15 -> "15d", 16 -> "16d", 29 -> "29d", 30 -> "1m",
      45 -> "1m15d", 47 -> "1m17d", 200 -> "6m20d", 220 -> "7m",
      359 -> "1y", 364 -> "1y", 365 -> "1y", 380 -> "1y", 382 -> "1y1m",
      730 -> "2y", 3650 -> "10y")
    val got = pins.map(_._1).toDF("d")
      .select(col("d"), Metrics.ymd(col("d")).as("s"))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    pins.foreach { case (d, want) => assert(got(d) == want, s"ymd($d)") }
  }

  test("parseLines seq preserves line order across input splits") {
    val spark = TestSpark.spark
    val lines = (0 until 5000).map { i =>
      f"202401${1 + i / 2000}%02d${i % 86400}%06d ${if (i % 3 == 0) "200" else "404"} DIG$i%06dXX"
    }
    val f = java.nio.file.Files.createTempFile("cdx", ".txt")
    java.nio.file.Files.write(f, String.join("\n", lines: _*).getBytes)
    val old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try {
      spark.conf.set("spark.sql.files.maxPartitionBytes", "8192") // force many splits
      val parsed = graft.sources.Cdx.parseLines(spark, spark.read.text(f.toString), "u")
      assert(parsed.rdd.getNumPartitions > 1, "fixture must actually split")
      val got = parsed.collect().sortBy(_.getLong(4)).map(r => (r.getString(1), r.getString(2)))
      val want = lines.map { l => val p = l.split(" "); (p(0), p(1)) }
      assert(got.toSeq == want)
    } finally {
      spark.conf.set("spark.sql.files.maxPartitionBytes", old)
      java.nio.file.Files.delete(f)
    }
  }

  test("warm path: re-parameterization from the same daily table only moves scores") {
    // the reference's Entry-3 cache split (main.py:129 vs 186): load_cdx
    // cached, fill+score re-run on slider change
    val spark = TestSpark.spark
    import spark.implicits._
    import graft.model.SigParams
    val daily = Daily.fromCaptures(fixture.toDF()).persist()
    val q1 = TrendQuery(-1, FillPolicy.Forward, AsOf)
    val q2 = q1.copy(params = SigParams.defaults.updated("2xx", SigParams(2, 5, 1)))
    val a = Trend.runFromDaily(daily, q1).collect().sortBy(r => (r.url, r.day))
    val b = Trend.runFromDaily(daily, q2).collect().sortBy(r => (r.url, r.day))
    daily.unpersist()
    assert(a.length == b.length)
    var scoresDiffer = false
    a.zip(b).foreach { case (x, y) =>
      assert(x.copy(resilience = 0, fixity = 0) == y.copy(resilience = 0, fixity = 0),
        "non-score columns must be identical across re-parameterization")
      if (x.resilience != y.resilience) scoresDiffer = true
    }
    assert(scoresDiffer, "changed 2xx params must move resilience somewhere")
  }

  test("chaosn over >1000 captures uses the 999-indicator window") {
    val spark = TestSpark.spark
    import spark.implicits._
    // alternating statuses: every capture is a transition. After 1200
    // captures, uw = 999 indicators, denominator min(1000, 1200) = 1000
    // -> chaosn = 0.999 (the replicated reference off-by-one).
    val alternating = (0 until 1200).map { i =>
      val ts = f"20240101${i / 3600}%02d${(i / 60) % 60}%02d${i % 60}%02d"
      Capture("c", ts, if (i % 2 == 0) "200" else "404", f"DD$i%04dXXXX", i.toLong)
    }
    val last = Daily.fromCaptures(alternating.toDF())
      .orderBy(col("day").desc).limit(1).collect().head
    assert(math.abs(last.getAs[Double]("chaosn") - 0.999) < 1e-12)
    assert(math.abs(last.getAs[Double]("chaos") - 1.0) < 1e-12)
  }

  test("dailyAnomalies: spikes over flat history flag at z=0; cold start and empty windows never flag") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rows =
      (1 to 7).map(i => ("a", f"2024-01-$i%02d", 10L)) ++ Seq(
        ("a", "2024-01-08", 30L), // zero-variance history, dev != 0
        ("a", "2024-01-09", 10L)) ++
        Seq(("b", "2024-01-01", 50L), ("b", "2024-01-02", 0L)) // win_n < 3
    val daily = rows.toDF("url", "day", "c2xx")
      .withColumn("c3xx", lit(0L)).withColumn("c4xx", lit(0L)).withColumn("c5xx", lit(0L))
    val out = Metrics.dailyAnomalies(daily).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(3), r.getDouble(4), r.getDouble(5), r.getBoolean(6)))).toMap
    // flat 7x10 history, x=30: variance 0 so z reports 0.0, but the
    // integer rule (dev^2 > 9*0) still flags
    assert(out(("a", "2024-01-08")) == ((7L, 10.0, 0.0, true)))
    // next day: window {10x6, 30}, x=10 -> dev=-20, varnum=2400: inside 3 sigma
    val (n9, _, z9, f9) = out(("a", "2024-01-09"))
    assert(n9 == 7L && !f9 && z9 < 0)
    assert(!out(("b", "2024-01-02"))._4, "two-day history is below the minimum window")
    assert(out(("a", "2024-01-01")) == ((0L, 0.0, 0.0, false)), "empty trailing window")
  }
}
