package graft

import graft.model.{FillPolicy, SigParams, TrendQuery}
import graft.sources.CdxSource
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Full-stack integration: CDX page files -> DataSourceV2 (pushdown,
  * page partitions, seq order) -> TrendMachine -> reference-port
  * parity. Every layer the library ships, chained once.
  */
class EndToEndSpec extends AnyFunSuite {

  test("page files through CdxSource and TrendMachine match the reference port") {
    val spark = TestSpark.spark
    val rnd = new Random(123)
    val statuses = Seq("200", "200", "301", "404", "503", "-")
    val lines = (0 until 400).map { _ =>
      val day = java.time.LocalDate.of(2024, 1, 1).plusDays(rnd.nextInt(30))
      val ts = f"${day.toString.replace("-", "")}${rnd.nextInt(86400)}%06d"
      (ts, statuses(rnd.nextInt(statuses.length)), f"EE${rnd.nextInt(6)}%02dZZZZZZZ")
    }.sortBy(_._1)

    // 4 page files for url "e2e", plus decoy lines for another url that
    // the pushed filter must exclude
    val dir = java.nio.file.Files.createTempDirectory("e2e_pages").toFile
    lines.grouped(100).zipWithIndex.foreach { case (chunk, i) =>
      val w = new java.io.PrintWriter(new java.io.File(dir, f"page-$i%03d"), "UTF-8")
      chunk.foreach { case (ts, s, d) => w.println(s"e2e $ts $s $d") }
      w.println(s"decoy 20240101000000 200 DECOYDIGEST")
      w.close()
    }

    val captures = spark.read.format(CdxSource.Name)
      .option("path", dir.getPath).load()
      .filter(col("url") === "e2e")

    val asOf = "2024-02-15"
    val result = TrendMachine.run(captures, TrendQuery(-1, FillPolicy.Closest, asOf))
    val got = result.scored.collect().sortBy(_.day)

    val params = SigParams.defaults.map { case (k, p) => k -> (p.shift, p.slope, p.spread) }
    val want = ReferencePort.loadData(lines, -1, "closest", asOf, params)

    assert(got.length == want.length)
    got.zip(want).foreach { case (g, w) =>
      assert(g.day == w.day && g.specimen == w.specimen && g.content == w.content)
      assert(g.c2xx == w.c2xx && g.c3xx == w.c3xx && g.c4xx == w.c4xx && g.c5xx == w.c5xx)
      assert(math.abs(g.resilience - w.resilience) < 1e-12, s"${g.day} resilience")
      assert(math.abs(g.fixity - w.fixity) < 1e-12)
      assert(math.abs(g.chaos - w.chaos) < 1e-12)
      assert(math.abs(g.chaosn - w.chaosn) < 1e-12)
    }
    // the decoy url never leaked through the pushed filter
    assert(got.forall(_.url == "e2e"))
    // headline row consistent with the series
    val h = result.headline.filter(col("url") === "e2e").collect().head
    assert(h.getAs[String]("last_day") == got.map(_.day).max)
  }
}
