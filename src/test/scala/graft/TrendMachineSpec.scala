package graft

import graft.model.{Capture, FillPolicy, TrendQuery}
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** The public facade produces a consistent bundle. */
class TrendMachineSpec extends AnyFunSuite {

  test("run returns consistent frames for a multi-url capture set") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rnd = new Random(77)
    val caps = (0 until 120).map { i =>
      val day = java.time.LocalDate.of(2024, 1, 1).plusDays(rnd.nextInt(20))
      val ts = f"${day.toString.replace("-", "")}${rnd.nextInt(86400)}%06d"
      Capture(s"u${i % 3}", ts, Seq("200", "404", "301")(rnd.nextInt(3)), f"D${rnd.nextInt(4)}%02dXXXXXXX", i.toLong)
    }.sortBy(c => (c.ts, c.seq)).zipWithIndex.map { case (c, i) => c.copy(seq = i.toLong) }

    val r = TrendMachine.run(caps.toDF(), TrendQuery(-1, FillPolicy.Forward, "2024-02-01"))
    val scored = r.scored.collect()
    assert(scored.nonEmpty)
    assert(r.daily.count() > 0)
    assert(r.transitions.count() == 3 * 16, "16 grid cells per url")
    val head = r.headline.collect()
    assert(head.length == 3, "one headline row per url")
    // headline last_day equals the scored series' max day per url
    val lastByUrl = scored.groupBy(_.url).map { case (u, rs) => u -> rs.map(_.day).max }
    head.foreach { h =>
      assert(h.getAs[String]("last_day") == lastByUrl(h.getAs[String]("url")))
    }
  }
}
