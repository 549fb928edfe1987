package graft

import graft.sources.CdxSource
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DataSourceV2 behavior: pagination -> partitions, seq determinism,
  * url-filter pushdown, column pruning.
  */
class CdxSourceSpec extends AnyFunSuite {

  private lazy val pagesDir: java.io.File = {
    val d = java.nio.file.Files.createTempDirectory("cdxsrc").toFile
    // 3 pages, 2 urls interleaved; lexicographic page-name order
    val pages = Seq(
      Seq("a 20240101000000 200 DIGA0", "b 20240101000001 404 DIGB0", "a 20240101000002 - DIGA0"),
      Seq("a 20240102000000 503 DIGA1", "b 20240102000001 200 DIGB1"),
      Seq("b 20240103000000 301 DIGB2", "a 20240103000001 200 DIGA2"))
    pages.zipWithIndex.foreach { case (lines, i) =>
      val w = new java.io.PrintWriter(new java.io.File(d, f"page-$i%03d"), "UTF-8")
      lines.foreach(w.println)
      w.close()
    }
    d
  }

  private def read = TestSpark.spark.read.format(CdxSource.Name)
    .option("path", pagesDir.getPath).load()

  test("pages become partitions and seq encodes (page, offset)") {
    val df = read
    assert(df.rdd.getNumPartitions == 3)
    val rows = df.collect().sortBy(_.getLong(4))
    assert(rows.length == 7)
    assert(rows.head.getString(1) == "20240101000000")
    // page 1 offset 0 -> seq = 1 << 32
    assert(rows.map(_.getLong(4)).contains(1L << 32))
    // global (page, offset) order == line order
    assert(rows.map(_.getString(1)).toSeq == rows.map(_.getString(1)).toSeq.sorted)
  }

  test("maxPages caps planned partitions (MAXCDXPAGES analog)") {
    val df = TestSpark.spark.read.format(CdxSource.Name)
      .option("path", pagesDir.getPath).option("maxPages", "2").load()
    assert(df.rdd.getNumPartitions == 2)
    assert(df.count() == 5)
  }

  test("url equality filter is pushed to the reader") {
    val df = read.filter(col("url") === "a")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("urlFilter=Some(a)"), s"filter not pushed:\n$plan")
    assert(df.collect().forall(_.getString(0) == "a"))
    assert(df.count() == 4)
  }

  test("column pruning reaches the scan") {
    val df = read.select("ts", "status")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("digest"), s"digest not pruned:\n$plan")
    assert(df.columns.toSeq == Seq("ts", "status"))
    assert(df.collect().length == 7)
  }

  test("source scan matches parseLines semantics per url") {
    val spark = TestSpark.spark
    val viaSource = read.filter(col("url") === "a")
      .select("url", "ts", "status", "digest", "seq")
      .collect().sortBy(_.getLong(4))
      .map(r => (r.getString(1), r.getString(2), r.getString(3)))
    val lines = Seq(
      "20240101000000 200 DIGA0", "20240101000002 - DIGA0",
      "20240102000000 503 DIGA1", "20240103000001 200 DIGA2")
    import spark.implicits._
    val viaParse = graft.sources.Cdx
      .parseLines(spark, lines.toDF("value"), "a")
      .collect().sortBy(_.getLong(4))
      .map(r => (r.getString(1), r.getString(2), r.getString(3)))
    assert(viaSource.toSeq == viaParse.toSeq)
  }

  test("readEvents is zone-independent on micros-NTZ files") {
    val spark = TestSpark.spark
    val tzKey = "spark.sql.session.timeZone"
    val utc = graft.sources.Cdx.readEvents(spark, "/root/testdata/sf0.001")
      .select(col("event_id"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val prev = spark.conf.get(tzKey)
    spark.conf.set(tzKey, "America/New_York")
    try {
      val ny = graft.sources.Cdx.readEvents(spark, "/root/testdata/sf0.001")
        .select(col("event_id"), unix_micros(col("ts")).as("us"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
      // the naive-wall-clock==UTC contract must hold under ANY session
      // zone: an NTZ→LTZ cast here would shift every instant by -5h/-4h
      assert(ny.toSeq == utc.toSeq, "ts instants shifted under a non-UTC session zone")
    } finally spark.conf.set(tzKey, prev)
  }

  test("readEvents falls back to raw int64 ONLY on the nanos footer; other errors rethrow") {
    val spark = TestSpark.spark
    // nanos fixture: TIMESTAMP(NANOS) footer routes to the int64 path
    val nanosDir = java.nio.file.Files.createTempDirectory("graft-ev-nanos")
    val res = getClass.getResourceAsStream("/events_nanos.parquet")
    assert(res != null, "events_nanos.parquet fixture missing from test resources")
    java.nio.file.Files.copy(res, nanosDir.resolve("events.parquet"))
    val rows = graft.sources.Cdx.readEvents(spark, nanosDir.toString)
      .select(col("event_id"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(rows.length == 20)
    // fixture row i = 2024-01-01T00:00:00Z + i hours, nanos -> exact micros
    assert(rows(0) == (0L, 1704067200000000L))
    assert(rows(5) == (5L, 1704067200000000L + 5L * 3600000000L))

    // a corrupt footer must surface as ITSELF, not route silently into
    // the raw-int64 fallback and fail later with a confusing shape
    val corruptDir = java.nio.file.Files.createTempDirectory("graft-ev-corrupt")
    java.nio.file.Files.write(corruptDir.resolve("events.parquet"),
      "this is not a parquet file".getBytes("UTF-8"))
    // no collect(): the PROBE must throw, proving the error wasn't
    // swallowed into a lazy fallback that only fails much later
    intercept[Exception] {
      graft.sources.Cdx.readEvents(spark, corruptDir.toString)
    }
    // a missing path likewise rethrows instead of falling back
    intercept[Exception] {
      graft.sources.Cdx.readEvents(spark, "/definitely/not/a/dir")
    }
  }
}
