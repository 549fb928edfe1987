package graft

import java.net.InetSocketAddress

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The HTTP ingestion mode of the CDX source, driven against a loopback
  * server that speaks the reference's protocol: `showNumPages=true`
  * answers the page count, `page=N` answers fl-projected 3-field lines
  * (main.py:112-126). No egress — everything is 127.0.0.1.
  */
class CdxHttpSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val pages = Vector(
    Vector("20240101000000 200 AAAA1111", "20240101010000 404 BBBB2222"),
    Vector("20240102000000 200 CCCC3333"),
    Vector("20240103000000 - DDDD4444", "20240103010000 503 EEEE5555"))

  private var server: HttpServer = _
  private var endpoint: String = _
  // executor request threads record concurrently: a read-modify-write on
  // a List var can lose entries, making the query-param assertions flaky
  private val requests = new java.util.concurrent.ConcurrentLinkedQueue[String]()

  override def beforeAll(): Unit = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/cdx", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val q = Option(ex.getRequestURI.getQuery).getOrElse("")
        requests.add(q)
        val params = q.split("&").map(_.split("=", 2)).collect {
          case Array(k, v) => k -> java.net.URLDecoder.decode(v, "UTF-8")
        }.toMap
        val body =
          if (params.get("showNumPages").contains("true")) s"${pages.size}\n"
          else pages(params("page").toInt).mkString("", "\n", "\n")
        val bytes = body.getBytes("UTF-8")
        ex.sendResponseHeaders(200, bytes.length.toLong)
        ex.getResponseBody.write(bytes)
        ex.close()
      }
    })
    server.start()
    endpoint = s"http://127.0.0.1:${server.getAddress.getPort}/cdx"
  }

  override def afterAll(): Unit = if (server != null) server.stop(0)

  private def scan(maxPages: Option[Int] = None) = {
    val r = TestSpark.spark.read.format(graft.sources.CdxSource.Name)
      .option("endpoint", endpoint)
      .option("url", "http://example.com/")
    maxPages.fold(r)(m => r.option("maxPages", m.toString)).load()
  }

  test("http scan: one partition per server page, rows in stream order") {
    val df = scan()
    assert(df.rdd.getNumPartitions == pages.size, "one InputPartition per CDX page")
    val rows = df.orderBy("seq").collect()
    assert(rows.length == pages.map(_.size).sum)
    assert(rows.forall(_.getString(0) == "http://example.com/"),
      "url column is the scan key for fl-projected lines")
    assert(rows.map(_.getString(1)).toSeq == pages.flatten.map(_.split(" ")(0)).toSeq,
      "timestamps in page-major stream order")
    // seq encodes (page, offset): page 1's first line follows page 0's last
    assert(rows.map(_.getLong(4)).toSeq == rows.map(_.getLong(4)).sorted.toSeq)
  }

  test("http scan: server receives the reference's query params") {
    requests.clear()
    scan().collect()
    import scala.jdk.CollectionConverters._
    val seen = requests.asScala.toList
    assert(seen.exists(_.contains("showNumPages=true")), "page-count probe sent")
    assert(seen.exists(q => q.contains("fl=timestamp,statuscode,digest") && q.contains("page=0")),
      "per-page GET carries the fl= projection")
  }

  test("http scan honors the reference's page cap") {
    assert(scan(maxPages = Some(2)).rdd.getNumPartitions == 2)
    assert(scan(maxPages = Some(2)).count() == pages.take(2).map(_.size).sum)
  }

  // per-url page sets for the multi-url mode: distinct page counts so
  // the (url, page) fan-out is observable in the partition count
  private val perUrl = Map(
    "u-a" -> Vector(
      Vector("20240101000000 200 AA000001", "20240101010000 200 AA000002"),
      Vector("20240102000000 404 AA000003")),
    "u-b" -> Vector(
      Vector("20240101000000 200 BB000001"),
      Vector("20240102000000 503 BB000002"),
      Vector("20240103000000 200 BB000003", "20240103010000 - BB000004")),
    "u-c" -> Vector(
      Vector("20240101000000 301 CC000001")))

  private def multiScan() =
    TestSpark.spark.read.format(graft.sources.CdxSource.Name)
      .option("endpoint", s"$endpoint-multi")
      .option("urls", "u-a, u-b,u-c")
      .load()

  test("multi-url http scan: one partition per (url, page), per-url stream order") {
    server.createContext("/cdx-multi", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val q = Option(ex.getRequestURI.getQuery).getOrElse("")
        requests.add(q)
        val params = q.split("&").map(_.split("=", 2)).collect {
          case Array(k, v) => k -> java.net.URLDecoder.decode(v, "UTF-8")
        }.toMap
        val mine = perUrl(params("url"))
        val body =
          if (params.get("showNumPages").contains("true")) s"${mine.size}\n"
          else mine(params("page").toInt).mkString("", "\n", "\n")
        val bytes = body.getBytes("UTF-8")
        ex.sendResponseHeaders(200, bytes.length.toLong)
        ex.getResponseBody.write(bytes)
        ex.close()
      }
    })
    val df = multiScan()
    assert(df.rdd.getNumPartitions == perUrl.values.map(_.size).sum,
      "one InputPartition per (url, page)")
    val rows = df.collect()
    assert(rows.length == perUrl.values.flatMap(_.map(_.size)).sum)
    // per-url ordering: each url's rows sorted by seq replay that
    // url's pages in page-major line order
    perUrl.foreach { case (u, ps) =>
      val mine = rows.filter(_.getString(0) == u).sortBy(_.getLong(4))
      assert(mine.map(_.getString(1)).toSeq == ps.flatten.map(_.split(" ")(0)).toSeq,
        s"stream order broken for $u")
      assert(mine.map(_.getString(3)).toSeq == ps.flatten.map(_.split(" ")(2)).toSeq)
    }

    // a pushed url= equality prunes the url set BEFORE any probe:
    // only u-b's pages are planned or fetched
    requests.clear()
    val onlyB = multiScan().filter(org.apache.spark.sql.functions.col("url") === "u-b")
    assert(onlyB.rdd.getNumPartitions == perUrl("u-b").size)
    assert(onlyB.count() == perUrl("u-b").map(_.size).sum)
    import scala.jdk.CollectionConverters._
    val seen = requests.asScala.toList
    assert(seen.forall(_.contains("url=u-b")),
      s"filtered scan still probed other urls: $seen")
  }

  // lazy (probeless) planning: url count well above ProbeParallelism.
  // Page shapes cover every walk-termination signal: a zero-page url
  // (empty 200 body at page 0 — how a CDX server answers a valid url
  // with no captures; a page-0 400 means BAD REQUEST and throws), a
  // junk-only page that must NOT end the walk, and an empty-200-body
  // page that must.
  private val lazyUrls: Map[String, Vector[Vector[String]]] = {
    def line(u: String, p: Int, i: Int) =
      f"2024${p + 1}%02d${i + 1}%02d000000 200 ${u.toUpperCase.replace("-", "")}P${p}L$i"
    (0 until 20).map { n =>
      val u = f"w-$n%02d"
      val pages = n match {
        case 3 => Vector(Vector("garbage", "x y"), Vector(line(u, 1, 0), line(u, 1, 1)))
        case 7 => Vector(Vector(line(u, 0, 0)), Vector.empty[String]) // empty 200 body ends
        case _ if n % 5 == 0 => Vector.empty[Vector[String]] // zero pages: empty 200 at page 0
        case _ => (0 until (n % 4) + 1).toVector.map(p => Vector(line(u, p, 0), line(u, p, 1)))
      }
      u -> pages
    }.toMap
  }

  private def expectedTs(u: String): Seq[String] =
    lazyUrls(u).takeWhile(_.nonEmpty).flatten
      .filter(_.split(" ").length == 3).map(_.split(" ")(0))

  private def lazyScan(extra: Map[String, String] = Map.empty) = {
    val r0 = TestSpark.spark.read.format(graft.sources.CdxSource.Name)
      .option("endpoint", s"$endpoint-lazy")
      .option("urls", lazyUrls.keys.toSeq.sorted.mkString(","))
    extra.foldLeft(r0) { case (r, (k, v)) => r.option(k, v) }.load()
  }

  test("lazy multi-url scan: zero page-count probes, strided walks, per-url order") {
    server.createContext("/cdx-lazy", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val q = Option(ex.getRequestURI.getQuery).getOrElse("")
        requests.add("LAZY " + q)
        val params = q.split("&").map(_.split("=", 2)).collect {
          case Array(k, v) => k -> java.net.URLDecoder.decode(v, "UTF-8")
        }.toMap
        val mine = lazyUrls(params("url"))
        if (params.get("showNumPages").contains("true")) {
          // only reachable when planning drops BELOW the lazy
          // crossover (e.g. a pushed filter pruning to one url) — the
          // bulk-scan assertions check the requests log saw none
          val b = s"${mine.size}\n".getBytes("UTF-8")
          ex.sendResponseHeaders(200, b.length.toLong); ex.getResponseBody.write(b)
        } else {
          val page = params("page").toInt
          // past-the-count pages answer 400 (the real servers' shape) —
          // except page 0 of an empty url, where a valid request finds
          // no captures: empty 200 body, NOT a bad-request 400
          if (page >= mine.size) {
            if (page == 0) ex.sendResponseHeaders(200, -1)
            else ex.sendResponseHeaders(400, -1)
          } else {
            val body = mine(page).mkString("", "\n", if (mine(page).isEmpty) "" else "\n")
            val b = body.getBytes("UTF-8")
            ex.sendResponseHeaders(200, if (b.isEmpty) -1 else b.length.toLong)
            if (b.nonEmpty) ex.getResponseBody.write(b)
          }
        }
        ex.close()
      }
    })
    requests.clear()
    val df = lazyScan()
    // 20 urls > ProbeParallelism (16) → probeless planning, PageStride
    // walk partitions per url
    assert(df.rdd.getNumPartitions ==
      lazyUrls.size * graft.sources.CdxSource.PageStride,
      "lazy mode must plan PageStride walk partitions per url")
    val rows = df.collect()
    import scala.jdk.CollectionConverters._
    val probes = requests.asScala.toList.filter(q =>
      q.startsWith("LAZY") && q.contains("showNumPages"))
    assert(probes.isEmpty, s"probeless planning still sent page-count probes: $probes")

    lazyUrls.keys.foreach { u =>
      val mine = rows.filter(_.getString(0) == u).sortBy(_.getLong(4))
      assert(mine.map(_.getString(1)).toSeq == expectedTs(u),
        s"per-url stream order or page coverage broken for $u")
    }
    // the junk-only page did not terminate w-03's walk; the empty
    // 200 body DID terminate w-07's
    assert(rows.count(_.getString(0) == "w-03") == 2)
    assert(rows.count(_.getString(0) == "w-07") == 1)
    assert(rows.count(_.getString(0) == "w-00") == 0, "zero-page url must yield no rows")

    // a pushed url= equality prunes the url set before any request —
    // and dropping to ONE url falls below the lazy crossover, so the
    // planner deliberately returns to probe mode (a single url wants
    // per-page fan-out, and one probe is cheap)
    requests.clear()
    val only = lazyScan().filter(org.apache.spark.sql.functions.col("url") === "w-09")
    assert(only.rdd.getNumPartitions == lazyUrls("w-09").size,
      "a filtered single-url scan should re-enter probe mode's per-page fan-out")
    assert(only.count() == expectedTs("w-09").size)
    val fetched = requests.asScala.toList.filter(_.startsWith("LAZY"))
    assert(fetched.nonEmpty && fetched.forall(_.contains("url=w-09")),
      s"filtered lazy scan touched other urls: $fetched")

    // lazyPages=true forces probeless planning below the crossover too
    requests.clear()
    val forced = TestSpark.spark.read.format(graft.sources.CdxSource.Name)
      .option("endpoint", s"$endpoint-lazy")
      .option("urls", "w-04,w-09")
      .option("lazyPages", "true")
      .option("pageStride", "2").load()
    assert(forced.rdd.getNumPartitions == 4) // 2 urls × stride 2
    assert(forced.count() == (expectedTs("w-04").size + expectedTs("w-09").size))
    assert(!requests.asScala.exists(q => q.startsWith("LAZY") && q.contains("showNumPages")))
  }

  test("lazy walk: 429 rate-limit fails the task for retry instead of truncating the stream") {
    server.createContext("/cdx-throttle", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val q = Option(ex.getRequestURI.getQuery).getOrElse("")
        val params = q.split("&").map(_.split("=", 2)).collect {
          case Array(k, v) => k -> java.net.URLDecoder.decode(v, "UTF-8")
        }.toMap
        params("page").toInt match {
          case 0 =>
            val b = "20240101000000 200 TTTT0001\n".getBytes("UTF-8")
            ex.sendResponseHeaders(200, b.length.toLong); ex.getResponseBody.write(b)
          case 1 => ex.sendResponseHeaders(429, -1) // throttled, NOT end-of-pages
          case _ => ex.sendResponseHeaders(400, -1)
        }
        ex.close()
      }
    })
    val df = TestSpark.spark.read.format(graft.sources.CdxSource.Name)
      .option("endpoint", s"$endpoint-throttle")
      .option("urls", "u-t")
      .option("lazyPages", "true")
      .option("pageStride", "1").load()
    val ex = intercept[org.apache.spark.SparkException](df.collect())
    assert(ex.getMessage.contains("429") ||
      Option(ex.getCause).exists(_.getMessage.contains("429")),
      s"throttling must surface as a task failure naming the status: ${ex.getMessage}")
  }

  test("lazy walk: a 400 on a url's FIRST page fails the task (rejected url, not end-of-pages)") {
    server.createContext("/cdx-badreq", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val q = Option(ex.getRequestURI.getQuery).getOrElse("")
        val params = q.split("&").map(_.split("=", 2)).collect {
          case Array(k, v) => k -> java.net.URLDecoder.decode(v, "UTF-8")
        }.toMap
        if (params("url") == "bad url") ex.sendResponseHeaders(400, -1)
        else params("page").toInt match {
          case 0 =>
            val b = "20240101000000 200 GOOD0001\n".getBytes("UTF-8")
            ex.sendResponseHeaders(200, b.length.toLong); ex.getResponseBody.write(b)
          case _ => ex.sendResponseHeaders(400, -1) // past the count AFTER a success: fine
        }
        ex.close()
      }
    })
    // the good url's walk ends on its past-the-count 400 (after page 0
    // succeeded) — but the server-rejected url's page-0 400 must FAIL
    // the scan, not read as an innocently empty url
    val df = TestSpark.spark.read.format(graft.sources.CdxSource.Name)
      .option("endpoint", s"$endpoint-badreq")
      .option("urls", "good-url,bad url")
      .option("lazyPages", "true")
      .option("pageStride", "1").load()
    val ex = intercept[org.apache.spark.SparkException](df.collect())
    assert(ex.getMessage.contains("400") ||
      Option(ex.getCause).exists(_.getMessage.contains("400")),
      s"a rejected url must surface as a task failure naming the status: ${ex.getMessage}")
    // the good url alone scans clean — its own 400 is past-the-count
    val ok = TestSpark.spark.read.format(graft.sources.CdxSource.Name)
      .option("endpoint", s"$endpoint-badreq")
      .option("urls", "good-url")
      .option("lazyPages", "true")
      .option("pageStride", "1").load()
    assert(ok.count() == 1)
    // page0EmptyOn400 opts back into the lenient reading for servers
    // that answer a zero-capture url's page 0 with "page out of range"
    // 400 (numPages = 0): the rejected url now reads as empty instead
    // of failing the scan — the caller has declared the ambiguity
    // resolves to "no captures" on this endpoint
    val lenient = TestSpark.spark.read.format(graft.sources.CdxSource.Name)
      .option("endpoint", s"$endpoint-badreq")
      .option("urls", "good-url,bad url")
      .option("lazyPages", "true")
      .option("page0EmptyOn400", "true")
      .option("pageStride", "1").load()
    assert(lenient.count() == 1, "lenient mode must yield the good url's rows only")
  }

  test("SRC4 probe: redirect chain yields one header block per hop") {
    val port = server.getAddress.getPort
    server.createContext("/hop-a", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        ex.getResponseHeaders.add("Location", s"http://127.0.0.1:$port/hop-b")
        ex.sendResponseHeaders(301, -1); ex.close()
      }
    })
    server.createContext("/hop-b", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        ex.getResponseHeaders.add("X-Probe", "final")
        ex.sendResponseHeaders(200, -1); ex.close()
      }
    })
    val blocks = graft.sources.Probe.respHeaders(s"http://127.0.0.1:$port/hop-a")
    assert(blocks.size == 2, s"expected 2 hops, got ${blocks.size}")
    assert(blocks.head.startsWith("HTTP 301") && blocks.head.contains("/hop-b"))
    assert(blocks(1).startsWith("HTTP 200") && blocks(1).toLowerCase.contains("x-probe: final"))
  }

  test("file mode still plans and reads (regression guard on the split reader)") {
    val dir = java.nio.file.Files.createTempDirectory("cdx_http_spec_").toFile
    val w = new java.io.PrintWriter(new java.io.File(dir, "page-000"), "UTF-8")
    w.println("u1 20240101000000 200 FFFF6666"); w.close()
    val df = TestSpark.spark.read.format(graft.sources.CdxSource.Name)
      .option("path", dir.getPath).load()
    assert(df.count() == 1 && df.head().getString(0) == "u1")
    dir.listFiles().foreach(_.delete()); dir.delete()
  }
}
