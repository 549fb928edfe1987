package graft.sources

import java.util

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, IsNotNull}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** SRC1-SRC3: a proper DataSourceV2 for CDX page files.
  *
  * The reference streams one URL's CDX index over HTTP as numbered pages
  * (main.py:112-126): `showNumPages` then GET page 0..N, with
  * `fl=timestamp,statuscode,digest` projection (main.py:118) and the
  * `url=` predicate (main.py:115) applied server-side. This source maps
  * that contract onto Spark's connector API:
  *
  *   - one [[InputPartition]] per page file (pagination == partitioned
  *     scan; a 2000-page URL fans out across the cluster),
  *   - [[SupportsPushDownRequiredColumns]] == the `fl=` projection
  *     (unrequested fields are never materialized),
  *   - [[SupportsPushDownFilters]] on `url` == the `url=` param (pushed
  *     equality skips rows at the reader, reported in `PushedFilters`),
  *   - `seq` = (page << 32) | line-offset: globally ordered stream
  *     position, deterministic under any partitioning — the
  *     order-sensitive operators (A4/W1/W2/A2) key on it.
  *
  * Page files contain lines `<url> <ts> <status> <digest>`, named so
  * lexicographic order == page order. The HTTP mode (`endpoint` +
  * `url` options) is the reference's live ingestion (main.py:112-126):
  * a driver-side `showNumPages` probe plans one partition per page and
  * executors GET their own pages — same planning surface, the reader's
  * line iterator swapped (see [[CdxLineReader]]). A `urls` option
  * (comma-separated) makes the live scan MULTI-URL, with two planners:
  * up to [[CdxSource.ProbeParallelism]] urls, page-count probes on a
  * bounded driver pool plan one partition per (url, page) — full
  * per-page fan-out; past that (or with `lazyPages=true`) planning is
  * PROBELESS — `pageStride` strided walk partitions per url whose
  * readers page forward until out-of-range, so a million-url crawl
  * plans with zero HTTP round-trips. Both honor the per-url
  * [[CdxSource.MaxPages]] cap, and pushed `url =` equality prunes the
  * url set before any request fires. `seq` is then the PER-URL stream
  * position — exactly what the url-keyed operators window over.
  * CdxHttpSpec exercises both against a loopback server (the sandbox
  * has no egress).
  */
class CdxSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = CdxSource.Schema
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val maxPages = Option(properties.get("maxPages")).map(_.toInt)
      .getOrElse(CdxSource.MaxPages)
    // `urls` = comma-separated url list (the multi-URL live-ingestion
    // mode); `url` = single-url shorthand. Both feed the same planner.
    val urls = Option(properties.get("urls")).toSeq
      .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
    new CdxTable(
      Option(properties.get("path")),
      Option(properties.get("endpoint")),
      Option(properties.get("url")),
      urls,
      maxPages,
      Option(properties.get("pageStride")).map(_.toInt)
        .getOrElse(CdxSource.PageStride),
      Option(properties.get("lazyPages")).map(_.toBoolean),
      Option(properties.get("page0EmptyOn400")).exists(_.toBoolean))
  }
  override def supportsExternalMetadata(): Boolean = false
}

object CdxSource {
  val Schema: StructType = StructType(Seq(
    StructField("url", StringType),
    StructField("ts", StringType),
    StructField("status", StringType),
    StructField("digest", StringType),
    StructField("seq", LongType)))

  val Name: String = classOf[CdxSource].getName

  /** Reference page cap (MAXCDXPAGES, main.py:23): pages beyond the cap
    * are never planned, the limit-like pushdown the reference applies
    * at the HTTP layer. In multi-url mode the cap applies PER URL.
    */
  val MaxPages = 2000

  /** Driver-side showNumPages probe concurrency for multi-url scans —
    * and the crossover past which planning goes PROBELESS: above this
    * many urls the scan switches to lazy strided page walks (zero
    * page-count round-trips anywhere; see [[CdxHttpUrlWalkPartition]]).
    */
  val ProbeParallelism = 16

  /** Walk partitions per url in lazy mode: reader r of a url fetches
    * pages r, r+stride, r+2·stride… until its first out-of-range/empty
    * page. Intra-url fan-out without a page-count probe; the price is
    * one terminal "miss" request per walker (stride misses per url).
    */
  val PageStride = 4
}

/** Two ingestion modes behind one planning surface: `path` reads page
  * FILES (one partition per file); `endpoint` + `url` fetches pages
  * over HTTP exactly as the reference does (main.py:112-126 —
  * `showNumPages` probe, then one GET per page; each page is one
  * [[InputPartition]], so a 2000-page URL fans out across executors).
  */
class CdxTable(
    path: Option[String],
    endpoint: Option[String],
    urlOpt: Option[String],
    urls: Seq[String],
    maxPages: Int,
    pageStride: Int = CdxSource.PageStride,
    lazyOpt: Option[Boolean] = None,
    // opt-in for servers that answer a zero-capture url's page 0 with
    // 400 ("page out of range" over numPages=0) instead of an empty
    // 200: treats a FIRST-page 400 as an empty url rather than a
    // rejected request. Default strict — a rejected url must fail the
    // scan, not read as innocently empty.
    page0EmptyOn400: Boolean = false) extends Table with SupportsRead {
  require(path.isDefined || endpoint.isDefined, "cdx source needs `path` or `endpoint`")
  override def name(): String = s"cdx(`${path.orElse(endpoint).get}`)"
  override def schema(): StructType = CdxSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new CdxScanBuilder(
      path, endpoint, urlOpt, urls, maxPages, pageStride, lazyOpt, page0EmptyOn400)
}

class CdxScanBuilder(
    path: Option[String],
    endpoint: Option[String],
    urlOpt: Option[String],
    urls: Seq[String],
    maxPages: Int,
    pageStride: Int,
    lazyOpt: Option[Boolean],
    page0EmptyOn400: Boolean = false)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {

  private var required: StructType = CdxSource.Schema
  private var urlFilter: Option[String] = None
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case EqualTo("url", _: String) => true
      case IsNotNull(_)              => true // schema is non-null by construction
      case _                         => false
    }
    pushed = accepted
    urlFilter = accepted.collectFirst { case EqualTo("url", v: String) => v }
    rejected
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = {
    // Capture the session's Hadoop configuration (driver side) so the
    // source honors spark.hadoop.* / fs.* settings like every built-in
    // source — a bare `new Configuration()` cannot reach s3a
    // credentials, custom fs impls, or HDFS nameservices.
    // Only filesystem-relevant keys: the full configuration (~1000
    // entries incl. core-defaults) would ride inside every serialized
    // task for every partition.
    val hadoopProps = {
      val conf = org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration
      val it = conf.iterator()
      val b = Map.newBuilder[String, String]
      while (it.hasNext) {
        val e = it.next()
        val k = e.getKey
        if (k.startsWith("fs.") || k.startsWith("dfs.") || k.startsWith("hadoop.security.") ||
          k.startsWith("io.compression.")) b += k -> e.getValue
      }
      b.result()
    }
    new CdxScan(path, endpoint, urlOpt, urls, required, urlFilter, maxPages,
      pageStride, lazyOpt, hadoopProps, page0EmptyOn400)
  }
}

object CdxConf {
  def build(props: Map[String, String]): org.apache.hadoop.conf.Configuration = {
    val conf = new org.apache.hadoop.conf.Configuration(false)
    props.foreach { case (k, v) => conf.set(k, v) }
    conf
  }
}

/** One page file = one partition. */
case class CdxPagePartition(file: String, page: Int) extends InputPartition

/** One HTTP page fetch = one partition (the reference's per-page GET,
  * main.py:116-118, distributed: each executor fetches its own pages).
  */
case class CdxHttpPagePartition(endpoint: String, urlKey: String, page: Int)
    extends InputPartition

/** PROBELESS planning unit: one strided page WALK over a url. The
  * reader fetches pages `startPage, startPage+stride, …` (< maxPages)
  * and stops at its first out-of-range (HTTP 4xx) or line-less page —
  * no `showNumPages` probe ever fires. `stride` such walkers cover a
  * url's pages exactly once between them.
  */
case class CdxHttpUrlWalkPartition(
    endpoint: String,
    urlKey: String,
    startPage: Int,
    stride: Int,
    maxPages: Int,
    page0EmptyOn400: Boolean = false)
    extends InputPartition

class CdxScan(
    path: Option[String],
    endpoint: Option[String],
    urlOpt: Option[String],
    urls: Seq[String],
    required: StructType,
    urlFilter: Option[String],
    maxPages: Int,
    pageStride: Int,
    lazyOpt: Option[Boolean],
    hadoopProps: Map[String, String],
    page0EmptyOn400: Boolean = false)
    extends Scan
    with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"CdxScan(source=${path.orElse(endpoint).get}, " +
      s"columns=${required.fieldNames.mkString(",")}, urlFilter=$urlFilter)"

  override def planInputPartitions(): Array[InputPartition] = path match {
    case Some(p) =>
      val hPath = new Path(p)
      val fs = hPath.getFileSystem(CdxConf.build(hadoopProps))
      val pages = fs.listStatus(hPath)
        .filter(_.isFile)
        .map(_.getPath.toString)
        .sorted // lexicographic file order == page order
        .take(maxPages)
      pages.zipWithIndex.map { case (f, i) => CdxPagePartition(f, i): InputPartition }
    case None =>
      // HTTP mode: the url= predicate is the server-side scan key —
      // a pushed url filter narrows the configured url set exactly
      // like the reference's url= query param (main.py:115). With a
      // `urls` list the scan is MULTI-URL: one InputPartition per
      // (url, page), so a million-url crawl fans out across executors
      // keyed by url the same way the engine's operators are.
      val configured = if (urls.nonEmpty) urls else urlOpt.toSeq
      val urlKeys: Seq[String] = urlFilter match {
        // a pushed equality prunes the url set BEFORE any page probe —
        // zero HTTP traffic for urls the query filtered away
        case Some(f) if configured.nonEmpty => configured.filter(_ == f)
        case Some(f) => Seq(f)
        case None if configured.nonEmpty => configured
        case None => throw new IllegalArgumentException(
          "cdx http mode needs a url (option `url`/`urls` or pushed filter)")
      }
      // PLANNING MODE. Past ProbeParallelism urls (or on request via
      // `lazyPages=true`) planning goes PROBELESS: no page-count
      // round-trip runs anywhere — not on the driver, not on an
      // executor. Each url gets `pageStride` walk partitions; reader r
      // walks pages r, r+stride, … until its first out-of-range/empty
      // page (page counts are monotone: every page past the server's
      // count is empty, so strided walkers terminate independently).
      // Planning cost is O(urls) local work with ZERO HTTP traffic — a
      // million-url crawl plans instantly where per-url probes would
      // serialize 1M/16 round-trips through the driver. The trade:
      // intra-url fan-out is `pageStride`, not page count, which is
      // the right shape when parallelism comes from the url set
      // itself; small url sets keep the probe planner below, where a
      // lone 2000-page url still fans out across 2000 executor tasks.
      val lazyMode = lazyOpt.getOrElse(urlKeys.lengthCompare(CdxSource.ProbeParallelism) > 0)
      if (lazyMode) {
        val stride = math.max(1, math.min(pageStride, maxPages))
        return urlKeys.flatMap(u =>
          (0 until stride).map(r =>
            CdxHttpUrlWalkPartition(
              endpoint.get, u, r, stride, maxPages, page0EmptyOn400): InputPartition)
        ).toArray
      }
      // the reference's page-count probe (showNumPages=true,
      // main.py:114-116): one tiny driver-side GET per url, then the
      // pages themselves are fetched by executors. Probes run on a
      // bounded pool — page counts are planning metadata (one int per
      // url), the page BODIES are what must never flow driver-side.
      def pageCount(urlKey: String): Int = {
        val probeUrl = CdxHttp.pageCountUrl(endpoint.get, urlKey)
        val probe = CdxHttp.readLines(probeUrl)
        // guard the response: an empty body would NPE on readLine(),
        // junk would throw an opaque NumberFormatException — name the
        // endpoint
        try {
          val body = Option(probe.readLine()).map(_.trim).filter(_.nonEmpty)
          body.flatMap(_.toIntOption).getOrElse(throw new java.io.IOException(
            s"cdx page-count probe $probeUrl returned " +
              body.fold("an empty body")(b => s"a non-numeric body: '$b'")))
        } finally probe.close()
      }
      val counts: Seq[(String, Int)] =
        if (urlKeys.lengthCompare(1) <= 0) urlKeys.map(u => u -> pageCount(u))
        else {
          // concurrent probes: driver wall-clock for N urls is
          // N/parallelism round-trips, not N
          import scala.concurrent.{Await, ExecutionContext, Future}
          import scala.concurrent.duration.Duration
          val pool = java.util.concurrent.Executors.newFixedThreadPool(
            math.min(urlKeys.length, CdxSource.ProbeParallelism))
          implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
          try Await.result(
            Future.sequence(urlKeys.map(u => Future(u -> pageCount(u)))), Duration.Inf)
          finally { pool.shutdown(); () }
        }
      counts.flatMap { case (u, n) =>
        // MAXCDXPAGES caps each url's pages, as the reference does per scan
        (0 until math.min(n, maxPages)).map(i =>
          CdxHttpPagePartition(endpoint.get, u, i): InputPartition)
      }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new CdxReaderFactory(required.fieldNames, urlFilter, hadoopProps)
}

object CdxHttp {
  def enc(s: String): String = java.net.URLEncoder.encode(s, "UTF-8")
  def pageCountUrl(endpoint: String, url: String): String =
    s"$endpoint?url=${enc(url)}&showNumPages=true"
  /** The reference's per-page fetch shape: server-side fl= projection
    * (SRC2) and url= predicate (SRC3) in the query string (main.py:118).
    */
  def pageUrl(endpoint: String, url: String, page: Int): String =
    s"$endpoint?url=${enc(url)}&fl=timestamp,statuscode,digest&page=$page"

  def readLines(u: String): java.io.BufferedReader = {
    val conn = new java.net.URL(u).openConnection()
    conn.setConnectTimeout(15000)
    conn.setReadTimeout(120000)
    new java.io.BufferedReader(
      new java.io.InputStreamReader(conn.getInputStream, "UTF-8"))
  }

  /** Open a page for a lazy walk, or signal end-of-pages: ONLY 404 —
    * and 400 AFTER a prior page of the same walk succeeded — mean
    * `None`, walk over (how CDX servers answer a page index past the
    * count). A 400 on the walk's FIRST request is ambiguous: it is
    * also the server's generic bad-request answer (malformed url,
    * failed validation), and reading it as end-of-pages would let a
    * rejected url yield zero rows and a successful scan — the silent
    * truncation the probe planner would have surfaced as a failure.
    * So first-request 400 throws; `priorPageSucceeded` widens it to
    * end-of-pages once the url itself is proven well-formed. Every
    * other status (429 rate-limit, 403, 5xx) and transport errors
    * THROW: a throttled or flaky server must fail the task for retry,
    * never silently truncate a url's stream.
    */
  def openPageOrEnd(
      u: String, priorPageSucceeded: Boolean): Option[java.io.BufferedReader] = {
    val conn = new java.net.URL(u).openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    conn.setConnectTimeout(15000)
    conn.setReadTimeout(120000)
    val code = conn.getResponseCode
    if (code == 404 || (code == 400 && priorPageSucceeded)) {
      conn.disconnect()
      None
    } else if (code >= 300) {
      conn.disconnect()
      throw new java.io.IOException(s"cdx page fetch $u failed with HTTP $code")
    } else Some(new java.io.BufferedReader(
      new java.io.InputStreamReader(conn.getInputStream, "UTF-8")))
  }
}

class CdxReaderFactory(
    columns: Array[String],
    urlFilter: Option[String],
    hadoopProps: Map[String, String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    partition match {
      case CdxPagePartition(file, page) =>
        val hPath = new Path(file)
        val in = hPath.getFileSystem(CdxConf.build(hadoopProps)).open(hPath)
        new CdxLineReader(
          new java.io.BufferedReader(new java.io.InputStreamReader(in, "UTF-8")),
          page, columns, urlFilter, defaultUrl = None)
      case CdxHttpPagePartition(endpoint, urlKey, page) =>
        // fl=timestamp,statuscode,digest lines carry 3 fields; the url
        // column is the scan key itself (exactly one url per HTTP scan)
        new CdxLineReader(
          CdxHttp.readLines(CdxHttp.pageUrl(endpoint, urlKey, page)),
          page, columns, urlFilter, defaultUrl = Some(urlKey))
      case CdxHttpUrlWalkPartition(
          endpoint, urlKey, startPage, stride, maxPages, page0EmptyOn400) =>
        new CdxPageWalkReader(endpoint, urlKey, startPage, stride, maxPages,
          columns, urlFilter, page0EmptyOn400)
    }
}

/** Shared line-to-row loop — the file and HTTP modes differ ONLY in
  * where the BufferedReader comes from (the class doc's "an HTTP
  * variant only swaps the reader's line iterator", made literal).
  * Accepts 4-field `url ts status digest` page-file lines and 3-field
  * `ts status digest` fl-projected HTTP lines (url = scan key).
  */
class CdxLineReader(
    reader: java.io.BufferedReader,
    page: Int,
    columns: Array[String],
    urlFilter: Option[String],
    defaultUrl: Option[String])
    extends PartitionReader[InternalRow] {

  private var offset = -1L
  private var row: InternalRow = _
  // Whether this page carried ANY line at all — the lazy walk's
  // end-of-pages signal must fire on a truly empty body, not on a page
  // whose lines were all junk-skipped or filter-rejected.
  private var anyLine = false
  def sawAnyLine: Boolean = anyLine

  override def next(): Boolean = {
    var line = reader.readLine()
    if (line != null) anyLine = true
    offset += 1
    while (line != null) {
      val parts = line.split(" ")
      val url =
        if (parts.length == 4) Some(parts(0))
        else if (parts.length == 3) defaultUrl
        else None
      if (url.isDefined && urlFilter.forall(_ == url.get)) {
        val base = if (parts.length == 4) 1 else 0
        val seq = (page.toLong << 32) | offset
        row = InternalRow.fromSeq(columns.toSeq.map {
          case "url"    => UTF8String.fromString(url.get)
          case "ts"     => UTF8String.fromString(parts(base))
          case "status" => UTF8String.fromString(parts(base + 1))
          case "digest" => UTF8String.fromString(parts(base + 2))
          case "seq"    => seq
        })
        return true
      }
      line = reader.readLine()
      offset += 1
    }
    false
  }

  override def get(): InternalRow = row
  override def close(): Unit = reader.close()
}

/** The lazy walk: a chain of [[CdxLineReader]]s over pages
  * `startPage, startPage+stride, …` of one url, stopping at the first
  * out-of-range (4xx) or empty-bodied page. Composes the single-page
  * reader rather than re-implementing the parse, so file, probed-HTTP
  * and walked-HTTP rows are byte-identical — `seq` still encodes
  * `(page << 32) | offset`, so the per-url stream order is exactly the
  * probed planner's regardless of which walker carried the page.
  */
class CdxPageWalkReader(
    endpoint: String,
    urlKey: String,
    startPage: Int,
    stride: Int,
    maxPages: Int,
    columns: Array[String],
    urlFilter: Option[String],
    page0EmptyOn400: Boolean = false)
    extends PartitionReader[InternalRow] {

  private var page = startPage - stride // advanced before first open
  private var current: CdxLineReader = _
  private var done = false

  private def advance(): Boolean = {
    if (current != null) { current.close(); current = null }
    page += stride
    if (page >= maxPages) { done = true; return false }
    // `page > 0`: any request past the url's page 0 either follows a
    // success in THIS walk (stride advances only after one) or belongs
    // to a strided sibling of the partition that fetches page 0 — and
    // that sibling surfaces a malformed-url 400 by throwing, failing
    // the whole task. Only the page-0 request is ambiguous.
    CdxHttp.openPageOrEnd(
      CdxHttp.pageUrl(endpoint, urlKey, page),
      priorPageSucceeded = page > 0 || page0EmptyOn400) match {
      case Some(reader) =>
        current = new CdxLineReader(
          reader, page, columns, urlFilter, defaultUrl = Some(urlKey))
        true
      case None =>
        done = true
        false
    }
  }

  override def next(): Boolean = {
    while (!done) {
      if (current == null && !advance()) return false
      if (current.next()) return true
      // page exhausted: a page with zero LINES is the end of this
      // url's pages (monotone page counts — everything past it is
      // empty too); a page whose lines were all junk or filtered
      // keeps walking
      if (!current.sawAnyLine) { done = true; current.close(); current = null; return false }
      current.close(); current = null
    }
    false
  }

  override def get(): InternalRow = current.get()
  override def close(): Unit = if (current != null) current.close()
}
