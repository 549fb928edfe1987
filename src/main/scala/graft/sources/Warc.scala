package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** WARC (ISO 28500, public) container ingestion — the payload format
  * of an actual web archive, completing the archive-to-corpus story:
  * CDX indexes locate captures ([[CdxSource]]), WARC files hold them.
  * The [[graft.operators.Multimodal]] synthesize-then-parse
  * discipline (wavHeader, reference context main.py:118's corpus is
  * served from exactly these containers): [[withWarcPayload]] writes
  * CANONICAL multi-record WARC files — a `warcinfo` head record, then
  * one `response` record per document wrapping a real HTTP response
  * around the HTML fixture — and [[parseWarcRecords]] reads them back
  * with a REAL byte-level header scan (version line, case-insensitive
  * named headers, Content-Length-delimited blocks, record separators,
  * unknown headers skipped, non-response records skipped). The oracle
  * twin replays the synth formulas with no container at all; hash
  * equality is the proof the scan is real.
  */
object Warc {

  /** One parsed response record: WARC envelope fields + the HTTP
    * status the block really carried + the HTML body.
    */
  case class WarcDoc(
      doc_id: Long,
      url: String,
      warc_date: String,
      status: Int,
      n_block_bytes: Long,
      html: String)

  /** Documents per synthesized WARC file — small enough that one file
    * is one task's work unit, large enough that every file exercises
    * the multi-record walk.
    */
  val DocsPerFile = 10L

  private val Crlf = "\r\n"

  /** Document id of a record: the first 64 bits of
    * md5(WARC-Target-URI) with the sign bit masked — a non-negative
    * 63-bit Long. Real archives key records by URI, not by any numeric
    * id a fixture happens to carry — this is what lets the reader
    * ingest FOREIGN archives. Collision budget, quantified: with 63
    * bits the birthday bound expects ~0.005 colliding pairs at 10^9
    * distinct URIs and ~0.5 at 10^10 — order one collision across a
    * full 100 TB archive (the earlier 60-bit id expected ~20 there,
    * each silently merging two documents). COLLISION POLICY: ids are
    * content-addressed per URI, so a collision makes two URIs share a
    * doc_id — the scan itself never drops records (every response row
    * is emitted; same-URI recaptures share an id by design), and a
    * downstream exact-dedup would keep one survivor per id. md5-derived
    * so the DuckDB twin replays the identical ids from the same split:
    * 3 high bits of hex char 1, then hex chars 2..16.
    */
  private[graft] def uriDocId(uri: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(uri.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseUnsignedLong(hex.substring(0, 16), 16) & Long.MaxValue
  }

  private[graft] def urlOf(docId: Long): String = s"https://example.org/doc/$docId"

  private[graft] def dateOf(docId: Long): String =
    f"2024-01-${docId % 28 + 1}%02dT00:00:00Z"

  /** HTTP status varies by id so the parser must READ the status
    * line, not assume it (404 pages carry bodies too).
    */
  private[graft] def statusOf(docId: Long): Int = if (docId % 17 == 0) 404 else 200

  private[graft] def httpHead(status: Int): String = {
    val reason = if (status == 404) "Not Found" else "OK"
    s"HTTP/1.1 $status $reason${Crlf}Content-Type: text/html; charset=utf-8$Crlf$Crlf"
  }

  /** One canonical WARC record: version line, named headers (plus an
    * unknown extension header a strict-order parser would trip on),
    * blank line, Content-Length block, record separator.
    */
  private[graft] def warcResponse(docId: Long, html: String): Array[Byte] = {
    val block = (httpHead(statusOf(docId)) + html).getBytes("UTF-8")
    val head =
      s"""WARC/1.0${Crlf}WARC-Type: response${Crlf}WARC-Record-ID: <urn:uuid:doc-$docId>${Crlf}WARC-Date: ${dateOf(docId)}${Crlf}WARC-Target-URI: ${urlOf(docId)}${Crlf}X-Graft-Extension: ignore-me${Crlf}Content-Type: application/http;msgtype=response${Crlf}Content-Length: ${block.length}$Crlf$Crlf"""
    head.getBytes("UTF-8") ++ block ++ (Crlf + Crlf).getBytes("UTF-8")
  }

  private[graft] def warcinfo(fileId: Long): Array[Byte] = {
    val block = s"software: graft$Crlf".getBytes("UTF-8")
    val head =
      s"""WARC/1.0${Crlf}WARC-Type: warcinfo${Crlf}WARC-Record-ID: <urn:uuid:info-$fileId>${Crlf}Content-Type: application/warc-fields${Crlf}Content-Length: ${block.length}$Crlf$Crlf"""
    head.getBytes("UTF-8") ++ block ++ (Crlf + Crlf).getBytes("UTF-8")
  }

  /** Multi-record WARC files over an (doc_id, html) frame: docs group
    * [[DocsPerFile]] to a file (id-ordered within the file, as a
    * crawler's sequential writes are), each file led by a `warcinfo`
    * record the reader must skip. One row per FILE — payloads bounded
    * by group size, never collected.
    */
  def withWarcPayload(pages: DataFrame): DataFrame = {
    val spark = pages.sparkSession
    import spark.implicits._
    pages.select(col("doc_id"), col("html"))
      .withColumn("file_id", expr(s"doc_id div $DocsPerFile"))
      .as[(Long, String, Long)]
      .groupByKey(_._3)
      .mapGroups { (fileId, rows) =>
        val docs = rows.toArray.sortBy(_._1)
        val body = docs.foldLeft(warcinfo(fileId)) { case (acc, (id, html, _)) =>
          acc ++ warcResponse(id, html)
        }
        (fileId, body)
      }
      .toDF("file_id", "payload")
  }

  /** [[withWarcPayload]] in `.warc.gz` form: the SAME records, each
    * compressed as its own gzip member and concatenated — the layout
    * real crawl archives ship in (per-record members keep records
    * independently seekable). Extraction must equal the plain form
    * byte-for-byte after inflation, which is what the `warc_extract_gz`
    * row's shared twin proves.
    */
  def withWarcPayloadGz(pages: DataFrame): DataFrame = {
    val spark = pages.sparkSession
    import spark.implicits._
    pages.select(col("doc_id"), col("html"))
      .withColumn("file_id", expr(s"doc_id div $DocsPerFile"))
      .as[(Long, String, Long)]
      .groupByKey(_._3)
      .mapGroups { (fileId, rows) =>
        val docs = rows.toArray.sortBy(_._1)
        val body = docs.foldLeft(gzipMember(warcinfo(fileId))) {
          case (acc, (id, html, _)) => acc ++ gzipMember(warcResponse(id, html))
        }
        (fileId, body)
      }
      .toDF("file_id", "payload")
  }

  /** REAL WARC scan: walk each file's bytes record by record — version
    * line check, case-insensitive header collection to the blank
    * line, Content-Length-delimited block skip, separator consume —
    * yielding one [[WarcDoc]] per `response` record. A truncated or
    * malformed tail ends that FILE's scan (data, not a job failure);
    * unknown headers and non-response record types skip, as any WARC
    * reader must ([[graft.operators.Multimodal.parseWav]]'s chunk-scan
    * discipline on the archive container).
    */
  def parseWarcRecords(files: DataFrame): Dataset[WarcDoc] = {
    val spark = files.sparkSession
    import spark.implicits._
    files.select(col("file_id"), col("payload")).as[(Long, Array[Byte])]
      .flatMap { case (_, p) => scanFile(p) }
  }

  /** One gzipped member (the `.warc.gz` convention compresses each
    * record as its own gzip member, so a reader can seek to a record
    * without decompressing the file).
    */
  private[graft] def gzipMember(bytes: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(bytes)
    gz.close()
    bos.toByteArray
  }

  /** Inflation budget for a `.warc.gz` file, as a multiple of its
    * compressed size: honest web-archive members (HTML/text around
    * HTTP envelopes) inflate ~5-20×, so 64× flags only a crafted
    * bomb while leaving a 3× margin over anything legitimate. The
    * reader accepts FOREIGN archives, which makes unbounded inflation
    * new attack surface — gzip reaches ~1000:1, so a few-MB file
    * could otherwise expand to gigabytes inside one executor task.
    */
  val MaxInflateRatio = 64L

  /** Floor on the budget so a legitimately tiny compressed file (a
    * few hundred bytes of headers compressing a sparse page) still
    * inflates without tripping the ratio.
    */
  val MinInflateBudget: Long = 1L << 20

  /** Decompress a multi-member gzip stream, halting at the first
    * mangled member OR at the inflation budget: bytes decompressed so
    * far are kept (the records before the fault are data), the rest
    * of THAT FILE is abandoned — never the job. `GZIPInputStream`
    * walks concatenated members natively; a corrupt member surfaces
    * as an IOException mid-read, trailing garbage after a valid
    * member reads as EOF, and a decompression bomb crosses the budget
    * — all three are the same halt-the-file verdict (the record scan
    * parses complete records up to the cut and stops at the truncated
    * tail).
    */
  private[graft] def gunzipMembers(
      p: Array[Byte], maxRatio: Long = MaxInflateRatio): Array[Byte] = {
    val budget = math.max(p.length.toLong * maxRatio, MinInflateBudget)
    val out = new java.io.ByteArrayOutputStream()
    try {
      val in = new java.util.zip.GZIPInputStream(new java.io.ByteArrayInputStream(p))
      val buf = new Array[Byte](65536)
      var n = in.read(buf)
      var halted = false
      while (n >= 0 && !halted) {
        val room = budget - out.size()
        if (n >= room) {
          // budget crossed mid-buffer: keep exactly the budgeted
          // prefix and abandon the rest of the file
          out.write(buf, 0, math.max(0L, math.min(n.toLong, room)).toInt)
          halted = true
        } else {
          out.write(buf, 0, n)
          n = in.read(buf)
        }
      }
    } catch { case _: java.io.IOException => () }
    out.toByteArray
  }

  private val GzipMagic0 = 0x1f.toByte
  private val GzipMagic1 = 0x8b.toByte

  /** Parse ONE record starting at byte `i` of a plain WARC stream:
    * (the response doc if the record is an intact response, the
    * position after the record's separator, whether the walk may
    * continue). The single byte-walk implementation — the whole-file
    * scan ([[scanFile]]) and the index-driven range fetch
    * ([[recordAt]]) both ride it, so their parse semantics can never
    * drift.
    */
  private def parseRecordAt(p: Array[Byte], i: Long): (Option[WarcDoc], Long, Boolean) = {
    def lineAt(pos: Long): Option[(String, Long)] = {
      var j = pos
      while (j + 1 < p.length && !(p(j.toInt) == '\r' && p(j.toInt + 1) == '\n')) j += 1
      if (j + 1 >= p.length) None
      else Some((new String(p, pos.toInt, (j - pos).toInt, "UTF-8"), j + 2))
    }
    lineAt(i) match {
      case Some((version, afterVersion)) if version.startsWith("WARC/") =>
        var j = afterVersion
        val headers = scala.collection.mutable.Map.empty[String, String]
        var headersDone = false
        var bad = false
        while (!headersDone && !bad) {
          lineAt(j) match {
            case Some(("", next)) => headersDone = true; j = next
            case Some((line, next)) =>
              val c = line.indexOf(':')
              if (c > 0)
                headers(line.substring(0, c).trim.toLowerCase) =
                  line.substring(c + 1).trim
              // a header line without a colon is malformed but
              // skippable — real archives carry oddities
              j = next
            case None => bad = true
          }
        }
        val clen = headers.get("content-length").flatMap(_.toLongOption)
        if (bad || clen.isEmpty || clen.get < 0 || j + clen.get > p.length)
          (None, i, false)
        else {
          val blockStart = j
          val len = clen.get
          val doc: Option[WarcDoc] =
            if (!headers.get("warc-type").contains("response")) None
            else {
              val block = new String(p, blockStart.toInt, len.toInt, "UTF-8")
              val sep = block.indexOf("\r\n\r\n")
              val statusLine = block.takeWhile(_ != '\r')
              val parts = statusLine.split(" ", 3)
              val status = if (parts.length >= 2) parts(1).toIntOption else None
              // ANY Target-URI keys a record — a real archive's URIs
              // carry no fixture prefix; the id is the URI's md5 63-bit
              val docId = headers.get("warc-target-uri").map(uriDocId)
              (docId, status) match {
                case (Some(id), Some(st)) if sep >= 0 =>
                  Some(WarcDoc(
                    id,
                    headers.getOrElse("warc-target-uri", ""),
                    headers.getOrElse("warc-date", ""),
                    st,
                    len,
                    block.substring(sep + 4)))
                case _ => None // undecodable response block: dropped data
              }
            }
          // advance past the block and the two-CRLF record separator;
          // a clean EOF directly after the block is a complete record,
          // trailing junk without a separator halts the walk
          var next = blockStart + len
          var ok = true
          if (next + 4 <= p.length &&
              p(next.toInt) == '\r' && p(next.toInt + 1) == '\n' &&
              p(next.toInt + 2) == '\r' && p(next.toInt + 3) == '\n') next += 4
          else if (next < p.length) ok = false // malformed tail: stop the file
          if (next <= i) ok = false
          (doc, next, ok)
        }
      case _ => (None, i, false)
    }
  }

  private[graft] def scanFile(raw: Array[Byte]): Iterator[WarcDoc] = {
    // .warc.gz sniff: per-record gzip members inflate to the plain
    // multi-record byte stream the scan below walks
    val p =
      if (raw.length >= 2 && raw(0) == GzipMagic0 && raw(1) == GzipMagic1)
        gunzipMembers(raw)
      else raw
    val acc = scala.collection.mutable.ArrayBuffer.empty[WarcDoc]
    var i = 0L
    var halted = false
    while (!halted && i < p.length) {
      val (doc, next, ok) = parseRecordAt(p, i)
      doc.foreach(acc += _)
      if (!ok) halted = true else i = next
    }
    acc.iterator
  }

  // --------------------------- CDX-indexed layout + ranged record fetch

  /** One CDX-style archive locator row: where a capture lives —
    * (filename, offset, length) point into the archive exactly as the
    * public CDX index format's `g`/`V`/`S` fields do — plus the
    * capture metadata a CDX line carries (url, timestamp, mime,
    * status, digest). For `.warc.gz` files the offset/length address
    * the record's own COMPRESSED gzip member, the real archives'
    * convention (per-record members exist precisely so an index can
    * point a reader at one record without inflating the file).
    */
  case class WarcLoc(
      filename: String,
      offset: Long,
      length: Long,
      url: String,
      ts: String,
      mime: String,
      status: Int,
      digest: String)

  private[graft] def filenameOf(fileId: Long, gz: Boolean): String =
    s"graft-$fileId.warc" + (if (gz) ".gz" else "")

  /** [[withWarcPayload]] with its CDX index synthesized DURING
    * assembly: one row per file carrying the payload AND the
    * per-record locator array with REAL byte offsets (measured as the
    * bytes are laid down, not recomputed after the fact). This is the
    * missing half of the archive data model: the CDX index locates
    * captures, the WARC file holds them, and
    * [[readRecordsAt]] joins the two — select captures in the index,
    * read exactly those records.
    */
  def withWarcPayloadIndexed(pages: DataFrame, gz: Boolean = false): DataFrame = {
    val spark = pages.sparkSession
    import spark.implicits._
    pages.select(col("doc_id"), col("html"))
      .withColumn("file_id", expr(s"doc_id div $DocsPerFile"))
      .as[(Long, String, Long)]
      .groupByKey(_._3)
      .mapGroups { (fileId, rows) =>
        val docs = rows.toArray.sortBy(_._1)
        val fname = filenameOf(fileId, gz)
        val buf = new java.io.ByteArrayOutputStream()
        buf.write(if (gz) gzipMember(warcinfo(fileId)) else warcinfo(fileId))
        val locs = scala.collection.mutable.ArrayBuffer.empty[WarcLoc]
        docs.foreach { case (id, html, _) =>
          val rec = warcResponse(id, html)
          val bytes = if (gz) gzipMember(rec) else rec
          val md = java.security.MessageDigest.getInstance("MD5")
          val digest = md.digest(html.getBytes("UTF-8"))
            .map("%02x".format(_)).mkString.substring(0, 8)
          locs += WarcLoc(
            fname, buf.size().toLong, bytes.length.toLong,
            urlOf(id), dateOf(id), "text/html", statusOf(id), digest)
          buf.write(bytes)
        }
        (fname, buf.toByteArray, locs.toSeq)
      }
      .toDF("filename", "payload", "locators")
  }

  /** One fetched record with its provenance — what the index-driven
    * read returns per locator.
    */
  case class WarcFetched(
      filename: String,
      offset: Long,
      doc_id: Long,
      url: String,
      warc_date: String,
      status: Int,
      n_block_bytes: Long,
      html: String)

  /** (offset, length) pair of one selected locator — public because
    * the codegen'd deserializer for the join row must construct it.
    */
  case class LocSlice(offset: Long, length: Long)

  /** Parse the single record at `[offset, offset+length)` of an
    * archive file — the CDX-pointer read: slice the range, inflate it
    * if it is a gzip member, parse exactly one record. A locator into
    * a corrupt or mismatched range yields None (dropped data, never a
    * job failure) — and because the read never walks the rest of the
    * file, a corrupt EARLIER record cannot shadow an intact one the
    * index points at (the whole-file scan necessarily halts there).
    */
  private[graft] def recordAt(p: Array[Byte], offset: Long, length: Long): Option[WarcDoc] = {
    if (offset < 0 || length <= 0 || offset + length > p.length) None
    else parseSlice(java.util.Arrays.copyOfRange(p, offset.toInt, (offset + length).toInt))
  }

  /** Parse exactly one record from an already-fetched byte range —
    * gzip-member sniff + the shared [[parseRecordAt]] kernel. The
    * payload-column read ([[recordAt]]) and the seek-based ranged read
    * ([[readRecordsFromFiles]]) both end here, so the two fetch paths
    * can never parse differently.
    */
  private[graft] def parseSlice(slice: Array[Byte]): Option[WarcDoc] = {
    val body =
      if (slice.length >= 2 && slice(0) == GzipMagic0 && slice(1) == GzipMagic1)
        gunzipMembers(slice)
      else slice
    parseRecordAt(body, 0L)._1
  }

  /** The index-driven pruned read: `locs` is the SELECTED subset of a
    * CDX index (filename, offset, length — whatever else rides along
    * is ignored), `files` the archive. Only files named by a selected
    * locator are parsed at all — the inner join drops the rest before
    * any byte is touched — and within a file only the addressed
    * ranges are parsed, never the full record walk. Scale shape: the
    * selected locator set grouped per file is index-sized (broadcast
    * under AQE); parallelism stays one-file-one-task, exactly the
    * [[parseWarcRecords]] model, with per-task work proportional to
    * the SELECTED records, not the archive.
    */
  def readRecordsAt(files: DataFrame, locs: DataFrame): Dataset[WarcFetched] = {
    val spark = files.sparkSession
    import spark.implicits._
    files.select(col("filename"), col("payload"))
      .join(selectedSlices(locs), Seq("filename"))
      .as[(String, Array[Byte], Seq[LocSlice])]
      .flatMap { case (fname, payload, ls) =>
        ls.flatMap { l =>
          recordAt(payload, l.offset, l.length).map(d =>
            WarcFetched(
              fname, l.offset, d.doc_id, d.url, d.warc_date, d.status,
              d.n_block_bytes, d.html))
        }
      }
  }

  /** The selected locator set grouped per file — the per-task work
    * unit both ranged-read faces consume: (filename, sorted (offset,
    * length) slices).
    */
  private def selectedSlices(locs: DataFrame): DataFrame =
    locs
      .select(col("filename"), col("offset"), col("length"))
      .groupBy("filename")
      .agg(expr("array_sort(collect_list(struct(offset, length)))").as("locs"))

  /** Materialize an indexed archive's payload column as REAL files
    * under `dir` (one `filename` each) — fixture plumbing for the
    * seek-based read face: a real archive already IS files; the
    * synthesized one must become files before a reader can seek into
    * it. Writes ride the executors (payloads never collect).
    */
  def writeArchiveFiles(indexed: DataFrame, dir: String): Unit = {
    val spark = indexed.sparkSession
    import spark.implicits._
    indexed.select(col("filename"), col("payload"))
      .as[(String, Array[Byte])]
      .foreachPartition { it: Iterator[(String, Array[Byte])] =>
        val conf = new org.apache.hadoop.conf.Configuration()
        it.foreach { case (fname, payload) =>
          val p = new org.apache.hadoop.fs.Path(dir, fname)
          val fs = p.getFileSystem(conf)
          val out = fs.create(p, true)
          try out.write(payload)
          finally out.close()
        }
      }
  }

  /** The PRODUCTION ranged read: fetch each selected locator's
    * `[offset, offset+length)` bytes from the archive FILE by
    * open+seek — the object-store range-GET shape — and parse exactly
    * that record. Where [[readRecordsAt]] (the payload-column face)
    * carries every selected file's FULL bytes through its task, this
    * face reads Σ selected lengths: a 100 TB archive with 1 GB WARC
    * files serving a locator set that touches 0.1% of each file pays
    * 0.1% of the I/O. Parallelism is one-file-one-task over the
    * index-sized locator set; slices are read in ascending offset
    * order (one forward-seeking stream per file — sequential-friendly
    * on disks, coalesce-friendly on object stores). A missing or
    * truncated file drops ITS records (data, not a job failure), the
    * [[scanFile]] discipline.
    *
    * SLICE COALESCING: on an object store every slice is a range-GET
    * round trip, and a locator set that selects many records from one
    * file (a domain crawl's pages land consecutively in the same
    * WARC) would pay a request per record. Adjacent slices whose gap
    * is below [[RangedReadCoalesceGap]] merge into ONE read — each
    * record then parses out of its sub-range of the merged buffer —
    * trading ≤ gap wasted bytes per merge for a saved round trip
    * (the readahead/merge policy object-store connectors apply for
    * the same reason). Bytes-read is therefore bounded by
    * Σ lengths + (slices − 1) · gap, and equals Σ lengths exactly
    * when no slices sit within a gap of each other. A merged range
    * is additionally capped at [[RangedReadCoalesceMaxLen]] bytes —
    * a dense selection over a multi-GB file must fuse into a chain
    * of buffer-sized reads, never one file-sized allocation (a
    * single slice larger than the cap still reads alone; it needs
    * its buffer regardless).
    *
    * ERROR ISOLATION survives coalescing: a fused read that fails (a
    * range crossing a truncation point) DEGRADES to per-slice reads
    * of its members, so every record before the truncation still
    * returns and only the slices past EOF drop — exactly the
    * uncoalesced face's behavior, paid only on the broken range. A
    * missing file still drops only its own records.
    *
    * `bytesRead` / `readRequests` are test seams: every byte the face
    * pulls from storage and every positioned read it issues are
    * counted there, which is how the spec pins the Σ-lengths bound
    * and the fewer-requests property of coalescing.
    */
  def readRecordsFromFiles(
      dir: String, locs: DataFrame): Dataset[WarcFetched] =
    readRecordsFromFiles(dir, locs, None)

  /** Merge threshold for adjacent ranged-read slices: 64 KiB — small
    * next to a typical record, large enough to fuse records that were
    * written consecutively with only headers/small records between.
    */
  val RangedReadCoalesceGap: Long = 64L * 1024

  /** Upper bound on one merged range (and so on one task-local read
    * buffer): 8 MiB, the readahead-buffer order of magnitude — a
    * dense selection over a large file chains many capped reads
    * instead of allocating the file's size in memory.
    */
  val RangedReadCoalesceMaxLen: Long = 8L * 1024 * 1024

  private[graft] def readRecordsFromFiles(
      dir: String,
      locs: DataFrame,
      bytesRead: Option[org.apache.spark.util.LongAccumulator],
      readRequests: Option[org.apache.spark.util.LongAccumulator] = None,
      coalesceGap: Long = RangedReadCoalesceGap): Dataset[WarcFetched] = {
    val spark = locs.sparkSession
    import spark.implicits._
    selectedSlices(locs)
      .as[(String, Seq[LocSlice])]
      .flatMap { case (fname, ls) =>
        val conf = new org.apache.hadoop.conf.Configuration()
        val p = new org.apache.hadoop.fs.Path(dir, fname)
        val out = scala.collection.mutable.ArrayBuffer.empty[WarcFetched]
        // group ascending-offset slices into merged ranges: a slice
        // joins the open range when its gap is under the threshold
        // and the merged range still fits one buffer
        val valid = ls.filter(l =>
          l.offset >= 0 && l.length > 0 && l.length <= Int.MaxValue)
        val maxLen = math.min(
          math.max(RangedReadCoalesceMaxLen, 1L), Int.MaxValue.toLong)
        val ranges = scala.collection.mutable.ArrayBuffer
          .empty[(Long, Long, scala.collection.mutable.ArrayBuffer[LocSlice])]
        valid.foreach { l =>
          val lEnd = l.offset + l.length
          if (ranges.nonEmpty && {
                val (s0, e0, _) = ranges.last
                // fuse when the gap is small AND the merged range stays
                // under the buffer cap (an oversize single slice still
                // opens its own range — it needs that buffer regardless)
                l.offset <= e0 + coalesceGap &&
                math.max(e0, lEnd) - s0 <= math.max(maxLen, l.length)
              }) {
            val (s0, e0, members) = ranges.last
            members += l
            ranges(ranges.length - 1) = (s0, math.max(e0, lEnd), members)
          } else
            ranges += ((l.offset, lEnd,
              scala.collection.mutable.ArrayBuffer(l)))
        }
        try {
          val fs = p.getFileSystem(conf)
          val in = fs.open(p)
          try {
            def parseMember(l: LocSlice, buf: Array[Byte], at: Int): Unit =
              parseSlice(java.util.Arrays.copyOfRange(buf, at, at + l.length.toInt))
                .foreach(d =>
                  out += WarcFetched(
                    fname, l.offset, d.doc_id, d.url, d.warc_date, d.status,
                    d.n_block_bytes, d.html))
            ranges.foreach { case (start, end, members) =>
              try {
                val buf = new Array[Byte]((end - start).toInt)
                in.seek(start)
                // count the request BEFORE the read: the seam reflects
                // ISSUED storage round trips, not successful ones — a
                // fused read that dies on a truncation still cost its
                // round trip, and so does each per-slice retry below
                readRequests.foreach(_.add(1))
                in.readFully(buf)
                bytesRead.foreach(_.add(end - start))
                members.foreach(l => parseMember(l, buf, (l.offset - start).toInt))
              } catch {
                // the fused read crossed a truncation point: degrade
                // this range to per-slice reads so every record before
                // the truncation still returns — the uncoalesced
                // face's records-before-the-truncation behavior; only
                // the slices past EOF drop
                case _: java.io.IOException =>
                  members.foreach { l =>
                    try {
                      val buf = new Array[Byte](l.length.toInt)
                      in.seek(l.offset)
                      readRequests.foreach(_.add(1))
                      in.readFully(buf)
                      bytesRead.foreach(_.add(l.length))
                      parseMember(l, buf, 0)
                    } catch { case _: java.io.IOException => () }
                  }
              }
            }
          } finally in.close()
        } catch {
          // missing file: its records are dropped data, never a job
          // failure
          case _: java.io.IOException => ()
        }
        out
      }
  }
}
