package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: opaque `binary` payloads with typed
  * metadata, processed by a partition-batched typed stage — the shape a
  * real image/audio pipeline needs (schema, partitioning, batch
  * iteration).
  *
  * The FEATURE path is a real header decode: payloads are synthesized
  * with genuine PNG / baseline-JPEG container headers (magic bytes,
  * IHDR / SOF0 dimension fields, real CRC32 on the PNG chunk) and
  * [[extractFeatures]] parses them the way a codec would — signature
  * check, big-endian dimension reads, JPEG marker-segment scan. Full
  * pixel decode (the part that needs an image library this container
  * doesn't have) is the one piece still out of scope: the synthetic
  * "entropy data" after the header is ASCII-projected text so the
  * frame/resize twins can verify their byte-level plumbing through
  * DuckDB, which cannot construct binary headers.
  *
  * Scale notes: payloads stay on executors (no collect); the typed stage
  * processes one partition's rows as a streamed iterator, so memory is
  * bounded by one payload, not one partition; feature extraction
  * parallelizes per-partition with no shuffle at all.
  */
object Multimodal {

  /** One multimodal row: payload + typed metadata. */
  case class MmRow(doc_id: Long, modality: String, width: Long, height: Long, payload: Array[Byte])

  /** Extracted features: container format + dimensions parsed from the
    * payload HEADER BYTES (not copied from metadata — `decoded_w/h`
    * equal to `width/height` is the decode verifying the ingest).
    */
  case class MmFeatures(
      doc_id: Long,
      modality: String,
      width: Long,
      height: Long,
      format: String,
      decoded_w: Long,
      decoded_h: Long,
      n_bytes: Long,
      aspect: Double)

  /** Attach a binary payload + metadata to the documents table. The
    * payload is ASCII-projected text bytes standing in for an encoded
    * image (the projection keeps byte == character so the DuckDB oracle
    * — which has no blob byte extraction — can verify the stubbed
    * decode; real ingests carry true binary); width/height are derived
    * metadata a real ingest would carry.
    */
  def withPayload(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      lit("image").as("modality"),
      (col("n_chars") % 64 + 16).as("width"),
      (col("n_chars") * 7 % 64 + 16).as("height"),
      encode(regexp_replace(col("text"), "[^\\x20-\\x7e]", "_"), "utf-8").as("payload"))

  private val PngSig: Array[Byte] =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** PNG header (33 bytes): 8-byte signature + IHDR chunk (length, type,
    * 13-byte data with big-endian width/height, real CRC32 over
    * type+data) — what `file`/libpng would accept as a valid PNG start.
    */
  private[graft] def pngHeader(w: Int, h: Int): Array[Byte] = {
    val typeAndData = "IHDR".getBytes("US-ASCII") ++
      be32(w) ++ be32(h) ++ Array[Byte](8, 2, 0, 0, 0)
    val crc = new java.util.zip.CRC32()
    crc.update(typeAndData)
    PngSig ++ be32(13) ++ typeAndData ++ be32(crc.getValue.toInt)
  }

  /** Baseline-JPEG header (21 bytes): SOI + SOF0 segment with 16-bit
    * big-endian height/width and three component specs — the fields a
    * dimension probe reads before any entropy-coded data.
    */
  private[graft] def jpegHeader(w: Int, h: Int): Array[Byte] =
    Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xc0.toByte, 0x00, 0x11, 0x08) ++
      be16(h) ++ be16(w) ++
      Array[Byte](0x03, 0x01, 0x22, 0x00, 0x02, 0x11, 0x01, 0x03, 0x11, 0x01)

  private def be32(v: Int): Array[Byte] =
    Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
  private def be16(v: Int): Array[Byte] = Array((v >>> 8).toByte, v.toByte)

  private def readBe32(p: Array[Byte], off: Int): Long =
    ((p(off) & 0xffL) << 24) | ((p(off + 1) & 0xffL) << 16) |
      ((p(off + 2) & 0xffL) << 8) | (p(off + 3) & 0xffL)
  private def readBe16(p: Array[Byte], off: Int): Int =
    ((p(off) & 0xff) << 8) | (p(off + 1) & 0xff)

  /** Real container-header parse: (format, width, height) from the
    * payload bytes. PNG: signature + IHDR dimension fields. JPEG: SOI,
    * then a marker-segment scan to the first SOF0/SOF2 frame header
    * (skipping APPn/quant/Huffman segments by their length fields, as a
    * dimension probe does). Unrecognized bytes -> ("unknown", 0, 0) —
    * never throws, a corrupt payload is data, not a job failure.
    */
  private[graft] def parseHeader(p: Array[Byte]): (String, Long, Long) = {
    if (p.length >= 24 && p.startsWith(PngSig) &&
        p(12) == 'I' && p(13) == 'H' && p(14) == 'D' && p(15) == 'R')
      ("png", readBe32(p, 16), readBe32(p, 20))
    else if (p.length >= 2 && (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xd8) {
      var i = 2
      while (i < p.length && (p(i) & 0xff) == 0xff) {
        // 0xff runs are legal fill before any marker: j = the marker byte
        var j = i
        while (j < p.length && (p(j) & 0xff) == 0xff) j += 1
        if (j >= p.length) return ("jpeg", 0L, 0L)
        val marker = p(j) & 0xff
        if (marker == 0xc0 || marker == 0xc2) {
          // SOF0/SOF2: length(2) precision(1) height(2) width(2) ...
          return if (j + 8 <= p.length)
            ("jpeg", readBe16(p, j + 6).toLong, readBe16(p, j + 4).toLong)
          else ("jpeg", 0L, 0L)
        } else if (marker == 0xd9) {
          return ("jpeg", 0L, 0L) // EOI before any frame header
        } else if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd8)) {
          i = j + 1 // TEM/RSTn/SOI are standalone: no length field follows
        } else {
          if (j + 3 > p.length) return ("jpeg", 0L, 0L)
          val len = readBe16(p, j + 1)
          if (len < 2) return ("jpeg", 0L, 0L) // malformed length would stall the scan
          i = j + 1 + len // next marker's 0xff
        }
      }
      ("jpeg", 0L, 0L) // SOI but no frame header in range
    } else ("unknown", 0L, 0L)
  }

  /** Encoded-payload synth: a REAL container header (PNG for even
    * doc_ids, baseline JPEG for odd) carrying the metadata dimensions,
    * followed by the ASCII-projected text standing in for entropy data.
    * Header assembly is a typed partition stage — byte-level container
    * construction is imperative ingest work, not relational.
    */
  def withEncodedPayload(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
      col("doc_id"),
      (col("n_chars") % 64 + 16).as("width"),
      (col("n_chars") * 7 % 64 + 16).as("height"),
      encode(regexp_replace(col("text"), "[^\\x20-\\x7e]", "_"), "utf-8").as("body"))
      .as[(Long, Long, Long, Array[Byte])]
      .mapPartitions(_.map { case (id, w, h, body) =>
        val header = if (id % 2 == 0) pngHeader(w.toInt, h.toInt) else jpegHeader(w.toInt, h.toInt)
        MmRow(id, "image", w, h, header ++ body)
      })
      .toDF()
  }

  /** Feature extraction: partition-batched typed stage. The decoder is
    * [[parseHeader]] — a real magic-byte + dimension-field parse; rows
    * stream through it in the mapPartitions shape a full codec needs so
    * per-image library setup isn't paid per row.
    */
  def extractFeatures(withPayloadDf: DataFrame): Dataset[MmFeatures] = {
    val spark = withPayloadDf.sparkSession
    import spark.implicits._
    withPayloadDf.as[MmRow].mapPartitions { rows =>
      // per-partition decoder init would go here
      rows.map { r =>
        val (format, dw, dh) = parseHeader(r.payload)
        MmFeatures(
          doc_id = r.doc_id,
          modality = r.modality,
          width = r.width,
          height = r.height,
          format = format,
          decoded_w = dw,
          decoded_h = dh,
          n_bytes = r.payload.length.toLong,
          // HALF_UP to match both Spark's round() and DuckDB's round()
          aspect = BigDecimal(r.width.toDouble / r.height)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
    }
  }

  /** documents -> encoded payloads -> parsed features, the full
    * plumbing: `decoded_w/h` coming back equal to the metadata is the
    * round-trip proof the header parse reads the right bytes.
    */
  def features(docs: DataFrame): Dataset[MmFeatures] = extractFeatures(withEncodedPayload(docs))

  /** One sampled frame of a payload. */
  case class MmFrame(doc_id: Long, frame_idx: Long, n_bytes: Long, frame_md5: String)

  /** A stride-resampled ("resized") payload. */
  case class MmResized(doc_id: Long, n_bytes_resized: Long, resized_md5: String)

  val FrameBytes = 64
  val SampleEvery = 2
  val ResizeStride = 4

  private def hex(bytes: Array[Byte]): String =
    bytes.map("%02x".format(_)).mkString

  /** Frame sampling: chunk the payload into fixed-size frames, keep
    * every SampleEvery-th — the video-keyframe shape. A real decoder
    * would parse container frame boundaries; the chunking stands in for
    * that, and everything else (partition-batched iteration, one digest
    * instance reused per partition, per-frame rows out) is the real
    * plumbing.
    */
  def sampleFrames(withPayloadDf: DataFrame): Dataset[MmFrame] = {
    val spark = withPayloadDf.sparkSession
    import spark.implicits._
    withPayloadDf.as[MmRow].mapPartitions { rows =>
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.flatMap { r =>
        r.payload.grouped(FrameBytes).zipWithIndex.collect {
          case (frame, i) if i % SampleEvery == 0 =>
            MmFrame(r.doc_id, i.toLong, frame.length.toLong, hex(md.digest(frame)))
        }
      }
    }
  }

  /** Resize stub: stride-resample the payload (every ResizeStride-th
    * byte) — a real image resize decodes, scales, re-encodes; the
    * stride keeps the operator deterministic for the oracle while the
    * plumbing (bounded memory, per-partition batching) is real.
    */
  def resize(withPayloadDf: DataFrame): Dataset[MmResized] = {
    val spark = withPayloadDf.sparkSession
    import spark.implicits._
    withPayloadDf.as[MmRow].mapPartitions { rows =>
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.map { r =>
        val sampled = Array.range(0, r.payload.length, ResizeStride).map(r.payload(_))
        MmResized(r.doc_id, sampled.length.toLong, hex(md.digest(sampled)))
      }
    }
  }
}
