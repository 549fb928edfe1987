package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: opaque `binary` payloads with typed
  * metadata, processed by a partition-batched typed stage — the shape a
  * real image/audio pipeline needs (schema, partitioning, batch
  * iteration), with the codec itself STUBBED.
  *
  * The decode step below is a DETERMINISTIC FAKE: this container has no
  * image/audio libraries, so `decodeStub` computes features from the raw
  * bytes (length, 16-byte header checksum). A production deployment
  * swaps `decodeStub` for a real codec (JPEG/PNG/PCM) — everything
  * around it (binary column, metadata struct, mapPartitions batching,
  * per-partition decoder reuse) is real and tested.
  *
  * Scale notes: payloads stay on executors (no collect); the typed stage
  * processes one partition's rows as a streamed iterator, so memory is
  * bounded by one payload, not one partition; feature extraction
  * parallelizes per-partition with no shuffle at all.
  */
object Multimodal {

  /** One multimodal row: payload + typed metadata. */
  case class MmRow(doc_id: Long, modality: String, width: Long, height: Long, payload: Array[Byte])

  /** Extracted features. */
  case class MmFeatures(
      doc_id: Long,
      modality: String,
      width: Long,
      height: Long,
      n_bytes: Long,
      header_sum: Long,
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

  /** STUB decode: a real implementation would parse the codec header and
    * decode pixel/sample data here. The fake reads raw byte length and a
    * 16-byte header checksum — deterministic, so the oracle can verify
    * the plumbing end-to-end.
    */
  private def decodeStub(payload: Array[Byte]): (Long, Long) = {
    var sum = 0L
    var i = 0
    val n = math.min(16, payload.length)
    while (i < n) { sum += payload(i) & 0xff; i += 1 }
    (payload.length.toLong, sum)
  }

  /** Feature extraction: partition-batched typed stage. One "decoder"
    * (here: nothing to initialize) is set up per partition, then rows
    * stream through it — the mapPartitions shape a real codec needs so
    * per-image library setup isn't paid per row.
    */
  def extractFeatures(withPayloadDf: DataFrame): Dataset[MmFeatures] = {
    val spark = withPayloadDf.sparkSession
    import spark.implicits._
    withPayloadDf.as[MmRow].mapPartitions { rows =>
      // per-partition decoder init would go here
      rows.map { r =>
        val (nBytes, headerSum) = decodeStub(r.payload)
        MmFeatures(
          doc_id = r.doc_id,
          modality = r.modality,
          width = r.width,
          height = r.height,
          n_bytes = nBytes,
          header_sum = headerSum,
          // HALF_UP to match both Spark's round() and DuckDB's round()
          aspect = BigDecimal(r.width.toDouble / r.height)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
    }
  }

  /** documents -> payloads -> features, the full plumbing. */
  def features(docs: DataFrame): Dataset[MmFeatures] = extractFeatures(withPayload(docs))

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
