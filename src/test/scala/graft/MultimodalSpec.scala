package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Container-header codec: PNG/JPEG synthesis + the real header parse
  * behind `mm_features`.
  */
class MultimodalSpec extends AnyFunSuite {

  test("parseHeader round-trips PNG and JPEG dimension fields") {
    assert(Multimodal.parseHeader(
      Multimodal.pngHeader(640, 480) ++ Array[Byte](1, 2, 3)) == (("png", 640L, 480L)))
    assert(Multimodal.parseHeader(
      Multimodal.jpegHeader(79, 31) ++ "entropy".getBytes) == (("jpeg", 79L, 31L)))
  }

  test("parseHeader scans past leading JPEG APPn segments to the frame header") {
    // SOI + APP0 (JFIF-sized, 16-byte segment) + SOF0: the parse must
    // skip APP0 by its length field, as any dimension probe does
    val app0 = Array[Byte](0xff.toByte, 0xe0.toByte, 0x00, 0x10) ++ Array.fill[Byte](14)(0x4a)
    val sof = Multimodal.jpegHeader(320, 200).drop(2) // strip its SOI
    val p = Array[Byte](0xff.toByte, 0xd8.toByte) ++ app0 ++ sof
    assert(Multimodal.parseHeader(p) == (("jpeg", 320L, 200L)))
  }

  test("parseHeader handles JPEG fill bytes and standalone markers") {
    val sof = Multimodal.jpegHeader(320, 200).drop(2) // FFC0 segment without SOI
    // legal 0xff fill padding between SOI and the frame header
    val fill = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xff.toByte, 0xff.toByte) ++ sof
    assert(Multimodal.parseHeader(fill) == (("jpeg", 320L, 200L)))
    // a standalone TEM marker (no length field) before the frame header
    val tem = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0x01) ++ sof
    assert(Multimodal.parseHeader(tem) == (("jpeg", 320L, 200L)))
    // EOI before any frame header: dimensions unavailable, no crash
    val eoi = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xd9.toByte)
    assert(Multimodal.parseHeader(eoi) == (("jpeg", 0L, 0L)))
    // malformed zero segment length must not stall the scan
    val bad = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xe0.toByte, 0x00, 0x00)
    assert(Multimodal.parseHeader(bad) == (("jpeg", 0L, 0L)))
  }

  test("parseHeader degrades on corrupt or truncated payloads, never throws") {
    assert(Multimodal.parseHeader("definitely not an image payload".getBytes)._1 == "unknown")
    assert(Multimodal.parseHeader(Array.empty[Byte]) == (("unknown", 0L, 0L)))
    // SOI with no frame header in range
    assert(Multimodal.parseHeader(Array[Byte](0xff.toByte, 0xd8.toByte)) == (("jpeg", 0L, 0L)))
    // truncated PNG (signature cut short) is not misread as anything
    assert(Multimodal.parseHeader(Multimodal.pngHeader(5, 5).take(20))._1 == "unknown")
  }

  test("features: decoded dims round-trip the metadata dims through real header bytes") {
    val spark = TestSpark.spark
    import spark.implicits._
    val docs = (1L to 12L).map(i => (i, s"document body number $i with some words"))
      .toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")))
    val out = Multimodal.features(docs).collect()
    assert(out.length == 12)
    out.foreach { f =>
      assert(f.format == (if (f.doc_id % 2 == 0) "png" else "jpeg"), s"doc ${f.doc_id}")
      assert(f.decoded_w == f.width && f.decoded_h == f.height,
        s"doc ${f.doc_id}: parsed (${f.decoded_w}x${f.decoded_h}) != metadata (${f.width}x${f.height})")
      val bodyLen = s"document body number ${f.doc_id} with some words".length
      assert(f.n_bytes == (if (f.doc_id % 2 == 0) 33 else 21) + bodyLen)
    }
  }
}
