package graft.multimodal

import graft.SparkSpec
import graft.sources.DocBuild

/** The real BMP decoder: header roundtrip through DocBuild.bmpBytes,
  * top-down (negative height) images, corrupt-payload sentinel, and the
  * stub dispatch for media types with no real codec.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("decodeBmpDims parses real BITMAPINFOHEADER bytes") {
    assert(Multimodal.decodeBmpDims(DocBuild.bmpBytes(17, 9, 128))
      .contains((17, 9, 3)))
    assert(Multimodal.decodeBmpDims(DocBuild.bmpBytes(300, 200, 0))
      .contains((300, 200, 3)))
  }

  test("decodeBmpDims handles top-down rows and rejects non-BMPs") {
    val topDown = DocBuild.bmpBytes(8, 4, 7)
    val bb = java.nio.ByteBuffer.wrap(topDown)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(22, -4)   // negative height = top-down row order
    assert(Multimodal.decodeBmpDims(topDown).contains((8, 4, 3)))
    assert(Multimodal.decodeBmpDims("not a bitmap".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.decodeBmpDims(Array[Byte]('B', 'M')).isEmpty)
    assert(Multimodal.decodeBmpDims(null).isEmpty)
  }

  test("decodeDims dispatches: real BMP decode, stub elsewhere, corrupt sentinel") {
    val bmp = DocBuild.bmpBytes(20, 10, 1)
    assert(Multimodal.decodeDims(bmp, "image/bmp") == ((20, 10, 3)))
    assert(Multimodal.decodeDims(bmp, "IMAGE/BMP") == ((20, 10, 3)))
    // Corrupt bytes under a real-decoder type -> (0,0,0) sentinel.
    assert(Multimodal.decodeDims("junk".getBytes("UTF-8"), "image/bmp") ==
      ((0, 0, 0)))
    // Stub types keep the deterministic payload-hash dims.
    val payload = "anything".getBytes("UTF-8")
    assert(Multimodal.decodeDims(payload, "image") ==
      Multimodal.stubDims(payload))
  }

  test("imageFeatures carries real BMP dims through the batch stage") {
    val media = Seq(
      MediaRow(1L, DocBuild.bmpBytes(64, 16, 9), "image/bmp"),
      MediaRow(2L, DocBuild.bmpBytes(10, 12, 9), "image/bmp")).toDS()
    val got = Multimodal.imageFeatures(media, maxEdge = 32)
      .select("doc_id", "width", "height", "channels", "resized_w", "resized_h")
      .as[(Long, Int, Int, Int, Int, Int)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    assert(got(1L) == ((64, 16, 3, 32, 8)))    // downscaled to max edge
    assert(got(2L) == ((10, 12, 3, 10, 12)))   // never upscaled
  }
}
