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

  test("pixelHistogram counts every pixel into 256/bins buckets") {
    // bmpPatternBytes pixel value = (seed + r*rowCoef + c*colCoef) % 256.
    // 4x2 raster, seed 10, coefs 7/3: values {10,13,16,19,17,20,23,26}
    // -> bins (width 32): all in bin 0. Totals must equal w*h.
    val flat = DocBuild.bmpPatternBytes(4, 2, 10, 7, 3)
    val h1 = Multimodal.pixelHistogram(flat, 8).get
    assert(h1.sum == 8L && h1(0) == 8L, s"got ${h1.toSeq}")
    // seed 250 wraps: values {250,253,0,3,1,4,7,10} -> bin 7 gets 2
    // (250,253), bin 0 gets 6.
    val wrap = DocBuild.bmpPatternBytes(4, 2, 250, 7, 3)
    val h2 = Multimodal.pixelHistogram(wrap, 8).get
    assert(h2(7) == 2L && h2(0) == 6L && h2.sum == 8L, s"got ${h2.toSeq}")
    assert(Multimodal.pixelHistogram("junk".getBytes("UTF-8"), 8).isEmpty)
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

  test("decodePngDims parses real IHDR bytes across color types") {
    assert(Multimodal.decodePngDims(DocBuild.pngBytes(17, 9, 0, 128))
      .contains((17, 9, 1)))   // grayscale
    assert(Multimodal.decodePngDims(DocBuild.pngBytes(40, 30, 2, 5))
      .contains((40, 30, 3)))  // RGB
    assert(Multimodal.decodePngDims(DocBuild.pngBytes(3, 200, 6, 250))
      .contains((3, 200, 4)))  // RGBA
  }

  test("decodePngDims rejects non-PNGs and bad headers") {
    assert(Multimodal.decodePngDims("not a png".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.decodePngDims(null).isEmpty)
    // BMP bytes are not a PNG.
    assert(Multimodal.decodePngDims(DocBuild.bmpBytes(8, 8, 1)).isEmpty)
    // Valid signature but corrupted IHDR type tag.
    val broken = DocBuild.pngBytes(8, 8, 2, 1).clone()
    broken(12) = 'X'.toByte
    assert(Multimodal.decodePngDims(broken).isEmpty)
    // Unknown color type.
    val badCt = DocBuild.pngBytes(8, 8, 2, 1).clone()
    badCt(25) = 7.toByte
    assert(Multimodal.decodePngDims(badCt).isEmpty)
    // decodeDims sentinel for corrupt bytes under image/png.
    assert(Multimodal.decodeDims("junk".getBytes("UTF-8"), "image/png") ==
      ((0, 0, 0)))
    assert(Multimodal.decodeDims(DocBuild.pngBytes(20, 10, 6, 3),
      "image/png") == ((20, 10, 4)))
  }

  test("decodeJpegDims parses the SOF frame header of real marker streams") {
    assert(Multimodal.decodeJpegDims(DocBuild.jpegBytes(17, 9, 1, 128))
      .contains((17, 9, 1)))   // grayscale
    assert(Multimodal.decodeJpegDims(DocBuild.jpegBytes(640, 480, 3, 5))
      .contains((640, 480, 3))) // YCbCr
    // SOF2 (progressive) frame headers parse the same way.
    val prog = DocBuild.jpegBytes(32, 24, 3, 9).clone()
    val sofAt = { // locate the FFC0 marker
      val idx = prog.indices.dropRight(1).find(i =>
        (prog(i) & 0xff) == 0xff && (prog(i + 1) & 0xff) == 0xc0).get
      prog(idx + 1) = 0xc2.toByte
      idx
    }
    assert(sofAt > 0 && Multimodal.decodeJpegDims(prog).contains((32, 24, 3)))
  }

  test("decodeJpegDims rejects non-JPEGs and truncated streams") {
    assert(Multimodal.decodeJpegDims("not a jpeg".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.decodeJpegDims(null).isEmpty)
    assert(Multimodal.decodeJpegDims(DocBuild.pngBytes(8, 8, 2, 1)).isEmpty)
    // SOI alone, and a stream truncated inside a segment.
    assert(Multimodal.decodeJpegDims(
      Array(0xff, 0xd8).map(_.toByte)).isEmpty)
    assert(Multimodal.decodeJpegDims(
      DocBuild.jpegBytes(20, 10, 3, 1).take(12)).isEmpty)
    // decodeDims dispatch (both subtype spellings) + corrupt sentinel.
    assert(Multimodal.decodeDims(DocBuild.jpegBytes(20, 10, 3, 1),
      "image/jpeg") == ((20, 10, 3)))
    assert(Multimodal.decodeDims(DocBuild.jpegBytes(20, 10, 1, 1),
      "image/jpg") == ((20, 10, 1)))
    assert(Multimodal.decodeDims("junk".getBytes("UTF-8"), "image/jpeg") ==
      ((0, 0, 0)))
  }

  test("decodeWavMeta parses real RIFF headers and rejects non-WAVs") {
    // 16 kHz stereo 16-bit, 1600 samples -> exactly 100 ms.
    assert(Multimodal.decodeWavMeta(DocBuild.wavBytes(2, 16000, 16, 1600, 5))
      .contains((2, 16000, 16, 100L)))
    // 44.1 kHz mono 8-bit, 441 samples -> floor(441000/44100) = 10 ms.
    assert(Multimodal.decodeWavMeta(DocBuild.wavBytes(1, 44100, 8, 441, 0))
      .contains((1, 44100, 8, 10L)))
    // A LIST chunk (odd size, pad byte) before fmt/data must be skipped.
    val wav = DocBuild.wavBytes(1, 8000, 8, 80, 9)
    val list = Array[Byte]('L', 'I', 'S', 'T', 3, 0, 0, 0, 'x', 'y', 'z', 0)
    val withList = wav.take(12) ++ list ++ wav.drop(12)
    val bb = java.nio.ByteBuffer.wrap(withList)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(4, withList.length - 8)   // fix RIFF size
    assert(Multimodal.decodeWavMeta(withList).contains((1, 8000, 8, 10L)))
    assert(Multimodal.decodeWavMeta("RIFFnope".getBytes("US-ASCII")).isEmpty)
    assert(Multimodal.decodeWavMeta(wav.take(30)).isEmpty)
    assert(Multimodal.decodeWavMeta(null).isEmpty)
  }

  test("audioFeatures carries real WAV metadata through the batch stage") {
    val rows = Seq(
      MediaRow(1L, DocBuild.wavBytes(2, 16000, 16, 1600, 5), "audio/wav"),
      MediaRow(2L, DocBuild.wavBytes(1, 8000, 8, 80, 1), "AUDIO/X-WAV"),
      MediaRow(3L, "not audio".getBytes("UTF-8"), "audio/wav"),
      MediaRow(4L, DocBuild.wavBytes(1, 8000, 8, 80, 1), "video/mp4"))
    val got = spark.createDataset(rows)
      .transform(ds => Multimodal.audioFeatures(ds))
      .select("doc_id", "channels", "sample_rate", "bits_per_sample",
        "duration_ms")
      .as[(Long, Int, Int, Int, Long)].collect().sortBy(_._1)
    assert(got(0) == ((1L, 2, 16000, 16, 100L)))
    assert(got(1) == ((2L, 1, 8000, 8, 10L)))
    assert(got(2) == ((3L, 0, 0, 0, 0L)))   // corrupt -> sentinel
    assert(got(3) == ((4L, 0, 0, 0, 0L)))   // no codec for this type
  }

  test("decodeMp4Meta parses real mvhd boxes and rejects non-MP4s") {
    // 1000 units/s, 90500 units -> 90500 ms exactly.
    assert(Multimodal.decodeMp4Meta(DocBuild.mp4Bytes(1000, 90500, 3))
      .contains((1000, 90500L)))
    // 90000 units/s, 123456 units -> floor(123456000/90000) = 1371 ms.
    assert(Multimodal.decodeMp4Meta(DocBuild.mp4Bytes(90000, 123456, 0))
      .contains((90000, 1371L)))
    // A version-1 mvhd (64-bit times) parses through the v1 offsets.
    val v1 = {
      def box(typ: String, p: Array[Byte]): Array[Byte] = {
        val bb = java.nio.ByteBuffer.allocate(8 + p.length)
        bb.putInt(8 + p.length).put(typ.getBytes("US-ASCII")).put(p)
        bb.array()
      }
      val mvhd = java.nio.ByteBuffer.allocate(112)
      mvhd.putInt(0x01000000)          // version 1
      mvhd.putLong(0L).putLong(0L)     // 64-bit ctime/mtime
      mvhd.putInt(600)                 // timescale at offset 20
      mvhd.putLong(1234L)              // 64-bit duration at offset 24
      box("ftyp", "isom".getBytes("US-ASCII")) ++
        box("moov", box("mvhd", mvhd.array()))
    }
    assert(Multimodal.decodeMp4Meta(v1).contains((600, 1234L * 1000 / 600)))
    assert(Multimodal.decodeMp4Meta("ftypnope".getBytes("US-ASCII")).isEmpty)
    assert(Multimodal.decodeMp4Meta(
      DocBuild.mp4Bytes(1000, 500, 1).take(20)).isEmpty)
    assert(Multimodal.decodeMp4Meta(null).isEmpty)
  }

  test("videoFeatures carries real MP4 metadata through the batch stage") {
    val rows = Seq(
      MediaRow(1L, DocBuild.mp4Bytes(1000, 2500, 7), "video/mp4"),
      MediaRow(2L, "junk".getBytes("UTF-8"), "video/mp4"),
      MediaRow(3L, DocBuild.mp4Bytes(1000, 2500, 7), "audio/wav"))
    val got = spark.createDataset(rows)
      .transform(ds => Multimodal.videoFeatures(ds))
      .select("doc_id", "timescale", "duration_ms")
      .as[(Long, Int, Long)].collect().sortBy(_._1)
    assert(got(0) == ((1L, 1000, 2500L)))
    assert(got(1) == ((2L, 0, 0L)))   // corrupt -> sentinel
    assert(got(2) == ((3L, 0, 0L)))   // wrong media type
  }

  test("decodeGifDims parses the logical screen descriptor") {
    assert(Multimodal.decodeGifDims(DocBuild.gifBytes(40, 20, 7))
      .contains((40, 20, 3)))
    // GIF87a signature is accepted too.
    val g87 = DocBuild.gifBytes(5, 6, 0)
    g87(4) = '7'.toByte
    assert(Multimodal.decodeGifDims(g87).contains((5, 6, 3)))
    assert(Multimodal.decodeGifDims("GIFnope".getBytes("US-ASCII")).isEmpty)
    assert(Multimodal.decodeGifDims(
      DocBuild.gifBytes(5, 6, 0).take(10)).isEmpty)
    assert(Multimodal.decodeGifDims(null).isEmpty)
    // A zero-width descriptor is rejected.
    val zero = DocBuild.gifBytes(1, 1, 0)
    zero(6) = 0; zero(7) = 0
    assert(Multimodal.decodeGifDims(zero).isEmpty)
    assert(Multimodal.decodeDims(DocBuild.gifBytes(12, 9, 3), "image/gif") ==
      ((12, 9, 3)))
    assert(Multimodal.decodeDims("junk".getBytes("UTF-8"), "image/gif") ==
      ((0, 0, 0)))
  }

  test("gifBytes is a fully valid GIF: independent LZW decode round-trips") {
    // Walk the file with an independent reader: header, palette, image
    // descriptor, then a GENERAL GIF-LZW decoder (dictionary growth,
    // width escalation, KwKwK case) over the unwrapped sub-blocks. The
    // encoder's clear-code trick must be invisible to a spec decoder.
    val (w, h, px) = (21, 13, 77)
    val gif = DocBuild.gifBytes(w, h, px)
    val bb = java.nio.ByteBuffer.wrap(gif)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    assert(new String(gif, 0, 6, "US-ASCII") == "GIF89a")
    assert((bb.getShort(6) & 0xffff) == w && (bb.getShort(8) & 0xffff) == h)
    val gctSize = 2 << (gif(10) & 0x07)   // 4 entries
    var i = 13 + 3 * gctSize
    assert(gif(i) == 0x2c)                // image descriptor
    assert((bb.getShort(i + 5) & 0xffff) == w)
    assert((bb.getShort(i + 7) & 0xffff) == h)
    val minCode = gif(i + 10) & 0xff
    i += 11
    val data = new java.io.ByteArrayOutputStream()
    while ((gif(i) & 0xff) != 0) {        // unwrap data sub-blocks
      val n = gif(i) & 0xff
      data.write(gif, i + 1, n)
      i += 1 + n
    }
    assert(gif(i + 1) == 0x3b.toByte)     // trailer right after
    val bytes = data.toByteArray
    val clear = 1 << minCode
    val end = clear + 1
    var width = minCode + 1
    val table = scala.collection.mutable.ArrayBuffer.empty[List[Int]]
    var prev: List[Int] = null
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    var acc = 0L; var nbits = 0; var j = 0
    def next(): Int = {
      while (nbits < width && j < bytes.length) {
        acc |= (bytes(j) & 0xff).toLong << nbits; nbits += 8; j += 1
      }
      val c = (acc & ((1L << width) - 1)).toInt
      acc >>= width; nbits -= width; c
    }
    var done = false
    while (!done) {
      val c = next()
      if (c == end) done = true
      else if (c == clear) { table.clear(); width = minCode + 1; prev = null }
      else {
        val entry =
          if (c < clear) List(c)
          else if (c - clear - 2 < table.length) table(c - clear - 2)
          else prev :+ prev.head          // KwKwK
        out ++= entry
        if (prev != null) {
          table += (prev :+ entry.head)
          if (clear + 2 + table.length == (1 << width) && width < 12)
            width += 1
        }
        prev = entry
      }
    }
    assert(out.toSeq == (0 until w * h).map(k => (px + k) % 4))
  }

  test("decodeTiffDims walks the IFD in both byte orders") {
    assert(Multimodal.decodeTiffDims(DocBuild.tiffBytes(40, 30, 3, 7))
      .contains((40, 30, 3)))
    assert(Multimodal.decodeTiffDims(
      DocBuild.tiffBytes(25, 19, 1, 0, bigEndian = true))
      .contains((25, 19, 1)))
    assert(Multimodal.decodeTiffDims(DocBuild.tiffBytes(8, 8, 4, 2))
      .contains((8, 8, 4)))
    // Width/height as SHORTs (type 3) parse through the inline path:
    // patch the LONG entries the builder writes into SHORT form.
    val short = DocBuild.tiffBytes(12, 5, 1, 0)
    val bb = java.nio.ByteBuffer.wrap(short)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putShort(10 + 2, 3.toShort)    // entry 0 (tag 256) type -> SHORT
    bb.putShort(10 + 12 + 2, 3.toShort)
    assert(Multimodal.decodeTiffDims(short).contains((12, 5, 1)))
    // Rejections: bad BOM, bad magic, truncated IFD, zero dims.
    assert(Multimodal.decodeTiffDims("XX* ....".getBytes("US-ASCII")).isEmpty)
    val badMagic = DocBuild.tiffBytes(4, 4, 1, 0)
    badMagic(2) = 43
    assert(Multimodal.decodeTiffDims(badMagic).isEmpty)
    assert(Multimodal.decodeTiffDims(
      DocBuild.tiffBytes(4, 4, 1, 0).take(20)).isEmpty)
    assert(Multimodal.decodeTiffDims(null).isEmpty)
    assert(Multimodal.decodeDims(DocBuild.tiffBytes(6, 7, 3, 1),
      "image/tiff") == ((6, 7, 3)))
    assert(Multimodal.decodeDims("junk".getBytes("UTF-8"), "image/tiff") ==
      ((0, 0, 0)))
  }

  test("decodeWebpDims parses VP8L, VP8 and VP8X chunk headers") {
    assert(Multimodal.decodeWebpDims(DocBuild.webpBytes(33, 21, false, 1))
      .contains((33, 21, 3)))
    assert(Multimodal.decodeWebpDims(DocBuild.webpBytes(16384, 1, true, 0))
      .contains((16384, 1, 4)))          // 14-bit max width + alpha hint
    assert(Multimodal.decodeWebpDims(DocBuild.webpLossyBytes(64, 48, 2))
      .contains((64, 48, 3)))
    // VP8X extended header: u24 canvas dims + 0x10 alpha flag.
    val vp8x = {
      val p = new Array[Byte](10)
      p(0) = 0x10                         // alpha
      p(4) = 0xff.toByte; p(5) = 0x01     // width-1 = 511
      p(7) = 0x2b                         // height-1 = 43
      val bb = java.nio.ByteBuffer.allocate(20 + p.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(12 + p.length)
      bb.put("WEBP".getBytes("US-ASCII")).put("VP8X".getBytes("US-ASCII"))
      bb.putInt(p.length).put(p)
      bb.array()
    }
    assert(Multimodal.decodeWebpDims(vp8x).contains((512, 44, 4)))
    assert(Multimodal.decodeWebpDims("RIFFxxxxWAVE".getBytes("US-ASCII")
      ++ new Array[Byte](20)).isEmpty)
    assert(Multimodal.decodeWebpDims(
      DocBuild.webpBytes(9, 9, false, 0).take(22)).isEmpty)
    assert(Multimodal.decodeWebpDims(null).isEmpty)
    // Corrupt VP8L signature byte -> rejected.
    val bad = DocBuild.webpBytes(9, 9, false, 0)
    bad(20) = 0x00
    assert(Multimodal.decodeWebpDims(bad).isEmpty)
    assert(Multimodal.decodeDims(DocBuild.webpBytes(10, 4, true, 5),
      "image/webp") == ((10, 4, 4)))
  }

  test("decodeMp4Samples expands stts runs and reads per-sample stsz") {
    // Two stts runs (3 @ 40, 2 @ 80) must expand to five durations; the
    // media timescale comes from mdhd, not mvhd.
    val bytes = DocBuild.mp4SampledBytes(1000,
      Array(40, 40, 40, 80, 80), Array(10, 11, 12, 13, 14), 3)
    val Some((ts, durs, sizes)) = Multimodal.decodeMp4Samples(bytes)
    assert(ts == 1000)
    assert(durs.toSeq == Seq(40, 40, 40, 80, 80))
    assert(sizes.toSeq == Seq(10, 11, 12, 13, 14))
    // The same bytes still satisfy the mvhd-only reader (duration sum).
    assert(Multimodal.decodeMp4Meta(bytes).contains((1000, 280L)))
    // A uniform stsz (nonzero sample_size field) fans out to every
    // sample: patch the per-sample table into the uniform form.
    val uniform = {
      val b = bytes.clone()
      val at = {   // locate the stsz box payload
        var i = 0
        while (!(b(i + 4) == 's' && b(i + 5) == 't' && b(i + 6) == 's' &&
          b(i + 7) == 'z')) i += 1
        i + 8
      }
      java.nio.ByteBuffer.wrap(b).putInt(at + 4, 99)  // sample_size = 99
      b
    }
    assert(Multimodal.decodeMp4Samples(uniform).get._3.toSeq ==
      Seq(99, 99, 99, 99, 99))
    // Rejections: no sample table (mvhd-only file), stts/stsz count
    // mismatch is impossible from the builder, so corrupt the count.
    assert(Multimodal.decodeMp4Samples(DocBuild.mp4Bytes(1000, 500, 1)).isEmpty)
    assert(Multimodal.decodeMp4Samples("junk".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.decodeMp4Samples(null).isEmpty)
  }

  test("sampleFrames emits exact stts offsets and stsz sizes") {
    // Variable frame rate: 3 samples at 25 fps (40 units @ ts 1000),
    // then 2 at 12.5 fps — offsets are cumulative sums, not i*constant.
    val rows = Seq(
      MediaRow(1L, DocBuild.mp4SampledBytes(1000,
        Array(40, 40, 40, 80, 80), Array(10, 11, 12, 13, 14), 3),
        "video/mp4"),
      MediaRow(2L, "not a video".getBytes("UTF-8"), "video/mp4"))
    val got = spark.createDataset(rows)
      .transform(ds => Multimodal.sampleFrames(ds, everyN = 2))
      .as[(Long, Int, Long, Int)].collect().sorted
    // doc 1 offsets in units: 0, 40, 80, 120, 200 -> sampled idx 0/2/4.
    assert(got.toSeq == Seq((1L, 0, 0L, 10), (1L, 2, 80L, 12),
      (1L, 4, 200L, 14)))   // doc 2: no parseable table -> zero frames
    // A 90 kHz timescale divides down to exact ms.
    val hi = Seq(MediaRow(9L, DocBuild.mp4SampledBytes(90000,
      Array.fill(4)(3600), Array.fill(4)(7), 0), "video/mp4")).toDS()
    val hiGot = Multimodal.sampleFrames(hi, everyN = 1)
      .as[(Long, Int, Long, Int)].collect().sorted
    assert(hiGot.map(_._3).toSeq == Seq(0L, 40L, 80L, 120L))
  }

  test("pngBytes chunks carry valid lengths and CRCs") {
    // Walk the chunk list with an independent reader: every chunk's
    // CRC32 over type+data must match, and the list must be exactly
    // IHDR, IDAT, IEND with a correct total length.
    val png = DocBuild.pngBytes(12, 7, 2, 77)
    val bb = java.nio.ByteBuffer.wrap(png)
    bb.position(8)
    val seen = scala.collection.mutable.ListBuffer.empty[String]
    while (bb.remaining() > 0) {
      val len = bb.getInt()
      val typeAndData = new Array[Byte](4 + len)
      bb.get(typeAndData)
      val crc = new java.util.zip.CRC32()
      crc.update(typeAndData)
      assert(bb.getInt() == crc.getValue.toInt)
      seen += new String(typeAndData, 0, 4, "US-ASCII")
    }
    assert(seen.toList == List("IHDR", "IDAT", "IEND"))
    // The IDAT inflates back to h * (1 + w*channels) filter-0 scanlines.
    val idatLen = java.nio.ByteBuffer.wrap(png).getInt(8 + 12 + 13 + 4)
    val idat = java.util.Arrays.copyOfRange(png,
      8 + 25 + 8, 8 + 25 + 8 + idatLen)
    val inf = new java.util.zip.Inflater()
    inf.setInput(idat)
    val raw = new Array[Byte](7 * (1 + 12 * 3) + 16)
    val n = inf.inflate(raw)
    assert(n == 7 * (1 + 12 * 3))
    assert(raw(0) == 0 && raw(1) == 77.toByte)
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
