package graft.sources

import java.io.ByteArrayOutputStream
import java.util.zip.{Deflater, ZipEntry, ZipOutputStream}

import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

/** Deterministic in-memory builders for the document formats DocExtract
  * parses — the synthetic stand-ins for fetched binary payloads (the
  * container ships no real PDFs/Office files, and the driver's tables
  * carry only text). Used by the s4-s8 round-trip queries and the
  * extraction specs: build bytes from known lines, extract, compare
  * against the SQL-expressible expectation.
  */
object DocBuild {

  private def escapeXml(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;").replace("'", "&apos;")

  private def zip(entries: (String, String)*): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val z = new ZipOutputStream(bos)
    // Level 0 = stored-deflate: the container stays a fully valid zip
    // (every reader, including DocExtract, parses it unchanged) but the
    // builder skips the compression work — it synthesizes test
    // payloads, not archives worth shrinking.
    z.setLevel(Deflater.NO_COMPRESSION)
    entries.foreach { case (name, content) =>
      z.putNextEntry(new ZipEntry(name))
      z.write(content.getBytes("UTF-8"))
      z.closeEntry()
    }
    z.close()
    bos.toByteArray
  }

  /** Minimal .docx: one paragraph per line. */
  def docxBytes(lines: Seq[String]): Array[Byte] = {
    val paras = lines.map(l =>
      s"<w:p ><w:r><w:t>${escapeXml(l)}</w:t></w:r></w:p>").mkString
    zip(
      "[Content_Types].xml" -> "<Types/>",
      "word/document.xml" ->
        s"""<w:document><w:body>$paras</w:body></w:document>""")
  }

  /** Minimal .pptx: one slide per line, one text shape each. */
  def pptxBytes(lines: Seq[String]): Array[Byte] = {
    val slides = lines.zipWithIndex.map { case (l, i) =>
      s"ppt/slides/slide${i + 1}.xml" ->
        s"""<p:sld><p:sp><a:t>${escapeXml(l)}</a:t></p:sp></p:sld>"""
    }
    zip(("[Content_Types].xml" -> "<Types/>") +: slides: _*)
  }

  /** Minimal .xlsx: one row per line, one inline-string cell per word. */
  def xlsxBytes(lines: Seq[String]): Array[Byte] = {
    val rows = lines.map { l =>
      val cells = l.split(" ").filter(_.nonEmpty).map(w =>
        s"""<c t="inlineStr"><is><t>${escapeXml(w)}</t></is></c>""").mkString
      s"<row r=\"1\">$cells</row>"
    }.mkString
    zip(
      "[Content_Types].xml" -> "<Types/>",
      "xl/worksheets/sheet1.xml" ->
        s"<worksheet><sheetData>$rows</sheetData></worksheet>")
  }

  private def escapePdf(s: String): String =
    s.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")

  /** Minimal single-page PDF: one Tj text-show per line. Content stream
    * is Flate-compressed when `flate` (exercises the inflate path).
    */
  def pdfBytes(lines: Seq[String], flate: Boolean = false): Array[Byte] = {
    val ops = "BT /F1 12 Tf " +
      lines.map(l => s"(${escapePdf(l)}) Tj T* ").mkString + "ET"
    val body: Array[Byte] =
      if (flate) {
        // end() in finally: an un-ended Deflater parks ~64 KB of native
        // zlib state on the Cleaner queue; at one per document the
        // backlog throttles every zip-touching query in the session.
        val d = new Deflater()
        try {
          d.setInput(ops.getBytes("ISO-8859-1")); d.finish()
          val buf = new Array[Byte](ops.length * 2 + 64)
          val n = d.deflate(buf)
          java.util.Arrays.copyOf(buf, n)
        } finally d.end()
      } else ops.getBytes("ISO-8859-1")
    val filter = if (flate) " /Filter /FlateDecode" else ""
    val head =
      s"""%PDF-1.4
         |1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj
         |2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj
         |3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj
         |4 0 obj << /Length ${body.length}$filter >> stream
         |""".stripMargin
    val tail = "\nendstream endobj\n%%EOF\n"
    val bos = new ByteArrayOutputStream()
    bos.write(head.getBytes("ISO-8859-1"))
    bos.write(body)
    bos.write(tail.getBytes("ISO-8859-1"))
    bos.toByteArray
  }

  /** Minimal real 24-bit BMP (BITMAPINFOHEADER, BI_RGB): every pixel
    * byte set to `px`, rows padded to 4 bytes — a decodable image whose
    * header any BMP reader (including `Multimodal.decodeDims`) parses.
    */
  def bmpBytes(w: Int, h: Int, px: Int): Array[Byte] = {
    val rowBytes = (w * 3 + 3) / 4 * 4
    val dataSize = rowBytes * h
    val bb = java.nio.ByteBuffer.allocate(54 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte)
    bb.putInt(54 + dataSize)       // file size
    bb.putInt(0)                   // reserved
    bb.putInt(54)                  // pixel data offset
    bb.putInt(40)                  // BITMAPINFOHEADER size
    bb.putInt(w)
    bb.putInt(h)
    bb.putShort(1)                 // planes
    bb.putShort(24)                // bits per pixel
    bb.putInt(0)                   // BI_RGB
    bb.putInt(dataSize)
    bb.putInt(2835).putInt(2835)   // 72 dpi
    bb.putInt(0).putInt(0)         // palette
    val row = Array.fill(rowBytes)(px.toByte)
    (0 until h).foreach(_ => bb.put(row))
    bb.array()
  }

  /** [[bmpBytes]] with an ANALYTIC gradient instead of a flat fill:
    * gray intensity `(seed + r*rowCoef + c*colCoef) % 256` at logical
    * row r (top-down), column c — real per-pixel image content whose
    * derived features (perceptual hashes) a SQL oracle can recompute
    * exactly from the closed form. BMP rows store bottom-up; the
    * writer flips so logical r=0 is the top row.
    */
  def bmpPatternBytes(w: Int, h: Int, seed: Int, rowCoef: Int,
      colCoef: Int): Array[Byte] = {
    val rowBytes = (w * 3 + 3) / 4 * 4
    val dataSize = rowBytes * h
    val bb = java.nio.ByteBuffer.allocate(54 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte)
    bb.putInt(54 + dataSize)
    bb.putInt(0)
    bb.putInt(54)
    bb.putInt(40)
    bb.putInt(w)
    bb.putInt(h)
    bb.putShort(1)
    bb.putShort(24)
    bb.putInt(0)                   // BI_RGB
    bb.putInt(dataSize)
    bb.putInt(2835).putInt(2835)
    bb.putInt(0).putInt(0)
    val row = new Array[Byte](rowBytes)
    (0 until h).foreach { br =>
      val r = h - 1 - br           // bottom-up storage
      var c = 0
      while (c < w) {
        val v = ((seed + r * rowCoef + c * colCoef) % 256).toByte
        row(c * 3) = v; row(c * 3 + 1) = v; row(c * 3 + 2) = v
        c += 1
      }
      bb.put(row)
    }
    bb.array()
  }

  /** Minimal real PNG: signature, IHDR (big-endian dims, bit depth 8),
    * one deflated IDAT whose scanlines are filter-0 rows of `px` bytes,
    * IEND — all chunks CRC32'd, so any PNG reader accepts it.
    * `colorType`: 0 = grayscale (1 ch), 2 = RGB (3), 6 = RGBA (4).
    */
  def pngBytes(w: Int, h: Int, colorType: Int, px: Int): Array[Byte] = {
    val channels = colorType match {
      case 0 => 1
      case 2 => 3
      case 6 => 4
      case other =>
        throw new IllegalArgumentException(s"unsupported color type $other")
    }
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(12 + data.length)
      bb.putInt(data.length)
      val typeAndData = typ.getBytes("US-ASCII") ++ data
      bb.put(typeAndData)
      val crc = new java.util.zip.CRC32()
      crc.update(typeAndData)
      bb.putInt(crc.getValue.toInt)
      bb.array()
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(w).putInt(h)
      .put(8.toByte).put(colorType.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte)   // deflate/adaptive/none
      .array()
    val raw = new Array[Byte](h * (1 + w * channels))
    (0 until h).foreach { r =>
      val base = r * (1 + w * channels)
      java.util.Arrays.fill(raw, base + 1, base + 1 + w * channels, px.toByte)
    }
    val d = new Deflater()
    d.setInput(raw); d.finish()
    val buf = new Array[Byte](raw.length + 64)
    val n = d.deflate(buf)
    d.end()
    val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte)
    sig ++ chunk("IHDR", ihdr) ++
      chunk("IDAT", java.util.Arrays.copyOf(buf, n)) ++
      chunk("IEND", Array.emptyByteArray)
  }

  /** Minimal real baseline JPEG: SOI, JFIF APP0, DQT, SOF0 carrying the
    * true dims/component count, DHT, SOS with a one-byte stub entropy
    * segment, EOI. The marker stream is spec-valid, so any header
    * parser (dimension sniffers, this engine's SOF scan) reads the real
    * dims without needing the (undecodable) pixel data. `channels`:
    * 1 = grayscale, 3 = YCbCr. `px` varies the payload bytes so equal
    * dims still produce distinct files.
    */
  def jpegBytes(w: Int, h: Int, channels: Int, px: Int): Array[Byte] = {
    require(channels == 1 || channels == 3,
      s"JPEG component count must be 1 or 3, got $channels")
    val out = new java.io.ByteArrayOutputStream()
    def marker(m: Int, payload: Array[Byte]): Unit = {
      out.write(0xff); out.write(m)
      val len = payload.length + 2
      out.write(len >> 8); out.write(len & 0xff)
      out.write(payload, 0, payload.length)
    }
    out.write(0xff); out.write(0xd8)                       // SOI
    marker(0xe0, Array[Byte](                              // APP0 / JFIF 1.1
      'J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0))
    marker(0xdb,                                           // DQT table 0
      (0 +: Seq.fill(64)(16)).map(_.toByte).toArray)
    val sof = java.nio.ByteBuffer.allocate(6 + 3 * channels)
    sof.put(8.toByte)                                      // precision
      .putShort(h.toShort).putShort(w.toShort)             // big-endian
      .put(channels.toByte)
    (1 to channels).foreach { c =>
      sof.put(c.toByte).put(0x11.toByte).put(0.toByte)     // id/sampling/qt
    }
    marker(0xc0, sof.array())                              // SOF0
    marker(0xc4,                                           // DHT: DC table 0,
      (0x00 +: (1 +: Seq.fill(15)(0)) :+ (px & 0x0f))      // 1 one-bit code
        .map(_.toByte).toArray)
    marker(0xda,                                           // SOS
      (channels.toByte +:
        (1 to channels).flatMap(c => Seq(c.toByte, 0x00.toByte)) ++:
        Seq[Byte](0, 63, 0)).toArray)
    out.write(px & 0x7f)                                   // stub entropy
    out.write(0xff); out.write(0xd9)                       // EOI
    out.toByteArray
  }

  /** Minimal real PCM WAV: RIFF/WAVE preamble, canonical 16-byte 'fmt '
    * chunk and a 'data' chunk of `nSamples` frames whose bytes derive
    * from `px` — a decodable file whose header any WAV reader (including
    * `Multimodal.decodeWavMeta`) parses.
    */
  def wavBytes(channels: Int, sampleRate: Int, bitsPerSample: Int,
      nSamples: Int, px: Int): Array[Byte] = {
    require(channels > 0 && sampleRate > 0 && nSamples >= 0 &&
      bitsPerSample % 8 == 0 && bitsPerSample > 0,
      s"bad WAV params: ch=$channels rate=$sampleRate bits=$bitsPerSample")
    val blockAlign = channels * bitsPerSample / 8
    val byteRate = sampleRate * blockAlign
    val dataSize = nSamples * blockAlign
    val bb = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII"))
    bb.putInt(36 + dataSize)               // RIFF payload size
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII"))
    bb.putInt(16)                          // canonical PCM fmt size
    bb.putShort(1)                         // audio format: PCM
    bb.putShort(channels.toShort)
    bb.putInt(sampleRate)
    bb.putInt(byteRate)
    bb.putShort(blockAlign.toShort)
    bb.putShort(bitsPerSample.toShort)
    bb.put("data".getBytes("US-ASCII"))
    bb.putInt(dataSize)
    (0 until dataSize).foreach(i => bb.put(((px + i) & 0xff).toByte))
    bb.array()
  }

  /** Minimal real MP4 (ISO-BMFF): `ftyp` box, then `moov` containing a
    * version-0 `mvhd` with the given movie timescale and duration in
    * timescale units, then an `mdat` stub whose bytes derive from `px`
    * — a parseable file whose header any BMFF reader (including
    * `Multimodal.decodeMp4Meta`) walks.
    */
  def mp4Bytes(timescale: Int, durationUnits: Int, px: Int): Array[Byte] = {
    require(timescale > 0 && durationUnits >= 0,
      s"bad MP4 params: timescale=$timescale duration=$durationUnits")
    def box(typ: String, payload: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + payload.length)
      bb.putInt(8 + payload.length)
      bb.put(typ.getBytes("US-ASCII"))
      bb.put(payload)
      bb.array()
    }
    val ftyp = box("ftyp",
      "isomisomiso2mp41".getBytes("US-ASCII"))   // brand + compat brands
    val mvhd = {
      val bb = java.nio.ByteBuffer.allocate(100)  // canonical v0 payload
      bb.putInt(0)                    // version 0 + flags
      bb.putInt(0).putInt(0)          // creation/modification time
      bb.putInt(timescale)
      bb.putInt(durationUnits)
      bb.putInt(0x00010000)           // rate 1.0
      bb.putShort(0x0100.toShort)     // volume 1.0
      // reserved(10), unity matrix(36), predefined(24), next track id
      bb.position(36)
      bb.putInt(0x00010000); bb.position(52); bb.putInt(0x00010000)
      bb.position(68); bb.putInt(0x40000000)
      bb.position(96); bb.putInt(2)
      box("mvhd", bb.array())
    }
    val mdat = box("mdat",
      (0 until 16).map(i => ((px + i) & 0xff).toByte).toArray)
    ftyp ++ box("moov", mvhd) ++ mdat
  }

  /** Minimal valid baseline TIFF in either byte order: header, one IFD
    * with the 9 baseline tags sorted ascending (ImageWidth/Length as
    * LONGs, BitsPerSample inline for <=2 samples or via an offset
    * array, Compression 1, Photometric, StripOffsets, SamplesPerPixel,
    * RowsPerStrip, StripByteCounts), then one uncompressed strip whose
    * bytes derive from `px` — a complete file any TIFF reader walks.
    */
  def tiffBytes(w: Int, h: Int, spp: Int, px: Int,
      bigEndian: Boolean = false): Array[Byte] = {
    require(w > 0 && h > 0 && spp > 0 && spp <= 4,
      s"bad TIFF params: ${w}x$h spp=$spp")
    val n = 9
    val ifdOff = 8
    val ifdSize = 2 + n * 12 + 4
    val bpsExtra = if (spp > 2) spp * 2 else 0
    val bpsOff = ifdOff + ifdSize
    val stripOff = bpsOff + bpsExtra
    val stripLen = w * h * spp
    val bb = java.nio.ByteBuffer.allocate(stripOff + stripLen).order(
      if (bigEndian) java.nio.ByteOrder.BIG_ENDIAN
      else java.nio.ByteOrder.LITTLE_ENDIAN)
    val bom = if (bigEndian) 'M' else 'I'
    bb.put(bom.toByte).put(bom.toByte)
    bb.putShort(42)
    bb.putInt(ifdOff)
    bb.putShort(n.toShort)
    // SHORT values are left-justified in the 4-byte field (first two
    // bytes in file order), per the TIFF spec.
    def entry(tag: Int, typ: Int, count: Int, value: Int): Unit = {
      bb.putShort(tag.toShort).putShort(typ.toShort).putInt(count)
      if (typ == 3) { bb.putShort(value.toShort); bb.putShort(0) }
      else bb.putInt(value)
    }
    entry(256, 4, 1, w)
    entry(257, 4, 1, h)
    if (spp <= 2) {                       // inline: spp SHORTs fit
      bb.putShort(258).putShort(3).putInt(spp)
      bb.putShort(8); bb.putShort(if (spp == 2) 8 else 0)
    } else {                              // offset form: u32 to the array
      bb.putShort(258).putShort(3).putInt(spp); bb.putInt(bpsOff)
    }
    entry(259, 3, 1, 1)                   // no compression
    entry(262, 3, 1, if (spp >= 3) 2 else 1)
    entry(273, 4, 1, stripOff)
    entry(277, 3, 1, spp)
    entry(278, 4, 1, h)
    entry(279, 4, 1, stripLen)
    bb.putInt(0)                          // no next IFD
    if (spp > 2) (0 until spp).foreach(_ => bb.putShort(8))
    (0 until stripLen).foreach(i => bb.put(((px + i) & 0xff).toByte))
    bb.array()
  }

  /** Fully valid GIF89a: logical screen descriptor with the given
    * dims, a 4-entry global color table derived from `px`, and one
    * image whose pixel stream (indices `(px+i) % 4`) is LZW-encoded
    * with a clear code before every pixel — the classic
    * "uncompressed GIF" trick that keeps every code at the initial
    * 3-bit width, so the stream stays spec-valid without a dictionary.
    */
  def gifBytes(w: Int, h: Int, px: Int): Array[Byte] = {
    require(w > 0 && h > 0 && w <= 0xffff && h <= 0xffff,
      s"bad GIF dims: ${w}x$h")
    val out = new ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    le16(w); le16(h)
    out.write(0x91)   // global table present, color res 2, size bits 1 (4 entries)
    out.write(0)      // background color index
    out.write(0)      // pixel aspect ratio
    for (i <- 0 until 4; c <- 0 until 3)
      out.write((px + i * 40 + c * 10) & 0xff)
    out.write(0x2c)   // image descriptor
    le16(0); le16(0); le16(w); le16(h)
    out.write(0)      // no local table, not interlaced
    out.write(2)      // LZW minimum code size -> clear=4, end=5, width 3
    val data = new ByteArrayOutputStream()
    var acc = 0L
    var nbits = 0
    def putCode(c: Int): Unit = {
      acc |= c.toLong << nbits
      nbits += 3
      while (nbits >= 8) { data.write((acc & 0xff).toInt); acc >>= 8; nbits -= 8 }
    }
    (0 until w * h).foreach { i => putCode(4); putCode((px + i) % 4) }
    putCode(5)
    if (nbits > 0) data.write((acc & 0xff).toInt)
    val lzw = data.toByteArray
    var off = 0
    while (off < lzw.length) {   // 255-byte data sub-blocks
      val n = math.min(255, lzw.length - off)
      out.write(n); out.write(lzw, off, n); off += n
    }
    out.write(0)      // block terminator
    out.write(0x3b)   // trailer
    out.toByteArray
  }

  /** WebP (RIFF/WEBP) with a VP8L chunk: the 0x2F signature byte, the
    * 14-bit width-1/height-1 + alpha-hint header u32, then a short
    * `px`-derived stand-in for the entropy-coded stream (the analogue
    * of mp4Bytes' `mdat` stub — headers real, pixel data opaque).
    */
  def webpBytes(w: Int, h: Int, alpha: Boolean, px: Int): Array[Byte] = {
    require(w > 0 && h > 0 && w <= (1 << 14) && h <= (1 << 14),
      s"bad WebP dims: ${w}x$h")
    val header = (w - 1) | ((h - 1) << 14) | ((if (alpha) 1 else 0) << 28)
    val chunk = java.nio.ByteBuffer.allocate(13)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    chunk.put(0x2f.toByte).putInt(header)
    (0 until 8).foreach(i => chunk.put(((px + i) & 0xff).toByte))
    webpContainer("VP8L", chunk.array())
  }

  /** WebP with a lossy `VP8 ` chunk: 3-byte frame tag, the 9D 01 2A
    * keyframe start code, then the 14-bit dims in little-endian u16s.
    */
  def webpLossyBytes(w: Int, h: Int, px: Int): Array[Byte] = {
    require(w > 0 && h > 0 && w < (1 << 14) && h < (1 << 14),
      s"bad WebP dims: ${w}x$h")
    val chunk = java.nio.ByteBuffer.allocate(18)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    chunk.put(0.toByte).put(0.toByte).put(0.toByte)   // frame tag
    chunk.put(0x9d.toByte).put(0x01.toByte).put(0x2a.toByte)
    chunk.putShort(w.toShort).putShort(h.toShort)
    (0 until 8).foreach(i => chunk.put(((px + i) & 0xff).toByte))
    webpContainer("VP8 ", chunk.array())
  }

  private def webpContainer(fourcc: String,
      chunk: Array[Byte]): Array[Byte] = {
    val padded = if (chunk.length % 2 == 1) chunk :+ 0.toByte else chunk
    val bb = java.nio.ByteBuffer.allocate(20 + padded.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII"))
    bb.putInt(12 + padded.length)   // 'WEBP' + chunk header + payload
    bb.put("WEBP".getBytes("US-ASCII"))
    bb.put(fourcc.getBytes("US-ASCII"))
    bb.putInt(chunk.length)         // unpadded size, RIFF convention
    bb.put(padded)
    bb.array()
  }

  /** Real MP4 with a full sample table: `ftyp`, then `moov` holding a
    * version-0 `mvhd` plus a `trak > mdia > (mdhd + minf > stbl)` chain
    * whose `stts` carries the per-sample durations RUN-LENGTH encoded
    * (adjacent equal durations collapse into one entry, as every real
    * muxer writes them) and whose `stsz` carries one explicit u32 per
    * sample (`sample_size` field 0). Movie and media timescale are both
    * `timescale`; mvhd/mdhd duration is the duration sum. The `mdat`
    * stub's bytes derive from `px`. This is the fixture for
    * `Multimodal.sampleFrames`' stts/stsz walk — a file any ISO-BMFF
    * demuxer would accept.
    */
  def mp4SampledBytes(timescale: Int, durations: Array[Int],
      sizes: Array[Int], px: Int): Array[Byte] = {
    require(timescale > 0 && durations.length == sizes.length &&
      durations.forall(_ > 0) && sizes.forall(_ >= 0),
      s"bad MP4 sample params: ts=$timescale n=${durations.length}")
    def box(typ: String, payload: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + payload.length)
      bb.putInt(8 + payload.length)
      bb.put(typ.getBytes("US-ASCII"))
      bb.put(payload)
      bb.array()
    }
    val totalUnits = durations.map(_.toLong).sum
    require(totalUnits <= Int.MaxValue, "duration sum overflows v0 mvhd")
    val ftyp = box("ftyp", "isomisomiso2mp41".getBytes("US-ASCII"))
    val mvhd = {
      val bb = java.nio.ByteBuffer.allocate(100)
      bb.putInt(0)                    // version 0 + flags
      bb.putInt(0).putInt(0)          // creation/modification time
      bb.putInt(timescale)
      bb.putInt(totalUnits.toInt)
      bb.putInt(0x00010000)           // rate 1.0
      bb.putShort(0x0100.toShort)     // volume 1.0
      bb.position(36)
      bb.putInt(0x00010000); bb.position(52); bb.putInt(0x00010000)
      bb.position(68); bb.putInt(0x40000000)
      bb.position(96); bb.putInt(2)
      box("mvhd", bb.array())
    }
    val mdhd = {
      val bb = java.nio.ByteBuffer.allocate(24)  // canonical v0 payload
      bb.putInt(0)                    // version 0 + flags
      bb.putInt(0).putInt(0)          // creation/modification time
      bb.putInt(timescale)
      bb.putInt(totalUnits.toInt)
      bb.putShort(0x55c4.toShort)     // language 'und'
      bb.putShort(0)                  // pre_defined
      box("mdhd", bb.array())
    }
    val stts = {
      // RLE: (count, delta) runs over adjacent equal durations.
      val runs = durations.foldLeft(List.empty[(Int, Int)]) {
        case ((c, d) :: tail, dur) if d == dur => (c + 1, d) :: tail
        case (acc, dur) => (1, dur) :: acc
      }.reverse
      val bb = java.nio.ByteBuffer.allocate(8 + 8 * runs.length)
      bb.putInt(0)                    // version 0 + flags
      bb.putInt(runs.length)
      runs.foreach { case (c, d) => bb.putInt(c); bb.putInt(d) }
      box("stts", bb.array())
    }
    val stsz = {
      val bb = java.nio.ByteBuffer.allocate(12 + 4 * sizes.length)
      bb.putInt(0)                    // version 0 + flags
      bb.putInt(0)                    // sample_size 0 = per-sample table
      bb.putInt(sizes.length)
      sizes.foreach(bb.putInt)
      box("stsz", bb.array())
    }
    val trak = box("trak", box("mdia",
      mdhd ++ box("minf", box("stbl", stts ++ stsz))))
    val mdat = box("mdat",
      (0 until 16).map(i => ((px + i) & 0xff).toByte).toArray)
    ftyp ++ box("moov", mvhd ++ trak) ++ mdat
  }

  val docxUdf: UserDefinedFunction = udf((ls: Seq[String]) => docxBytes(ls))
  val pptxUdf: UserDefinedFunction = udf((ls: Seq[String]) => pptxBytes(ls))
  val xlsxUdf: UserDefinedFunction = udf((ls: Seq[String]) => xlsxBytes(ls))
  val pdfUdf: UserDefinedFunction =
    udf((ls: Seq[String], flate: Boolean) => pdfBytes(ls, flate))
  val bmpUdf: UserDefinedFunction =
    udf((w: Int, h: Int, px: Int) => bmpBytes(w, h, px))
  val bmpPatternUdf: UserDefinedFunction =
    udf((w: Int, h: Int, seed: Int, rc: Int, cc: Int) =>
      bmpPatternBytes(w, h, seed, rc, cc))
  val pngUdf: UserDefinedFunction =
    udf((w: Int, h: Int, colorType: Int, px: Int) =>
      pngBytes(w, h, colorType, px))
  val jpegUdf: UserDefinedFunction =
    udf((w: Int, h: Int, channels: Int, px: Int) =>
      jpegBytes(w, h, channels, px))
  val wavUdf: UserDefinedFunction =
    udf((ch: Int, rate: Int, bits: Int, n: Int, px: Int) =>
      wavBytes(ch, rate, bits, n, px))
  val mp4Udf: UserDefinedFunction =
    udf((ts: Int, dur: Int, px: Int) => mp4Bytes(ts, dur, px))
  val tiffUdf: UserDefinedFunction =
    udf((w: Int, h: Int, spp: Int, px: Int, be: Boolean) =>
      tiffBytes(w, h, spp, px, be))
  val gifUdf: UserDefinedFunction =
    udf((w: Int, h: Int, px: Int) => gifBytes(w, h, px))
  val webpUdf: UserDefinedFunction =
    udf((w: Int, h: Int, alpha: Boolean, px: Int) =>
      webpBytes(w, h, alpha, px))
}
