package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}

/** One decoded-media row (top-level for Catalyst encoders). */
final case class MediaRow(doc_id: Long, payload: Array[Byte],
    media_type: String)

final case class ImageFeatureRow(doc_id: Long, width: Int, height: Int,
    channels: Int, resized_w: Int, resized_h: Int, fingerprint: String)

final case class FrameRow(doc_id: Long, frame_idx: Int, offset_ms: Long,
    frame_bytes: Int)

final case class AudioFeatureRow(doc_id: Long, channels: Int,
    sample_rate: Int, bits_per_sample: Int, duration_ms: Long,
    fingerprint: String)

final case class PixelStatsRow(doc_id: Long, n_pixels: Long,
    sum_intensity: Long, mean_milli: Long, min_v: Long, max_v: Long)

final case class PixelHistRow(doc_id: Long, bin: Long, cnt: Long)

final case class VideoFeatureRow(doc_id: Long, timescale: Int,
    duration_ms: Long, fingerprint: String)

/** Multimodal column plumbing: image/audio/video travel as opaque
  * `binary` columns with typed metadata, and the compute-heavy steps
  * (decode, feature-extract, resize, frame-sample) run as
  * `mapPartitions` stages — per-partition batches, codec state reused
  * across a partition, no shuffle.
  *
  * Decode dispatches on `media_type`: `image/bmp`, `image/png`,
  * `image/jpeg`, `image/gif`, `image/webp`, `audio/wav` and
  * `video/mp4` are REAL pure-JDK decoders (BITMAPINFOHEADER / IHDR /
  * SOF-marker / logical-screen-descriptor / RIFF-VP8 / RIFF-chunk /
  * ISO-BMFF-box parse — width, height, channels, sample rate and
  * duration come from actual file bytes). Other media types fall to a clearly-marked deterministic
  * stub (dims derived from the payload hash; no compressed-codec
  * library ships with this environment). Adding a real codec for
  * another format changes ONLY the dispatch — the schema,
  * partitioning, batch shape and the resize / frame-sample arithmetic
  * around it are shared and tested.
  */
object Multimodal {

  private def md5Hex(bytes: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(bytes).map(b => f"$b%02x").mkString

  /** 60-bit payload hash: first 15 md5 hex digits — the binary twin of
    * `HashFunctions.stableHash64`, reproducible as SQL md5 over the
    * same bytes.
    */
  def payloadHash(bytes: Array[Byte]): Long =
    java.lang.Long.parseLong(md5Hex(bytes).substring(0, 15), 16)

  /** STUB decode — deterministic fake dimensions from the payload hash
    * (a real build calls an image codec here; javax.imageio is absent
    * from the runtime image). Width 64..576, height 64..448, RGB.
    */
  def stubDims(payload: Array[Byte]): (Int, Int, Int) = {
    val w = 64 + payloadHash(payload) % 513
    val h = 64 + payloadHash("h:".getBytes("UTF-8") ++ payload) % 385
    (w.toInt, h.toInt, 3)
  }

  /** REAL BMP decode (pure JDK): parse the BITMAPINFOHEADER — magic
    * 'BM', width/height as little-endian i32 at offsets 18/22 (negative
    * height = top-down row order), bits-per-pixel at 28. Returns None
    * for bytes that are not a plausible BMP.
    */
  def decodeBmpDims(payload: Array[Byte]): Option[(Int, Int, Int)] =
    if (payload != null && payload.length >= 54 &&
        payload(0) == 'B'.toByte && payload(1) == 'M'.toByte) {
      val bb = java.nio.ByteBuffer.wrap(payload)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val w = bb.getInt(18)
      val h = math.abs(bb.getInt(22))
      val bpp = bb.getShort(28) & 0xffff
      if (w > 0 && h > 0 && bpp >= 8 && bpp % 8 == 0)
        Some((w, h, bpp / 8))
      else None
    } else None

  /** 8x8 AVERAGE-HASH (aHash) over an uncompressed 24bpp BMP — the
    * perceptual fingerprint for image-level near-dup dedup, computed
    * from REAL pixel data (blue channel as intensity; the builders
    * write gray, all channels equal). The image is divided into an 8x8
    * cell grid (dims must divide evenly); bit `cr*8+cc` is set iff the
    * cell's pixel sum, scaled by 64, exceeds the whole image's pixel
    * sum — integer arithmetic throughout, so the comparison is EXACT
    * and a SQL oracle reproduces it bit-for-bit (float means would
    * tie-break on summation order). Handles bottom-up and top-down row
    * storage and 4-byte row padding. None for non-BMP / non-24bpp /
    * non-divisible dims.
    */
  def averageHash(payload: Array[Byte]): Option[Long] =
    decodeBmpDims(payload) match {
      case Some((w, h, 3)) if w % 8 == 0 && h % 8 == 0 &&
          payload.length >= 54 =>
        val bb = java.nio.ByteBuffer.wrap(payload)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        val bpp = bb.getShort(28) & 0xffff
        val offset = bb.getInt(10)
        val topDown = bb.getInt(22) < 0
        // Untrusted-header guard (same class as the WAV chunk walker):
        // a negative/overflowing pixel-data offset or a width whose row
        // stride overflows Int must yield None, not an
        // ArrayIndexOutOfBounds task crash — all bounds math in Long,
        // and offsets inside the 54-byte header are rejected.
        val rowBytesL = (w.toLong * 3 + 3) / 4 * 4
        val rowBytes = rowBytesL.toInt
        if (bpp != 24 || offset < 54 || rowBytesL != rowBytes.toLong ||
          offset.toLong + rowBytesL * h.toLong > payload.length) None
        else {
          val cellW = w / 8
          val cellH = h / 8
          val sums = new Array[Long](64)
          var total = 0L
          var r = 0
          while (r < h) {
            val storedRow = if (topDown) r else h - 1 - r
            val base = offset + storedRow * rowBytes
            val cr = r / cellH
            var c = 0
            while (c < w) {
              val v = (payload(base + c * 3) & 0xff).toLong
              sums(cr * 8 + c / cellW) += v
              total += v
              c += 1
            }
            r += 1
          }
          var hash = 0L
          var i = 0
          while (i < 64) {
            if (sums(i) * 64 > total) hash |= (1L << i)
            i += 1
          }
          Some(hash)
        }
      case _ => None
    }

  /** FULL-RASTER pixel statistics over an uncompressed 24bpp BMP —
    * the decode-and-aggregate step a vision-data pipeline runs per
    * image (brightness gates, dead-image detection): pixel count,
    * intensity sum (blue channel; the builders write gray), min and
    * max. Exact integers, so the oracle recomputes them in closed
    * form from the builder's analytic gradient — the Spark side reads
    * ACTUAL file bytes, making this a true end-to-end decode check.
    * Same untrusted-header bounds guards as [[averageHash]]; None for
    * non-BMP / non-24bpp / truncated payloads.
    */
  def pixelStats(payload: Array[Byte]): Option[(Long, Long, Int, Int)] =
    decodeBmpDims(payload) match {
      case Some((w, h, 3)) if payload.length >= 54 =>
        val bb = java.nio.ByteBuffer.wrap(payload)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        val bpp = bb.getShort(28) & 0xffff
        val offset = bb.getInt(10)
        val topDown = bb.getInt(22) < 0
        val rowBytesL = (w.toLong * 3 + 3) / 4 * 4
        val rowBytes = rowBytesL.toInt
        if (bpp != 24 || offset < 54 || rowBytesL != rowBytes.toLong ||
          offset.toLong + rowBytesL * h.toLong > payload.length) None
        else {
          var sum = 0L
          var minV = 255
          var maxV = 0
          var r = 0
          while (r < h) {
            val storedRow = if (topDown) r else h - 1 - r
            val base = offset + storedRow * rowBytes
            var c = 0
            while (c < w) {
              val v = payload(base + c * 3) & 0xff
              sum += v
              if (v < minV) minV = v
              if (v > maxV) maxV = v
              c += 1
            }
            r += 1
          }
          Some((w.toLong * h, sum, minV, maxV))
        }
      case _ => None
    }

  /** [[pixelStats]] as a mapPartitions stage; undecodable payloads
    * emit nothing (the decoders' zero-dims sentinel, 1->0 form).
    */
  def imagePixelStats(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { m =>
        pixelStats(m.payload).map { case (n, sum, minV, maxV) =>
          PixelStatsRow(m.doc_id, n, sum, sum * 1000L / n,
            minV.toLong, maxV.toLong)
        }
      }
    }.toDF()
  }

  /** Per-image intensity HISTOGRAM over the blue-channel raster (the
    * same bottom-up/padded walk as [[pixelStats]]): counts per
    * `256/bins`-wide intensity bucket — the distribution the entropy
    * gate and contrast checks read. Pure integers; undecodable
    * payloads emit nothing.
    */
  def pixelHistogram(payload: Array[Byte], bins: Int): Option[Array[Long]] = {
    require(bins >= 2 && 256 % bins == 0,
      s"bins must be >= 2 and divide 256, got $bins - a non-divisor " +
        "would index pixel 255 past the last bucket")
    decodeBmpDims(payload) match {
      case Some((w, h, 3)) if payload.length >= 54 =>
        val bb = java.nio.ByteBuffer.wrap(payload)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        val bpp = bb.getShort(28) & 0xffff
        val offset = bb.getInt(10)
        val topDown = bb.getInt(22) < 0
        val rowBytesL = (w.toLong * 3 + 3) / 4 * 4
        val rowBytes = rowBytesL.toInt
        if (bpp != 24 || offset < 54 || rowBytesL != rowBytes.toLong ||
          offset.toLong + rowBytesL * h.toLong > payload.length) None
        else {
          val width = 256 / bins
          val hist = new Array[Long](bins)
          var r = 0
          while (r < h) {
            val storedRow = if (topDown) r else h - 1 - r
            val base = offset + storedRow * rowBytes
            var c = 0
            while (c < w) {
              hist((payload(base + c * 3) & 0xff) / width) += 1
              c += 1
            }
            r += 1
          }
          Some(hist)
        }
      case _ => None
    }
  }

  /** [[pixelHistogram]] as a mapPartitions stage emitting sparse
    * (doc_id, bin, cnt) rows (empty bins omitted).
    */
  def imagePixelHistogram(media: Dataset[MediaRow],
      bins: Int): DataFrame = {
    require(bins >= 2 && 256 % bins == 0,
      s"bins must divide 256, got $bins")
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { m =>
        pixelHistogram(m.payload, bins).iterator.flatMap { hist =>
          hist.iterator.zipWithIndex.collect {
            case (c, b) if c > 0 => PixelHistRow(m.doc_id, b.toLong, c)
          }
        }
      }
    }.toDF()
  }

  /** REAL PNG header decode (pure JDK): verify the 8-byte signature and
    * that the first chunk is IHDR, then read big-endian width/height at
    * offsets 16/20 and bit-depth/color-type at 24/25. Channel count
    * comes from the color type (grayscale 1, RGB 3, palette 1,
    * gray+alpha 2, RGBA 4). Returns None for bytes that are not a
    * plausible PNG — header-only, no pixel inflate needed for dims.
    */
  def decodePngDims(payload: Array[Byte]): Option[(Int, Int, Int)] = {
    val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte)
    if (payload != null && payload.length >= 26 &&
        payload.take(8).sameElements(sig) &&
        new String(payload, 12, 4, "US-ASCII") == "IHDR") {
      val bb = java.nio.ByteBuffer.wrap(payload)   // PNG ints are BE
      val w = bb.getInt(16)
      val h = bb.getInt(20)
      val bitDepth = payload(24) & 0xff
      val channels = (payload(25) & 0xff) match {
        case 0 => 1   // grayscale
        case 2 => 3   // RGB
        case 3 => 1   // palette-indexed
        case 4 => 2   // grayscale + alpha
        case 6 => 4   // RGBA
        case _ => 0
      }
      if (w > 0 && h > 0 && channels > 0 &&
          Set(1, 2, 4, 8, 16).contains(bitDepth))
        Some((w, h, channels))
      else None
    } else None
  }

  /** REAL JPEG header decode (pure JDK): walk the marker stream from
    * SOI and read the first frame header — any SOF0-SOF15 marker except
    * DHT (C4), JPG (C8) and DAC (CC) — for big-endian height/width and
    * the component count (1 = grayscale, 3 = YCbCr, 4 = CMYK).
    * Standalone markers (RST, TEM) and 0xFF fill bytes are skipped per
    * spec; segments are skipped by their declared length. Returns None
    * for bytes that are not a plausible JPEG, or when SOS/EOI arrives
    * before any frame header. Header-only — dims never need the
    * entropy-coded data.
    */
  def decodeJpegDims(payload: Array[Byte]): Option[(Int, Int, Int)] = {
    if (payload == null || payload.length < 4 ||
        (payload(0) & 0xff) != 0xff || (payload(1) & 0xff) != 0xd8)
      return None
    var i = 2
    while (i + 1 < payload.length) {
      if ((payload(i) & 0xff) != 0xff) return None
      // 0xFF fill bytes may pad before the marker code.
      while (i + 1 < payload.length && (payload(i + 1) & 0xff) == 0xff)
        i += 1
      if (i + 1 >= payload.length) return None
      val m = payload(i + 1) & 0xff
      if (m == 0xd9 || m == 0xda) return None   // EOI/SOS before any SOF
      if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) i += 2   // standalone
      else {
        if (i + 3 >= payload.length) return None
        val len = ((payload(i + 2) & 0xff) << 8) | (payload(i + 3) & 0xff)
        if (len < 2 || i + 2 + len > payload.length) return None
        val isSof = m >= 0xc0 && m <= 0xcf &&
          m != 0xc4 && m != 0xc8 && m != 0xcc
        if (isSof) {
          if (len < 8) return None
          val h = ((payload(i + 5) & 0xff) << 8) | (payload(i + 6) & 0xff)
          val w = ((payload(i + 7) & 0xff) << 8) | (payload(i + 8) & 0xff)
          val c = payload(i + 9) & 0xff
          return if (w > 0 && h > 0 && c > 0) Some((w, h, c)) else None
        }
        i += 2 + len
      }
    }
    None
  }

  /** REAL GIF header decode (pure JDK): verify the GIF87a/GIF89a
    * signature, then read the logical-screen-descriptor dimensions —
    * little-endian u16 at offsets 6/8. GIF pixels are palette indices
    * into an RGB color table, so channels report as 3. Returns None
    * for bytes that are not a plausible GIF.
    */
  def decodeGifDims(payload: Array[Byte]): Option[(Int, Int, Int)] =
    if (payload != null && payload.length >= 13 && {
        val sig = new String(payload, 0, 6, "US-ASCII")
        sig == "GIF87a" || sig == "GIF89a"
      }) {
      val bb = java.nio.ByteBuffer.wrap(payload)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val w = bb.getShort(6) & 0xffff
      val h = bb.getShort(8) & 0xffff
      if (w > 0 && h > 0) Some((w, h, 3)) else None
    } else None

  /** REAL WebP header decode (pure JDK): verify the RIFF/WEBP
    * preamble, then dispatch on the first chunk fourcc —
    *   - `VP8 ` (lossy): 3-byte frame tag, the 9D 01 2A start code,
    *     then 14-bit width/height in little-endian u16s;
    *   - `VP8L` (lossless): the 0x2F signature byte, then width-1 /
    *     height-1 as 14-bit fields of a little-endian u32 with the
    *     alpha-hint at bit 28 (channels 4 when set);
    *   - `VP8X` (extended): canvas width-1 / height-1 as little-endian
    *     u24s at payload offsets 4/7, alpha flag 0x10 in the first
    *     flags byte.
    * Returns None for bytes that are not a plausible WebP. Header-only
    * — no entropy-coded image data is touched.
    */
  def decodeWebpDims(payload: Array[Byte]): Option[(Int, Int, Int)] = {
    if (payload == null || payload.length < 30) return None
    def ascii(off: Int, n: Int): String =
      new String(payload, off, n, "US-ASCII")
    if (ascii(0, 4) != "RIFF" || ascii(8, 4) != "WEBP") return None
    val bb = java.nio.ByteBuffer.wrap(payload)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val o = 20   // first chunk payload (fourcc at 12, size at 16)
    ascii(12, 4) match {
      case "VP8 " =>
        if (payload.length < o + 10 || (payload(o + 3) & 0xff) != 0x9d ||
            (payload(o + 4) & 0xff) != 0x01 ||
            (payload(o + 5) & 0xff) != 0x2a) None
        else {
          val w = bb.getShort(o + 6) & 0x3fff
          val h = bb.getShort(o + 8) & 0x3fff
          if (w > 0 && h > 0) Some((w, h, 3)) else None
        }
      case "VP8L" =>
        if (payload.length < o + 5 || (payload(o) & 0xff) != 0x2f) None
        else {
          val bits = bb.getInt(o + 1)
          val w = (bits & 0x3fff) + 1
          val h = ((bits >>> 14) & 0x3fff) + 1
          Some((w, h, if (((bits >>> 28) & 1) == 1) 4 else 3))
        }
      case "VP8X" =>
        if (payload.length < o + 10) None
        else {
          def u24(off: Int): Int = (payload(off) & 0xff) |
            ((payload(off + 1) & 0xff) << 8) |
            ((payload(off + 2) & 0xff) << 16)
          val alpha = (payload(o) & 0x10) != 0
          Some((u24(o + 4) + 1, u24(o + 7) + 1, if (alpha) 4 else 3))
        }
      case _ => None
    }
  }

  /** REAL TIFF header decode (pure JDK): read the byte-order mark
    * (`II` little- or `MM` big-endian) and magic 42, follow the header
    * offset to the first IFD, and walk its 12-byte entries for tags
    * 256 (ImageWidth), 257 (ImageLength) and 277 (SamplesPerPixel,
    * TIFF default 1 when absent). SHORT(3) and LONG(4) value types are
    * honored — a SHORT inline value sits in the HIGH half-word reading
    * of the value field per the file's endianness. Returns None for
    * bytes that are not a plausible TIFF. Header-only — strip/pixel
    * data is never touched.
    */
  def decodeTiffDims(payload: Array[Byte]): Option[(Int, Int, Int)] = {
    if (payload == null || payload.length < 8) return None
    val le =
      if (payload(0) == 'I'.toByte && payload(1) == 'I'.toByte) true
      else if (payload(0) == 'M'.toByte && payload(1) == 'M'.toByte) false
      else return None
    val bb = java.nio.ByteBuffer.wrap(payload).order(
      if (le) java.nio.ByteOrder.LITTLE_ENDIAN
      else java.nio.ByteOrder.BIG_ENDIAN)
    if ((bb.getShort(2) & 0xffff) != 42) return None
    val ifd = bb.getInt(4)
    if (ifd < 8 || ifd + 2 > payload.length) return None
    val n = bb.getShort(ifd) & 0xffff
    if (ifd + 2 + 12 * n > payload.length) return None
    var (w, h, spp) = (0, 0, 1)
    var i = 0
    while (i < n) {
      val off = ifd + 2 + 12 * i
      val tag = bb.getShort(off) & 0xffff
      val typ = bb.getShort(off + 2) & 0xffff
      // Inline value: LONG fills the u32; SHORT occupies the FIRST two
      // bytes of the value field (so the low address in both orders).
      val v =
        if (typ == 3) bb.getShort(off + 8) & 0xffff
        else if (typ == 4) bb.getInt(off + 8)
        else -1
      if (v >= 0) tag match {
        case 256 => w = v
        case 257 => h = v
        case 277 => spp = v
        case _ => ()
      }
      i += 1
    }
    if (w > 0 && h > 0 && spp > 0) Some((w, h, spp)) else None
  }

  /** REAL WAV (RIFF) header decode (pure JDK): verify the
    * 'RIFF'<size>'WAVE' preamble, then walk the chunk list — 'fmt ' for
    * channels / sample rate / bits per sample, 'data' for the payload
    * byte length. Duration is derived from the data size over the fmt
    * chunk's byte rate (exact integer ms). Chunks are skipped by their
    * declared size with RIFF's odd-size pad byte honored. Returns None
    * for bytes that are not a plausible WAV or that end before both
    * chunks arrive. Header-only — the sample data itself is never
    * interpreted.
    */
  def decodeWavMeta(payload: Array[Byte]): Option[(Int, Int, Int, Long)] = {
    def tag(off: Int): String =
      if (payload.length >= off + 4) new String(payload, off, 4, "US-ASCII")
      else ""
    if (payload == null || payload.length < 44 ||
        tag(0) != "RIFF" || tag(8) != "WAVE") return None
    val bb = java.nio.ByteBuffer.wrap(payload)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var i = 12
    var fmt: Option[(Int, Int, Int, Int)] = None   // ch, rate, bits, byteRate
    var dataSize: Option[Long] = None
    while (i + 8 <= payload.length && (fmt.isEmpty || dataSize.isEmpty)) {
      val id = tag(i)
      val size = bb.getInt(i + 4).toLong & 0xffffffffL
      if (id == "fmt " && size >= 16 && i + 8 + 16 <= payload.length) {
        val ch = bb.getShort(i + 10) & 0xffff
        val rate = bb.getInt(i + 12)
        val byteRate = bb.getInt(i + 16)
        val bits = bb.getShort(i + 22) & 0xffff
        if (ch > 0 && rate > 0 && bits > 0 && byteRate > 0)
          fmt = Some((ch, rate, bits, byteRate))
        else return None
      } else if (id == "data") {
        dataSize = Some(size)
      }
      if (size > Int.MaxValue - 9) return None
      i += 8 + size.toInt + (size.toInt & 1)   // odd chunks carry a pad byte
    }
    for ((ch, rate, bits, byteRate) <- fmt; ds <- dataSize)
      yield (ch, rate, bits, ds * 1000L / byteRate)
  }

  /** One window of PCM loudness statistics ([[pcmWindowStats]]). */
  final case class PcmWindow(win: Int, n: Int, sum_sq: Long, peak: Int)

  /** REAL PCM sample analysis over a 16-bit mono WAV: per window of
    * `windowSamples` samples, the count, sum of squared amplitudes and
    * peak |amplitude| — the loudness/silence profile an audio ingest
    * gates on (silence trim, clipping detection), computed from the
    * ACTUAL little-endian sample bytes. All-integer outputs (sum of
    * squares instead of RMS) so a SQL oracle matches bit-for-bit; the
    * final short window is emitted with its true `n`. None for
    * non-WAV, non-PCM-16, or non-mono payloads.
    */
  def pcmWindowStats(payload: Array[Byte],
      windowSamples: Int): Option[Seq[PcmWindow]] = {
    require(windowSamples > 0, "windowSamples must be positive")
    decodeWavMeta(payload) match {
      case Some((1, _, 16, _)) =>
        // Find the data chunk again (decodeWavMeta validated shape).
        val bb = java.nio.ByteBuffer.wrap(payload)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        var i = 12
        var dataOff = -1
        var dataLen = 0
        var malformed = false
        while (i + 8 <= payload.length && dataOff < 0 && !malformed) {
          val id = new String(payload, i, 4, "US-ASCII")
          val size = bb.getInt(i + 4)
          if (size < 0) malformed = true   // would walk backwards forever
          else if (id == "data") { dataOff = i + 8; dataLen = size }
          else i += 8 + size + (size & 1)
        }
        if (malformed || dataOff < 0 || dataLen < 0 ||
            dataOff + dataLen > payload.length) None
        else {
          val nSamples = dataLen / 2
          val out = Seq.newBuilder[PcmWindow]
          var w = 0
          while (w * windowSamples < nSamples) {
            val start = w * windowSamples
            val end = math.min(start + windowSamples, nSamples)
            var sumSq = 0L
            var peak = 0
            var k = start
            while (k < end) {
              val s = bb.getShort(dataOff + 2 * k).toInt
              sumSq += s.toLong * s
              if (math.abs(s) > peak) peak = math.abs(s)
              k += 1
            }
            out += PcmWindow(w, end - start, sumSq, peak)
            w += 1
          }
          Some(out.result())
        }
      case _ => None
    }
  }

  /** REAL MP4 header decode (pure JDK): walk the top-level ISO-BMFF box
    * list to `moov`, then its children to `mvhd`, and read the movie
    * timescale (units/second) and duration (units) — big-endian u32 at
    * payload offsets 12/16 for version 0, u32/u64 at 20/24 for
    * version 1. Duration in exact integer ms is `units * 1000 /
    * timescale`. Returns None for bytes that are not a plausible MP4
    * (no `ftyp` leading box, no moov/mvhd, or a box overrunning the
    * payload). Header-only — no sample data is touched.
    */
  def decodeMp4Meta(payload: Array[Byte]): Option[(Int, Long)] = {
    if (payload == null || payload.length < 16) return None
    val bb = java.nio.ByteBuffer.wrap(payload)   // ISO-BMFF ints are BE
    def boxType(off: Int): String =
      new String(payload, off + 4, 4, "US-ASCII")
    def u32(off: Int): Long = bb.getInt(off).toLong & 0xffffffffL
    if (boxType(0) != "ftyp") return None
    // Find a top-level box by type; returns (payloadOff, payloadEnd).
    def find(from: Int, end: Int, typ: String): Option[(Int, Int)] = {
      var i = from
      while (i + 8 <= end) {
        val size = u32(i)
        if (size < 8 || i + size > end) return None
        if (boxType(i) == typ) return Some((i + 8, i + size.toInt))
        i += size.toInt
      }
      None
    }
    for {
      (moovOff, moovEnd) <- find(0, payload.length, "moov")
      (o, e) <- find(moovOff, moovEnd, "mvhd")
      meta <- {
        val version = payload(o) & 0xff
        if (version == 0 && o + 20 <= e)
          Some((u32(o + 12).toInt, u32(o + 16)))
        else if (version == 1 && o + 32 <= e)
          Some((u32(o + 20).toInt, bb.getLong(o + 24)))
        else None
      }
      (timescale, units) = meta
      if timescale > 0 && units >= 0
    } yield (timescale, units * 1000L / timescale)
  }

  /** REAL MP4 sample-table decode (pure JDK): walk
    * `moov > trak > mdia > (mdhd, minf > stbl > (stts, stsz))` and
    * return the media timescale (mdhd, units/second), the per-sample
    * durations in media units (stts run-length entries EXPANDED — each
    * `(sample_count, sample_delta)` run yields `sample_count` entries),
    * and the per-sample byte sizes (stsz; a nonzero `sample_size`
    * field means all samples share that size). Returns None for bytes
    * without the full chain, a box overrun, or mismatched stts/stsz
    * sample counts. Header-only — `mdat` is never touched.
    */
  def decodeMp4Samples(
      payload: Array[Byte]): Option[(Int, Array[Int], Array[Int])] = {
    if (payload == null || payload.length < 16) return None
    val bb = java.nio.ByteBuffer.wrap(payload)   // ISO-BMFF ints are BE
    def boxType(off: Int): String =
      new String(payload, off + 4, 4, "US-ASCII")
    def u32(off: Int): Long = bb.getInt(off).toLong & 0xffffffffL
    if (boxType(0) != "ftyp") return None
    // Find a box by type within [from, end); returns payload bounds.
    def find(from: Int, end: Int, typ: String): Option[(Int, Int)] = {
      var i = from
      while (i + 8 <= end) {
        val size = u32(i)
        if (size < 8 || i + size > end) return None
        if (boxType(i) == typ) return Some((i + 8, i + size.toInt))
        i += size.toInt
      }
      None
    }
    for {
      (moovO, moovE) <- find(0, payload.length, "moov")
      (trakO, trakE) <- find(moovO, moovE, "trak")
      (mdiaO, mdiaE) <- find(trakO, trakE, "mdia")
      (mdhdO, mdhdE) <- find(mdiaO, mdiaE, "mdhd")
      timescale <- {
        val version = payload(mdhdO) & 0xff
        if (version == 0 && mdhdO + 16 <= mdhdE)
          Some(u32(mdhdO + 12).toInt)
        else if (version == 1 && mdhdO + 24 <= mdhdE)
          Some(u32(mdhdO + 20).toInt)
        else None
      }
      if timescale > 0
      (minfO, minfE) <- find(mdiaO, mdiaE, "minf")
      (stblO, stblE) <- find(minfO, minfE, "stbl")
      (sttsO, sttsE) <- find(stblO, stblE, "stts")
      durations <- {
        if (sttsO + 8 > sttsE) None
        else {
          val nRuns = u32(sttsO + 4)
          if (sttsO + 8 + 8 * nRuns > sttsE || nRuns > (1 << 20)) None
          else {
            val durs = Array.newBuilder[Int]
            var run = 0
            var total = 0L
            var bad = false
            while (run < nRuns && !bad) {
              val count = u32(sttsO + 8 + 8 * run)
              val delta = u32(sttsO + 12 + 8 * run)
              total += count
              if (delta <= 0 || delta > Int.MaxValue || total > (1 << 24))
                bad = true
              else {
                var j = 0L
                while (j < count) { durs += delta.toInt; j += 1 }
              }
              run += 1
            }
            if (bad) None else Some(durs.result())
          }
        }
      }
      (stszO, stszE) <- find(stblO, stblE, "stsz")
      sizes <- {
        if (stszO + 12 > stszE) None
        else {
          val uniform = u32(stszO + 4)
          val n = u32(stszO + 8)
          if (n != durations.length) None
          else if (uniform > 0) Some(Array.fill(n.toInt)(uniform.toInt))
          else if (stszO + 12 + 4 * n > stszE) None
          else Some(Array.tabulate(n.toInt)(i =>
            u32(stszO + 12 + 4 * i).toInt))
        }
      }
    } yield (timescale, durations, sizes)
  }

  /** Audio metadata extraction, one mapPartitions stage over
    * (doc_id, payload, media_type) rows: real WAV header parse for
    * `audio/wav`/`audio/x-wav`, (0, 0, 0, 0) sentinel for anything else
    * or corrupt bytes (the audio twin of the image decoders' zero-dims
    * sentinel — no other audio codec ships with this environment).
    */
  def audioFeatures(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val meta =
          if (m.media_type != null &&
              (m.media_type.equalsIgnoreCase("audio/wav") ||
                m.media_type.equalsIgnoreCase("audio/x-wav")))
            decodeWavMeta(m.payload)
          else None
        val (ch, rate, bits, ms) = meta.getOrElse((0, 0, 0, 0L))
        AudioFeatureRow(m.doc_id, ch, rate, bits, ms, md5Hex(m.payload))
      }
    }.toDF()
  }

  /** Video metadata extraction, one mapPartitions stage over
    * (doc_id, payload, media_type) rows: real MP4 mvhd parse for
    * `video/mp4`, (0, 0) sentinel for anything else or corrupt bytes.
    */
  def videoFeatures(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val meta =
          if (m.media_type != null &&
              m.media_type.equalsIgnoreCase("video/mp4"))
            decodeMp4Meta(m.payload)
          else None
        val (ts, ms) = meta.getOrElse((0, 0L))
        VideoFeatureRow(m.doc_id, ts, ms, md5Hex(m.payload))
      }
    }.toDF()
  }

  /** Dispatch: real decoder where one exists (BMP, PNG, JPEG, GIF,
    * WebP), deterministic stub elsewhere. A corrupt payload under a
    * real-decoder media type yields (0, 0, 0) — downstream filters on
    * width > 0, the image twin of S10's extraction-error sentinel.
    */
  def decodeDims(payload: Array[Byte], mediaType: String): (Int, Int, Int) =
    if (mediaType == null) stubDims(payload)
    else if (mediaType.equalsIgnoreCase("image/bmp"))
      decodeBmpDims(payload).getOrElse((0, 0, 0))
    else if (mediaType.equalsIgnoreCase("image/png"))
      decodePngDims(payload).getOrElse((0, 0, 0))
    else if (mediaType.equalsIgnoreCase("image/jpeg") ||
        mediaType.equalsIgnoreCase("image/jpg"))
      decodeJpegDims(payload).getOrElse((0, 0, 0))
    else if (mediaType.equalsIgnoreCase("image/gif"))
      decodeGifDims(payload).getOrElse((0, 0, 0))
    else if (mediaType.equalsIgnoreCase("image/webp"))
      decodeWebpDims(payload).getOrElse((0, 0, 0))
    else if (mediaType.equalsIgnoreCase("image/tiff"))
      decodeTiffDims(payload).getOrElse((0, 0, 0))
    else stubDims(payload)

  /** Aspect-preserving downscale bound: images whose longest edge
    * exceeds `maxEdge` scale to it (floor), never upscale.
    */
  def resized(w: Int, h: Int, maxEdge: Int): (Int, Int) = {
    val m = math.max(w, h)
    if (m <= maxEdge) (w, h)
    else
      // (edge * maxEdge) / m, NOT edge * (maxEdge / m): the latter puts
      // the division first and its rounding error under the floor (the
      // longest edge would floor to maxEdge-1 instead of maxEdge).
      (math.max(1, math.floor(w * maxEdge.toDouble / m).toInt),
        math.max(1, math.floor(h * maxEdge.toDouble / m).toInt))
  }

  /** Decode + feature-extract + resize metadata, one mapPartitions
    * stage over (doc_id, payload, media_type) rows.
    */
  def imageFeatures(media: Dataset[MediaRow], maxEdge: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // Per-partition setup point: a real codec initializes here once.
      it.map { m =>
        val (w, h, c) = decodeDims(m.payload, m.media_type)
        val (rw, rh) = resized(w, h, maxEdge)
        ImageFeatureRow(m.doc_id, w, h, c, rw, rh, md5Hex(m.payload))
      }
    }.toDF()
  }

  /** REAL frame sampling (1 -> N): parse the MP4 sample table
    * (stts/stsz via `decodeMp4Samples`) and emit every `everyN`-th
    * sample with its exact presentation offset — the cumulative
    * duration of all earlier samples, converted from media-timescale
    * units to integer ms — and its byte size from stsz. Variable frame
    * rate (multiple stts runs) is honored, since offsets come from the
    * expanded per-sample durations, not a fps constant. Payloads
    * without a parseable sample table yield zero frames — the 1->N
    * twin of the decoders' zero-dims sentinel. One mapPartitions
    * stage; `mdat` is never read, so only header bytes are touched.
    */
  def sampleFrames(media: Dataset[MediaRow], everyN: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { m =>
        decodeMp4Samples(m.payload).toSeq.flatMap {
          case (timescale, durations, sizes) =>
            // offsetUnits[i] = sum of durations[0, i)
            val offsets = durations.scanLeft(0L)(_ + _)
            (0 until durations.length by everyN).map(i =>
              FrameRow(m.doc_id, i, offsets(i) * 1000L / timescale,
                sizes(i)))
        }
      }
    }.toDF()
  }
}
