package graft.queries

import graft.QueryDef.PresentOps
import graft.{QueryDef, Tables}
import graft.multimodal.{MediaRow, Multimodal}
import graft.sources.{DocBuild, JsonIndex}
import org.apache.spark.sql.functions._

/** Multimodal mapPartitions plumbing (decode/resize/frame-sample over
  * binary columns) and the JSON index round trip — each differential-
  * tested against SQL replicas of the deterministic stubs.
  */
object MediaQueries {

  val defs: Seq[QueryDef] = Seq(

    // Image decode + aspect-preserving resize metadata through the
    // mapPartitions batch path (stub decode = payload-hash dims).
    QueryDef(
      "mm_image_resize_meta",
      """WITH m AS (
        |  SELECT doc_id,
        |    (64 + ('0x'||substr(md5(text),1,15))::BIGINT % 513)::INT AS width,
        |    (64 + ('0x'||substr(md5('h:'||text),1,15))::BIGINT % 385)::INT AS height
        |  FROM documents)
        |SELECT doc_id, width, height, 3 AS channels,
        |  CASE WHEN greatest(width, height) <= 256 THEN width
        |       ELSE greatest(1, floor(width * 256.0 / greatest(width, height))::INT)
        |  END AS resized_w,
        |  CASE WHEN greatest(width, height) <= 256 THEN height
        |       ELSE greatest(1, floor(height * 256.0 / greatest(width, height))::INT)
        |  END AS resized_h
        |FROM m ORDER BY doc_id""".stripMargin) { (s, d) =>
      import s.implicits._
      val media = Tables.documents(s, d)
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"),
          lit("image").as("media_type"))
        .as[MediaRow]
      Multimodal.imageFeatures(media, maxEdge = 256)
        .select(col("doc_id"), col("width"), col("height"), col("channels"),
          col("resized_w"), col("resized_h"))
        .presentSorted(col("doc_id"))
    },

    // REAL image decode: synthesize an actual 24-bit BMP per document
    // (header + pixel rows), run it through the same mapPartitions
    // feature stage, and check that width/height/channels come from the
    // parsed BITMAPINFOHEADER — not from any payload-hash stub. The
    // oracle recomputes the dims the builder encoded.
    QueryDef(
      "mm_bmp_decode",
      """WITH m AS (
        |  SELECT doc_id, (16 + doc_id % 48)::INT AS width,
        |         (16 + doc_id % 32)::INT AS height
        |  FROM documents)
        |SELECT doc_id, width, height, 3 AS channels,
        |  CASE WHEN greatest(width, height) <= 32 THEN width
        |       ELSE greatest(1, floor(width * 32.0 / greatest(width, height))::INT)
        |  END AS resized_w,
        |  CASE WHEN greatest(width, height) <= 32 THEN height
        |       ELSE greatest(1, floor(height * 32.0 / greatest(width, height))::INT)
        |  END AS resized_h
        |FROM m ORDER BY doc_id""".stripMargin) { (s, d) =>
      import s.implicits._
      val media = Tables.documents(s, d)
        .select(col("doc_id"),
          DocBuild.bmpUdf((col("doc_id") % 48 + 16).cast("int"),
            (col("doc_id") % 32 + 16).cast("int"),
            (col("doc_id") % 251).cast("int")).as("payload"),
          lit("image/bmp").as("media_type"))
        .as[MediaRow]
      Multimodal.imageFeatures(media, maxEdge = 32)
        .select(col("doc_id"), col("width"), col("height"), col("channels"),
          col("resized_w"), col("resized_h"))
        .presentSorted(col("doc_id"))
    },

    // FULL-RASTER pixel statistics: the Spark side decodes ACTUAL BMP
    // bytes (bottom-up rows, 4-byte padding) and aggregates intensity;
    // the oracle recomputes the sums in closed form from the builder's
    // analytic gradient — a true end-to-end pixel-decode check, the
    // brightness-gate / dead-image-detection step of a vision pipeline.
    QueryDef(
      "mm_bmp_pixel_stats",
      """WITH m AS (
        |  SELECT doc_id, (16 + doc_id % 48)::INT AS w,
        |         (16 + doc_id % 32)::INT AS h,
        |         ((doc_id * 11) % 256)::INT AS seed
        |  FROM documents),
        |px AS (
        |  SELECT doc_id, ((seed + rr * 7 + cc * 3) % 256)::BIGINT AS v
        |  FROM m, unnest(range(0, h)) AS t1(rr),
        |       unnest(range(0, w)) AS t2(cc))
        |SELECT doc_id, count(*)::BIGINT AS n_pixels,
        |  sum(v)::BIGINT AS sum_intensity,
        |  sum(v)::BIGINT * 1000 // count(*) AS mean_milli,
        |  min(v)::BIGINT AS min_v, max(v)::BIGINT AS max_v
        |FROM px GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
      import s.implicits._
      val media = Tables.documents(s, d)
        .select(col("doc_id"),
          DocBuild.bmpPatternUdf((col("doc_id") % 48 + 16).cast("int"),
            (col("doc_id") % 32 + 16).cast("int"),
            ((col("doc_id") * 11) % 256).cast("int"),
            lit(7), lit(3)).as("payload"),
          lit("image/bmp").as("media_type"))
        .as[MediaRow]
      Multimodal.imagePixelStats(media)
        .presentSorted(col("doc_id"))
    },

    // PIXEL-HISTOGRAM ENTROPY: the dead-image / low-contrast gate a
    // vision pipeline runs AFTER decode — 8-bucket intensity histogram
    // from the real raster walk, Shannon entropy over the bucket
    // distribution in exact micro-nats via per-bin rounded ln terms
    // (no float SUM crosses the engines: each ln rounds to BIGINT
    // per row, the aggregation is integer). Oracle re-enumerates the
    // builder's analytic gradient raster.
    QueryDef(
      "mm_pixel_entropy",
      """WITH m AS (
        |  SELECT doc_id, (16 + doc_id % 48)::INT AS w,
        |         (16 + doc_id % 32)::INT AS h,
        |         ((doc_id * 11) % 256)::INT AS seed
        |  FROM documents),
        |px AS (
        |  SELECT doc_id, ((seed + rr * 7 + cc * 3) % 256)::BIGINT AS v
        |  FROM m, unnest(range(0, h)) AS t1(rr),
        |       unnest(range(0, w)) AS t2(cc)),
        |hb AS (SELECT doc_id, (v // 32)::BIGINT AS bin, count(*)::BIGINT AS c
        |       FROM px GROUP BY 1, 2),
        |t AS (SELECT doc_id, sum(c)::BIGINT AS n, count(*)::BIGINT AS n_bins,
        |        sum(round(c::DOUBLE * ln(c::DOUBLE) * 1e6)::BIGINT)::BIGINT
        |          AS sclnc
        |      FROM hb GROUP BY 1)
        |SELECT doc_id, n_bins,
        |  ((round(ln(n::DOUBLE) * 1e6)::BIGINT * n) - sclnc) // n
        |    AS entropy_micro
        |FROM t ORDER BY doc_id""".stripMargin) { (s, d) =>
      import s.implicits._
      val media = Tables.documents(s, d)
        .select(col("doc_id"),
          DocBuild.bmpPatternUdf((col("doc_id") % 48 + 16).cast("int"),
            (col("doc_id") % 32 + 16).cast("int"),
            ((col("doc_id") * 11) % 256).cast("int"),
            lit(7), lit(3)).as("payload"),
          lit("image/bmp").as("media_type"))
        .as[MediaRow]
      Multimodal.imagePixelHistogram(media, bins = 8)
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bins"), sum(col("cnt")).as("n"),
          sum(round(col("cnt").cast("double") *
            log(col("cnt").cast("double")) * lit(1e6)).cast("long"))
            .as("sclnc"))
        .select(col("doc_id"), col("n_bins"),
          expr("(cast(round(ln(cast(n as double)) * 1e6) as bigint) * n " +
            "- sclnc) div n").as("entropy_micro"))
        .presentSorted(col("doc_id"))
    },

    // REAL PNG decode: synthesize a valid PNG per document (signature,
    // CRC'd IHDR/IDAT/IEND, deflated scanlines) with the color type
    // cycling grayscale/RGB/RGBA, and check that width/height/channels
    // come from the parsed IHDR. The oracle recomputes what the builder
    // encoded — including the color-type -> channels mapping.
    QueryDef(
      "mm_png_decode",
      """WITH m AS (
        |  SELECT doc_id, (16 + doc_id % 40)::INT AS width,
        |         (16 + doc_id % 24)::INT AS height,
        |         (CASE doc_id % 3 WHEN 0 THEN 1 WHEN 1 THEN 3 ELSE 4 END)::INT
        |           AS channels
        |  FROM documents)
        |SELECT doc_id, width, height, channels,
        |  CASE WHEN greatest(width, height) <= 32 THEN width
        |       ELSE greatest(1, floor(width * 32.0 / greatest(width, height))::INT)
        |  END AS resized_w,
        |  CASE WHEN greatest(width, height) <= 32 THEN height
        |       ELSE greatest(1, floor(height * 32.0 / greatest(width, height))::INT)
        |  END AS resized_h
        |FROM m ORDER BY doc_id""".stripMargin) { (s, d) =>
      import s.implicits._
      val colorType = when(col("doc_id") % 3 === 0, 0)
        .when(col("doc_id") % 3 === 1, 2).otherwise(6)
      val media = Tables.documents(s, d)
        .select(col("doc_id"),
          DocBuild.pngUdf((col("doc_id") % 40 + 16).cast("int"),
            (col("doc_id") % 24 + 16).cast("int"),
            colorType.cast("int"),
            (col("doc_id") % 251).cast("int")).as("payload"),
          lit("image/png").as("media_type"))
        .as[MediaRow]
      Multimodal.imageFeatures(media, maxEdge = 32)
        .select(col("doc_id"), col("width"), col("height"), col("channels"),
          col("resized_w"), col("resized_h"))
        .presentSorted(col("doc_id"))
    },

    // REAL JPEG roundtrip: builder-synthesized spec-valid JPEGs (SOI /
    // JFIF / DQT / SOF0 / DHT / SOS / EOI), dims+channels from the
    // parsed SOF frame header. The oracle recomputes what the builder
    // encoded (channels: even doc_id grayscale, odd YCbCr).
    QueryDef(
      "mm_jpeg_decode",
      """WITH m AS (
        |  SELECT doc_id, (16 + doc_id % 48)::INT AS width,
        |         (16 + doc_id % 20)::INT AS height,
        |         (CASE doc_id % 2 WHEN 0 THEN 1 ELSE 3 END)::INT AS channels
        |  FROM documents)
        |SELECT doc_id, width, height, channels,
        |  CASE WHEN greatest(width, height) <= 32 THEN width
        |       ELSE greatest(1, floor(width * 32.0 / greatest(width, height))::INT)
        |  END AS resized_w,
        |  CASE WHEN greatest(width, height) <= 32 THEN height
        |       ELSE greatest(1, floor(height * 32.0 / greatest(width, height))::INT)
        |  END AS resized_h
        |FROM m ORDER BY doc_id""".stripMargin) { (s, d) =>
      import s.implicits._
      val channels = when(col("doc_id") % 2 === 0, 1).otherwise(3)
      val media = Tables.documents(s, d)
        .select(col("doc_id"),
          DocBuild.jpegUdf((col("doc_id") % 48 + 16).cast("int"),
            (col("doc_id") % 20 + 16).cast("int"),
            channels.cast("int"),
            (col("doc_id") % 251).cast("int")).as("payload"),
          lit("image/jpeg").as("media_type"))
        .as[MediaRow]
      Multimodal.imageFeatures(media, maxEdge = 32)
        .select(col("doc_id"), col("width"), col("height"), col("channels"),
          col("resized_w"), col("resized_h"))
        .presentSorted(col("doc_id"))
    },

    // REAL GIF roundtrip: builder-synthesized fully-valid GIF89a files
    // (logical screen descriptor, 4-entry palette, clear-code LZW
    // stream), dims from the parsed descriptor. GIF pixels are palette
    // indices into an RGB table, so channels are always 3. Width uses
    // a modulus that keeps the longest edge above AND below the resize
    // bound across doc_ids, so both resize branches execute.
    QueryDef(
      "mm_gif_decode",
      """WITH m AS (
        |  SELECT doc_id, (16 + doc_id % 40)::INT AS width,
        |         (16 + doc_id % 28)::INT AS height
        |  FROM documents)
        |SELECT doc_id, width, height, 3 AS channels,
        |  CASE WHEN greatest(width, height) <= 32 THEN width
        |       ELSE greatest(1, floor(width * 32.0 / greatest(width, height))::INT)
        |  END AS resized_w,
        |  CASE WHEN greatest(width, height) <= 32 THEN height
        |       ELSE greatest(1, floor(height * 32.0 / greatest(width, height))::INT)
        |  END AS resized_h
        |FROM m ORDER BY doc_id""".stripMargin) { (s, d) =>
      import s.implicits._
      val media = Tables.documents(s, d)
        .select(col("doc_id"),
          DocBuild.gifUdf((col("doc_id") % 40 + 16).cast("int"),
            (col("doc_id") % 28 + 16).cast("int"),
            (col("doc_id") % 251).cast("int")).as("payload"),
          lit("image/gif").as("media_type"))
        .as[MediaRow]
      Multimodal.imageFeatures(media, maxEdge = 32)
        .select(col("doc_id"), col("width"), col("height"), col("channels"),
          col("resized_w"), col("resized_h"))
        .presentSorted(col("doc_id"))
    },

    // REAL WebP roundtrip: builder-synthesized RIFF/WEBP files with a
    // VP8L chunk, dims and the alpha hint from the parsed 14-bit
    // header u32 (channels 4 on odd doc_ids prove the bit-28 unpack).
    QueryDef(
      "mm_webp_decode",
      """WITH m AS (
        |  SELECT doc_id, (16 + doc_id % 44)::INT AS width,
        |         (16 + doc_id % 26)::INT AS height,
        |         (3 + doc_id % 2)::INT AS channels
        |  FROM documents)
        |SELECT doc_id, width, height, channels,
        |  CASE WHEN greatest(width, height) <= 32 THEN width
        |       ELSE greatest(1, floor(width * 32.0 / greatest(width, height))::INT)
        |  END AS resized_w,
        |  CASE WHEN greatest(width, height) <= 32 THEN height
        |       ELSE greatest(1, floor(height * 32.0 / greatest(width, height))::INT)
        |  END AS resized_h
        |FROM m ORDER BY doc_id""".stripMargin) { (s, d) =>
      import s.implicits._
      val media = Tables.documents(s, d)
        .select(col("doc_id"),
          DocBuild.webpUdf((col("doc_id") % 44 + 16).cast("int"),
            (col("doc_id") % 26 + 16).cast("int"),
            col("doc_id") % 2 === 1,
            (col("doc_id") % 251).cast("int")).as("payload"),
          lit("image/webp").as("media_type"))
        .as[MediaRow]
      Multimodal.imageFeatures(media, maxEdge = 32)
        .select(col("doc_id"), col("width"), col("height"), col("channels"),
          col("resized_w"), col("resized_h"))
        .presentSorted(col("doc_id"))
    },

    // REAL TIFF roundtrip: builder-synthesized baseline TIFFs — even
    // doc_ids little-endian (II), odd big-endian (MM), so both
    // byte-order paths of the IFD walk are proven — dims from tags
    // 256/257 and channels from SamplesPerPixel (277).
    QueryDef(
      "mm_tiff_decode",
      """WITH m AS (
        |  SELECT doc_id, (16 + doc_id % 36)::INT AS width,
        |         (16 + doc_id % 22)::INT AS height,
        |         (CASE doc_id % 3 WHEN 0 THEN 1 WHEN 1 THEN 3 ELSE 4 END)::INT
        |           AS channels
        |  FROM documents)
        |SELECT doc_id, width, height, channels,
        |  CASE WHEN greatest(width, height) <= 32 THEN width
        |       ELSE greatest(1, floor(width * 32.0 / greatest(width, height))::INT)
        |  END AS resized_w,
        |  CASE WHEN greatest(width, height) <= 32 THEN height
        |       ELSE greatest(1, floor(height * 32.0 / greatest(width, height))::INT)
        |  END AS resized_h
        |FROM m ORDER BY doc_id""".stripMargin) { (s, d) =>
      import s.implicits._
      val spp = when(col("doc_id") % 3 === 0, 1)
        .when(col("doc_id") % 3 === 1, 3).otherwise(4)
      val media = Tables.documents(s, d)
        .select(col("doc_id"),
          DocBuild.tiffUdf((col("doc_id") % 36 + 16).cast("int"),
            (col("doc_id") % 22 + 16).cast("int"), spp.cast("int"),
            (col("doc_id") % 251).cast("int"),
            col("doc_id") % 2 === 1).as("payload"),
          lit("image/tiff").as("media_type"))
        .as[MediaRow]
      Multimodal.imageFeatures(media, maxEdge = 32)
        .select(col("doc_id"), col("width"), col("height"), col("channels"),
          col("resized_w"), col("resized_h"))
        .presentSorted(col("doc_id"))
    },

    // REAL WAV roundtrip: builder-synthesized RIFF/fmt/data files,
    // channels / sample rate / bits from the parsed fmt chunk and
    // duration from the data size over the byte rate. The oracle
    // recomputes what the builder encoded (duration_ms is exact integer
    // division of samples*1000 by the sample rate).
    QueryDef(
      "mm_wav_decode",
      """WITH m AS (
        |  SELECT doc_id, (1 + doc_id % 2)::INT AS channels,
        |    (CASE doc_id % 3 WHEN 0 THEN 8000 WHEN 1 THEN 16000
        |     ELSE 44100 END)::INT AS sample_rate,
        |    (CASE doc_id % 2 WHEN 0 THEN 8 ELSE 16 END)::INT
        |      AS bits_per_sample,
        |    100 + doc_id % 400 AS n_samples
        |  FROM documents)
        |SELECT doc_id, channels, sample_rate, bits_per_sample,
        |  (n_samples * 1000) // sample_rate AS duration_ms
        |FROM m ORDER BY doc_id""".stripMargin) { (s, d) =>
      import s.implicits._
      val rate = when(col("doc_id") % 3 === 0, 8000)
        .when(col("doc_id") % 3 === 1, 16000).otherwise(44100)
      val bits = when(col("doc_id") % 2 === 0, 8).otherwise(16)
      val media = Tables.documents(s, d)
        .select(col("doc_id"),
          DocBuild.wavUdf((col("doc_id") % 2 + 1).cast("int"),
            rate.cast("int"), bits.cast("int"),
            (col("doc_id") % 400 + 100).cast("int"),
            (col("doc_id") % 251).cast("int")).as("payload"),
          lit("audio/wav").as("media_type"))
        .as[MediaRow]
      Multimodal.audioFeatures(media)
        .select(col("doc_id"), col("channels"), col("sample_rate"),
          col("bits_per_sample"), col("duration_ms"))
        .presentSorted(col("doc_id"))
    },

    // REAL MP4 roundtrip: builder-synthesized ISO-BMFF files
    // (ftyp / moov>mvhd / mdat), movie timescale and duration from the
    // parsed version-0 mvhd box. The oracle recomputes what the builder
    // encoded (duration_ms = units*1000 // timescale, exact integer).
    QueryDef(
      "mm_mp4_decode",
      """WITH m AS (
        |  SELECT doc_id,
        |    (CASE doc_id % 3 WHEN 0 THEN 600 WHEN 1 THEN 1000
        |     ELSE 90000 END)::INT AS timescale,
        |    600 + doc_id % 36000 AS units
        |  FROM documents)
        |SELECT doc_id, timescale, (units * 1000) // timescale AS duration_ms
        |FROM m ORDER BY doc_id""".stripMargin) { (s, d) =>
      import s.implicits._
      val ts = when(col("doc_id") % 3 === 0, 600)
        .when(col("doc_id") % 3 === 1, 1000).otherwise(90000)
      val media = Tables.documents(s, d)
        .select(col("doc_id"),
          DocBuild.mp4Udf(ts.cast("int"),
            (col("doc_id") % 36000 + 600).cast("int"),
            (col("doc_id") % 251).cast("int")).as("payload"),
          lit("video/mp4").as("media_type"))
        .as[MediaRow]
      Multimodal.videoFeatures(media)
        .select(col("doc_id"), col("timescale"), col("duration_ms"))
        .presentSorted(col("doc_id"))
    },

    // REAL video frame sampling (1 -> N) through mapPartitions: every
    // 5th sample of builder-synthesized MP4s whose stts holds TWO runs
    // (25 fps first half, 12.5 fps second half — proving the RLE
    // expansion, not an fps constant) and whose stsz carries explicit
    // per-sample sizes. The oracle recomputes the exact cumulative
    // offsets the sample table encodes: d1*1000/ts = 40 ms for every
    // timescale used (all divisible by 25), so the expected offsets are
    // ts-independent while the Spark side still must divide by the
    // PARSED mdhd timescale to land on them.
    QueryDef(
      "mm_frame_sample",
      """WITH v AS (
        |  SELECT doc_id, (8 + doc_id % 25)::INT AS n_frames,
        |    ((8 + doc_id % 25) // 2)::INT AS k, (doc_id % 251)::INT AS px
        |  FROM documents),
        |f AS (
        |  SELECT doc_id, k, px, unnest(range(0, n_frames, 5)) AS i
        |  FROM v)
        |SELECT doc_id, i::INT AS frame_idx,
        |  (CASE WHEN i <= k THEN i * 40
        |        ELSE k * 40 + (i - k) * 80 END)::BIGINT AS offset_ms,
        |  (50 + (px + i) % 100)::INT AS frame_bytes
        |FROM f ORDER BY doc_id, frame_idx""".stripMargin) { (s, d) =>
      import s.implicits._
      val sampledUdf = udf((ts: Int, n: Int, px: Int) => {
        val k = n / 2
        val d1 = ts / 25
        DocBuild.mp4SampledBytes(ts,
          Array.tabulate(n)(i => if (i < k) d1 else 2 * d1),
          Array.tabulate(n)(i => 50 + ((px + i) % 100)), px)
      })
      val ts = when(col("doc_id") % 3 === 0, 600)
        .when(col("doc_id") % 3 === 1, 1000).otherwise(90000)
      val media = Tables.documents(s, d)
        .select(col("doc_id"),
          sampledUdf(ts.cast("int"), (col("doc_id") % 25 + 8).cast("int"),
            (col("doc_id") % 251).cast("int")).as("payload"),
          lit("video/mp4").as("media_type"))
        .as[MediaRow]
      Multimodal.sampleFrames(media, everyN = 5)
        .presentSorted(col("doc_id"), col("frame_idx"))
    },

    // Perceptual image near-dup (Multimodal.averageHash): REAL
    // pixel-level work — analytic-gradient BMPs are built per doc
    // (same seed per doc_id%25 group -> exact dups; row-coefficient
    // split by parity -> near-dup families), the 8x8 average-hash is
    // computed from the actual decoded bytes with integer-exact
    // thresholds, and pairs meet through 16-bit band blocking + a
    // Hamming cap — the image twin of SimHash text dedup. The oracle
    // recomputes the hash from the closed-form pixel function,
    // carrying it as two 32-bit halves (a 1<<63 would overflow
    // DuckDB's checked shift).
    QueryDef(
      "mm_phash_near_dup",
      """WITH p AS (
        |  SELECT doc_id, ((doc_id * 11) % 256)::INT AS seed,
        |         (1 + doc_id % 7)::INT AS rc
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, ((doc_id * 11) % 256)::INT,
        |         (1 + doc_id % 7)::INT
        |  FROM documents),
        |px AS (
        |  SELECT p.doc_id, (r.r // 6)::INT AS cr, (c.c // 8)::INT AS cc,
        |    ((p.seed + r.r * p.rc + c.c * 13) % 256)::BIGINT AS v
        |  FROM p,
        |    (SELECT unnest(range(0, 48)) AS r) r,
        |    (SELECT unnest(range(0, 64)) AS c) c),
        |cells AS (
        |  SELECT doc_id, cr, cc, sum(v)::BIGINT AS s
        |  FROM px GROUP BY doc_id, cr, cc),
        |tot AS (SELECT doc_id, sum(s)::BIGINT AS t FROM cells GROUP BY doc_id),
        |hs AS (
        |  SELECT c.doc_id,
        |    bit_or(CASE WHEN c.s * 64 > t.t AND c.cr * 8 + c.cc >= 32
        |      THEN 1::BIGINT << (c.cr * 8 + c.cc - 32) ELSE 0::BIGINT END) AS hi,
        |    bit_or(CASE WHEN c.s * 64 > t.t AND c.cr * 8 + c.cc < 32
        |      THEN 1::BIGINT << (c.cr * 8 + c.cc) ELSE 0::BIGINT END) AS lo
        |  FROM cells c JOIN tot t USING (doc_id) GROUP BY c.doc_id),
        |bands AS (
        |  SELECT doc_id, hi, lo, b.b AS band,
        |    CASE b.b WHEN 0 THEN lo & 65535 WHEN 1 THEN (lo >> 16) & 65535
        |             WHEN 2 THEN hi & 65535 ELSE (hi >> 16) & 65535 END AS bv
        |  FROM hs, (SELECT unnest(range(0, 4)) AS b) b),
        |cand AS (
        |  SELECT DISTINCT xa.doc_id AS a, xa.hi AS hia, xa.lo AS loa,
        |    xb.doc_id AS b, xb.hi AS hib, xb.lo AS lob
        |  FROM bands xa JOIN bands xb
        |    ON xa.band = xb.band AND xa.bv = xb.bv AND xa.doc_id < xb.doc_id)
        |SELECT a, b,
        |  (bit_count(xor(hia, hib)) + bit_count(xor(loa, lob)))::INT AS hamming
        |FROM cand
        |WHERE bit_count(xor(hia, hib)) + bit_count(xor(loa, lob)) <= 8
        |ORDER BY a, b""".stripMargin) { (s, d) =>
      val hashUdf = udf((p: Array[Byte]) => Multimodal.averageHash(p))
      val docs = Tables.documents(s, d)
      val corpus = docs.select(col("doc_id")).unionByName(
        docs.select((col("doc_id") + 1000000).as("doc_id")))
      val hs = corpus
        .select(col("doc_id"),
          hashUdf(DocBuild.bmpPatternUdf(lit(64), lit(48),
            ((col("doc_id") % 1000000) * 11 % 256).cast("int"),
            (lit(1) + col("doc_id") % 1000000 % 7).cast("int"),
            lit(13))).as("h"))
        .select(col("doc_id"),
          shiftrightunsigned(col("h"), 32).as("hi"),
          col("h").bitwiseAND(lit(0xFFFFFFFFL)).as("lo"))
      val bands = hs.select(col("doc_id"), col("hi"), col("lo"),
        explode(array(
          struct(lit(0).as("band"),
            col("lo").bitwiseAND(lit(65535L)).as("bv")),
          struct(lit(1).as("band"),
            shiftrightunsigned(col("lo"), 16).bitwiseAND(lit(65535L)).as("bv")),
          struct(lit(2).as("band"),
            col("hi").bitwiseAND(lit(65535L)).as("bv")),
          struct(lit(3).as("band"),
            shiftrightunsigned(col("hi"), 16).bitwiseAND(lit(65535L)).as("bv"))))
          .as("bb"))
        .select(col("doc_id"), col("hi"), col("lo"),
          col("bb.band").as("band"), col("bb.bv").as("bv"))
      val cand = bands.as("xa")
        .join(bands.as("xb"),
          col("xa.band") === col("xb.band") && col("xa.bv") === col("xb.bv") &&
            col("xa.doc_id") < col("xb.doc_id"))
        .select(col("xa.doc_id").as("a"), col("xa.hi").as("hia"),
          col("xa.lo").as("loa"), col("xb.doc_id").as("b"),
          col("xb.hi").as("hib"), col("xb.lo").as("lob"))
        .distinct()
      cand
        .withColumn("hamming",
          (bit_count(col("hia").bitwiseXOR(col("hib"))) +
            bit_count(col("loa").bitwiseXOR(col("lob")))).cast("int"))
        .filter(col("hamming") <= 8)
        .select(col("a"), col("b"), col("hamming"))
        .presentSorted(col("a"), col("b"))
    },

    // REAL PCM loudness profile (Multimodal.pcmWindowStats): per-window
    // sample count, sum of squared amplitudes and peak |amplitude| from
    // the ACTUAL 16-bit little-endian sample bytes of synthesized mono
    // WAVs — the silence/clipping gate of an audio ingest. All-integer
    // outputs; the oracle recomputes each sample from the builder's
    // closed-form sawtooth.
    QueryDef(
      "mm_wav_window_stats",
      """WITH p AS (
        |  SELECT doc_id, (doc_id % 251)::INT AS px,
        |         (300 + doc_id % 100)::INT AS n FROM documents),
        |smp AS (
        |  SELECT p.doc_id, (k.k // 128)::INT AS win,
        |    CASE WHEN ((p.px + 2*k.k) % 256) + 256 * ((p.px + 2*k.k + 1) % 256)
        |              >= 32768
        |         THEN ((p.px + 2*k.k) % 256) + 256 * ((p.px + 2*k.k + 1) % 256)
        |              - 65536
        |         ELSE ((p.px + 2*k.k) % 256) + 256 * ((p.px + 2*k.k + 1) % 256)
        |    END AS s
        |  FROM p, (SELECT unnest(range(0, 400)) AS k) k WHERE k.k < p.n)
        |SELECT doc_id, win, count(*)::INT AS n,
        |  sum(s::BIGINT * s)::BIGINT AS sum_sq, max(abs(s))::INT AS peak
        |FROM smp GROUP BY doc_id, win
        |ORDER BY doc_id, win""".stripMargin) { (s, d) =>
      val statsUdf = udf((p: Array[Byte], w: Int) =>
        Multimodal.pcmWindowStats(p, w))
      Tables.documents(s, d)
        .select(col("doc_id"),
          DocBuild.wavUdf(lit(1), lit(8000), lit(16),
            (lit(300) + col("doc_id") % 100).cast("int"),
            (col("doc_id") % 251).cast("int")).as("payload"))
        .select(col("doc_id"),
          explode(statsUdf(col("payload"), lit(128))).as("w"))
        .select(col("doc_id"), col("w.win").as("win"), col("w.n").as("n"),
          col("w.sum_sq").as("sum_sq"), col("w.peak").as("peak"))
        .presentSorted(col("doc_id"), col("win"))
    },

    // CSV source/sink roundtrip: documents (commas, quotes and unicode
    // in the text column) write to headered CSV and read back with an
    // explicit schema; the aggregate must match the pre-roundtrip
    // table exactly, proving quoting/escaping fidelity. The oracle
    // computes straight from documents — lossless is the contract.
    QueryDef(
      "src_csv_roundtrip",
      """SELECT (doc_id % 5)::INT AS grp, count(*) AS n,
        |  sum(n_chars)::BIGINT AS chars,
        |  sum(strlen(text))::BIGINT AS text_len
        |FROM documents GROUP BY grp ORDER BY grp""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val path = java.nio.file.Files.createTempDirectory("graft-csv")
        .toString + "/docs"
      docs.write.option("header", "true").mode("overwrite").csv(path)
      s.read.option("header", "true").schema(docs.schema).csv(path)
        .groupBy((col("doc_id") % 5).cast("int").as("grp"))
        .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("chars"),
          sum(length(col("text"))).as("text_len"))
        .presentSorted(col("grp"))
    },

    // ORC source/sink roundtrip — same contract through the other
    // columnar format Spark ships natively.
    QueryDef(
      "src_orc_roundtrip",
      """SELECT (doc_id % 5)::INT AS grp, count(*) AS n,
        |  sum(n_chars)::BIGINT AS chars,
        |  sum(strlen(text))::BIGINT AS text_len
        |FROM documents GROUP BY grp ORDER BY grp""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val path = java.nio.file.Files.createTempDirectory("graft-orc")
        .toString + "/docs"
      docs.write.mode("overwrite").orc(path)
      s.read.orc(path)
        .groupBy((col("doc_id") % 5).cast("int").as("grp"))
        .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("chars"),
          sum(length(col("text"))).as("text_len"))
        .presentSorted(col("grp"))
    },

    // XML source/sink roundtrip — Spark 4's built-in XML datasource
    // (the sitemap/feed-shaped ingest a crawler meets in the wild):
    // documents write as <doc> rows (markup-significant characters in
    // the text column must escape), read back with an explicit schema,
    // aggregate must match the pre-roundtrip table exactly.
    QueryDef(
      "src_xml_roundtrip",
      """SELECT (doc_id % 5)::INT AS grp, count(*) AS n,
        |  sum(n_chars)::BIGINT AS chars,
        |  sum(strlen(text))::BIGINT AS text_len
        |FROM documents GROUP BY grp ORDER BY grp""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val path = java.nio.file.Files.createTempDirectory("graft-xml")
        .toString + "/docs"
      docs.write.format("xml").option("rootTag", "corpus")
        .option("rowTag", "doc").mode("overwrite").save(path)
      s.read.format("xml").option("rowTag", "doc").schema(docs.schema)
        .load(path)
        .groupBy((col("doc_id") % 5).cast("int").as("grp"))
        .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("chars"),
          sum(length(col("text"))).as("text_len"))
        .presentSorted(col("grp"))
    },

    // S11/S15: JSON index sink + schema-first scan — write the index
    // rows as JSON Lines, read them back, aggregate. The oracle
    // computes the same aggregate straight from documents, so type
    // fidelity across the JSON round trip is what's under test.
    QueryDef(
      "jx_json_index_roundtrip",
      """SELECT (doc_id % 5)::INT AS depth, count(*) AS n,
        |  sum(strlen(text))::BIGINT AS total_len
        |FROM documents GROUP BY depth ORDER BY depth""".stripMargin) { (s, d) =>
      val index = Tables.documents(s, d).select(
        md5(col("text")).as("page_id"),
        concat(lit("job-"), col("source")).as("job_id"),
        concat(lit("https://"), col("source"), lit(".example.com/doc"),
          col("doc_id")).as("url"),
        concat(col("source"), lit(".example.com")).as("domain"),
        (col("doc_id") % 5).cast("int").as("depth"),
        concat(lit("/blobs/"), col("doc_id"), lit(".txt")).as("text_path"),
        lit("text/html").as("content_type"),
        sha2(col("text"), 256).as("content_hash"),
        octet_length(col("text")).as("text_len"))
      val path = java.nio.file.Files.createTempDirectory("graft-jx")
        .toString + "/pages_index"
      JsonIndex.write(index, path)
      JsonIndex.read(s, path)
        .groupBy(col("depth"))
        .agg(count(lit(1)).as("n"), sum(col("text_len")).as("total_len"))
        .presentSorted(col("depth"))
    }
  )
}
