package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}

/** One decoded-media row (top-level for Catalyst encoders). */
final case class MediaRow(doc_id: Long, payload: Array[Byte],
    media_type: String)

final case class ImageFeatureRow(doc_id: Long, width: Int, height: Int,
    channels: Int, resized_w: Int, resized_h: Int, fingerprint: String)

final case class FrameRow(doc_id: Long, frame_idx: Int, offset_ms: Long)

/** Multimodal column plumbing: image/audio/video travel as opaque
  * `binary` columns with typed metadata, and the compute-heavy steps
  * (decode, feature-extract, resize, frame-sample) run as
  * `mapPartitions` stages — per-partition batches, codec state reused
  * across a partition, no shuffle.
  *
  * STUB NOTE: no image/audio codec ships with this environment, so
  * `decodeDims` is a clearly-marked deterministic fake (dims derived
  * from the payload hash). Swapping in a real codec changes ONLY that
  * function — the schema, partitioning, batch shape and the resize /
  * frame-sample arithmetic around it are real and tested.
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
  def decodeDims(payload: Array[Byte]): (Int, Int, Int) = {
    val w = 64 + payloadHash(payload) % 513
    val h = 64 + payloadHash("h:".getBytes("UTF-8") ++ payload) % 385
    (w.toInt, h.toInt, 3)
  }

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
        val (w, h, c) = decodeDims(m.payload)
        val (rw, rh) = resized(w, h, maxEdge)
        ImageFeatureRow(m.doc_id, w, h, c, rw, rh, md5Hex(m.payload))
      }
    }.toDF()
  }

  /** Frame sampling (1 -> N): every `everyN`-th frame of a fake-decoded
    * video (frame count from the payload hash, 25 fps), emitted from
    * the same batch shape a real demuxer would use.
    */
  def sampleFrames(media: Dataset[MediaRow], everyN: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { m =>
        val nFrames = (8 + payloadHash(m.payload) % 25).toInt
        (0 until nFrames by everyN).map(i =>
          FrameRow(m.doc_id, i, i * 40L))   // 25 fps -> 40 ms per frame
      }
    }.toDF()
  }
}
