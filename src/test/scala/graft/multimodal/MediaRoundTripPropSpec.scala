package graft.multimodal

import graft.sources.DocBuild
import org.scalacheck.{Gen, rng}
import org.scalatest.funsuite.AnyFunSuite

/** Property round-trips: every builder/decoder pair must agree on
  * randomly drawn parameters across the full supported ranges —
  * including the boundary dims a hand-picked fixture misses (1-pixel
  * images, 14-bit WebP maxima, single-sample MP4s).
  */
class MediaRoundTripPropSpec extends AnyFunSuite {

  private def draw[A](gen: Gen[A], n: Int, seed: Long): Seq[A] =
    Seq.tabulate(n)(i =>
      gen.pureApply(Gen.Parameters.default, rng.Seed(seed + i)))

  test("BMP/PNG/JPEG/GIF/TIFF dims round-trip over random parameters") {
    val dims = for {
      w <- Gen.chooseNum(1, 200)
      h <- Gen.chooseNum(1, 150)
      px <- Gen.chooseNum(0, 250)
    } yield (w, h, px)
    draw(dims, 40, 1L).foreach { case (w, h, px) =>
      assert(Multimodal.decodeBmpDims(DocBuild.bmpBytes(w, h, px))
        .contains((w, h, 3)), s"bmp $w x $h")
      assert(Multimodal.decodeGifDims(DocBuild.gifBytes(w, h, px))
        .contains((w, h, 3)), s"gif $w x $h")
      // PNG color types: 0 gray(1ch), 2 rgb(3ch), 6 rgba(4ch).
      val (ct, ch) = Seq((0, 1), (2, 3), (6, 4))(px % 3)
      assert(Multimodal.decodePngDims(DocBuild.pngBytes(w, h, ct, px))
        .contains((w, h, ch)), s"png $w x $h ct=$ct")
      val jch = if (px % 2 == 0) 1 else 3
      assert(Multimodal.decodeJpegDims(DocBuild.jpegBytes(w, h, jch, px))
        .contains((w, h, jch)), s"jpeg $w x $h")
      val spp = 1 + px % 4
      assert(Multimodal.decodeTiffDims(
        DocBuild.tiffBytes(w, h, spp, px, bigEndian = px % 2 == 1))
        .contains((w, h, spp)), s"tiff $w x $h spp=$spp")
    }
  }

  test("WebP dims round-trip including the 14-bit boundary") {
    val dims = for {
      w <- Gen.oneOf(Gen.chooseNum(1, 300), Gen.const(16384))
      h <- Gen.chooseNum(1, 300)
      alpha <- Gen.oneOf(true, false)
    } yield (w, h, alpha)
    draw(dims, 30, 7L).foreach { case (w, h, alpha) =>
      assert(Multimodal.decodeWebpDims(DocBuild.webpBytes(w, h, alpha, 3))
        .contains((w, h, if (alpha) 4 else 3)), s"vp8l $w x $h")
      if (w < 16384 && h < 16384)
        assert(Multimodal.decodeWebpDims(DocBuild.webpLossyBytes(w, h, 3))
          .contains((w, h, 3)), s"vp8 $w x $h")
    }
  }

  test("WAV and MP4 metadata round-trip over random parameters") {
    val wavs = for {
      ch <- Gen.chooseNum(1, 2)
      rate <- Gen.oneOf(8000, 16000, 22050, 44100, 48000)
      bits <- Gen.oneOf(8, 16)
      n <- Gen.chooseNum(1, 2000)
    } yield (ch, rate, bits, n)
    draw(wavs, 30, 11L).foreach { case (ch, rate, bits, n) =>
      val byteRate = rate * ch * bits / 8
      val wantMs = n.toLong * ch * (bits / 8) * 1000L / byteRate
      assert(Multimodal.decodeWavMeta(DocBuild.wavBytes(ch, rate, bits, n, 0))
        .contains((ch, rate, bits, wantMs)), s"wav $ch/$rate/$bits/$n")
    }
    val mp4s = for {
      ts <- Gen.oneOf(600, 1000, 90000)
      n <- Gen.chooseNum(1, 40)
      seed <- Gen.chooseNum(0, 200)
    } yield (ts, n, seed)
    draw(mp4s, 30, 13L).foreach { case (ts, n, seed) =>
      val durs = Array.tabulate(n)(i => 1 + (seed + i * 7) % 500)
      val sizes = Array.tabulate(n)(i => (seed + i * 13) % 900)
      val got = Multimodal.decodeMp4Samples(
        DocBuild.mp4SampledBytes(ts, durs, sizes, seed))
      assert(got.map(_._1).contains(ts))
      assert(got.exists(g => g._2.toSeq == durs.toSeq &&
        g._3.toSeq == sizes.toSeq), s"mp4 ts=$ts n=$n seed=$seed")
      // And the mvhd reader sees the duration sum.
      assert(Multimodal.decodeMp4Meta(
        DocBuild.mp4SampledBytes(ts, durs, sizes, seed))
        .contains((ts, durs.map(_.toLong).sum * 1000L / ts)))
    }
  }

  test("averageHash matches the closed-form pixel computation") {
    Seq((0, 7, 13), (42, 8, 13), (199, 7, 11), (17, 1, 1)).foreach {
      case (seed, rc, cc) =>
        val (w, h) = (64, 48)
        val got = Multimodal.averageHash(
          DocBuild.bmpPatternBytes(w, h, seed, rc, cc))
        // Recompute from the analytic pattern with integer sums.
        val sums = new Array[Long](64)
        var total = 0L
        for (r <- 0 until h; c <- 0 until w) {
          val v = ((seed + r * rc + c * cc) % 256).toLong
          sums((r / (h / 8)) * 8 + c / (w / 8)) += v
          total += v
        }
        val want = (0 until 64).foldLeft(0L) { (acc, i) =>
          if (sums(i) * 64 > total) acc | (1L << i) else acc
        }
        assert(got.contains(want), s"seed=$seed rc=$rc cc=$cc")
    }
    // Flat image: no cell strictly exceeds the mean -> hash 0.
    assert(Multimodal.averageHash(DocBuild.bmpBytes(64, 48, 100))
      .contains(0L))
    // Identical patterns hash identically; not-a-BMP is None.
    assert(Multimodal.averageHash(Array[Byte](1, 2, 3)).isEmpty)
  }

  test("pixelStats matches the closed-form gradient, handles odd " +
      "widths (row padding) and rejects junk") {
    Seq((0, 7, 3, 17, 13), (42, 1, 1, 16, 16), (199, 5, 9, 33, 7))
      .foreach { case (seed, rc, cc, w, h) =>
        val got = Multimodal.pixelStats(
          DocBuild.bmpPatternBytes(w, h, seed, rc, cc))
        var (sum, minV, maxV) = (0L, 255, 0)
        for (r <- 0 until h; c <- 0 until w) {
          val v = (seed + r * rc + c * cc) % 256
          sum += v
          minV = math.min(minV, v); maxV = math.max(maxV, v)
        }
        assert(got.contains((w.toLong * h, sum, minV, maxV)),
          s"seed=$seed rc=$rc cc=$cc w=$w h=$h: got $got")
      }
    // Flat fill: sum = n * px, min = max = px.
    assert(Multimodal.pixelStats(DocBuild.bmpBytes(10, 4, 77))
      .contains((40L, 40L * 77, 77, 77)))
    assert(Multimodal.pixelStats(Array[Byte](1, 2, 3)).isEmpty)
    // Truncated pixel data must yield None, not a task crash.
    val full = DocBuild.bmpPatternBytes(16, 16, 5, 7, 3)
    assert(Multimodal.pixelStats(full.take(100)).isEmpty)
  }

  test("pcmWindowStats matches the closed-form sawtooth samples") {
    Seq((0, 300), (17, 301), (250, 256), (99, 1)).foreach { case (px, n) =>
      val got = Multimodal.pcmWindowStats(
        DocBuild.wavBytes(1, 8000, 16, n, px), 128).get
      val samples = (0 until n).map { k =>
        val u = ((px + 2 * k) % 256) + 256 * ((px + 2 * k + 1) % 256)
        if (u >= 32768) u - 65536 else u
      }
      val want = samples.grouped(128).zipWithIndex.map { case (w, i) =>
        Multimodal.PcmWindow(i, w.size,
          w.map(s => s.toLong * s).sum, w.map(math.abs).max)
      }.toSeq
      assert(got == want, s"px=$px n=$n")
    }
    // Stereo / 8-bit / junk inputs are rejected, not mis-parsed.
    assert(Multimodal.pcmWindowStats(
      DocBuild.wavBytes(2, 8000, 16, 100, 0), 128).isEmpty)
    assert(Multimodal.pcmWindowStats(
      DocBuild.wavBytes(1, 8000, 8, 100, 0), 128).isEmpty)
    assert(Multimodal.pcmWindowStats(Array[Byte](1, 2), 128).isEmpty)
  }
}
