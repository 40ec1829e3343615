package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  /** Deterministic RGB frame content per (id, frame). */
  private def rgbFrame(id: Long, f: Int, w: Int, h: Int): Array[Byte] =
    Array.tabulate(w * h * 3)(j => ((id * 31 + f * 7 + j) % 251).toByte)

  private def aviFor(id: Long, nFrames: Int = 6, w: Int = 8, h: Int = 8): Array[Byte] =
    Multimodal.encodeAvi(w, h, 5, (0 until nFrames).map(rgbFrame(id, _, w, h)))

  private def media = {
    import spark.implicits._
    (0L until 20L).map(id => MediaRow(id, "video", aviFor(id), Map.empty)).toDS()
  }

  test("REAL video decode: raw-DIB AVI roundtrip is pixel-exact incl. padded odd widths") {
    val rnd = new scala.util.Random(17)
    for (w <- Seq(5, 6, 8); h <- Seq(3, 4)) { // w=5,6 exercise the 4-byte DIB row padding
      val frames = (0 until 3).map(_ => Array.fill(w * h * 3)(rnd.nextInt(256).toByte))
      val avi = Multimodal.encodeAvi(w, h, 10, frames)
      val out = Multimodal.decodeAviBytes(42L, avi)
      assert(out.length === 3, s"${w}x$h: expected 3 frames")
      out.zipWithIndex.foreach { case (fr, i) =>
        assert(fr.width === w && fr.height === h && fr.channels === 3 && fr.frameIdx === i)
        assert(fr.pixels.toSeq === frames(i).toSeq, s"${w}x$h frame $i must roundtrip lossless")
      }
    }
    assert(Multimodal.decodeAviBytes(1L, Array[Byte](1, 2, 3, 4)).isEmpty, "corrupt → no frames")
    assert(Multimodal.decodeAviBytes(2L, Array.empty[Byte]).isEmpty)
    // a WAV payload is RIFF but not AVI: must decode to zero VIDEO frames, not throw
    val wav = Multimodal.encodeWav(8000, 1, Array.tabulate(32)(i => (i * 100).toShort))
    assert(Multimodal.decodeAviBytes(3L, wav).isEmpty)
  }

  test("MJPEG AVI: frame count and geometry survive; truncated payload keeps whole frames") {
    val frames = (0 until 4).map(rgbFrame(7L, _, 16, 8))
    val avi = Multimodal.encodeAvi(16, 8, 10, frames, codec = "mjpeg")
    val out = Multimodal.decodeAviBytes(7L, avi)
    assert(out.length === 4, "every MJPEG frame must decode via javax.imageio")
    assert(out.forall(f => f.width == 16 && f.height == 8 && f.channels == 3))
    // JPEG is lossy: pixels are close, not equal
    val err = out.head.pixels.zip(frames.head).map { case (a, b) => math.abs((a & 0xff) - (b & 0xff)) }
    assert(err.sum.toDouble / err.length < 32.0, "MJPEG decode must be visually close")
    // torn tail: cut inside the LAST movi chunk — earlier whole frames are kept
    val torn = Multimodal.decodeAviBytes(7L, avi.take(avi.length - 10))
    assert(torn.length >= 1 && torn.length < 4, "torn payload keeps only whole earlier frames")
  }

  /** Byte offset of the n-th occurrence (0-based) of a fourcc in an AVI payload. */
  private def fourccAt(bytes: Array[Byte], cc: String, n: Int = 0): Int = {
    val pat = cc.getBytes("US-ASCII")
    var seen = -1
    (0 to bytes.length - 4).find { i =>
      if (pat.indices.forall(j => bytes(i + j) == pat(j))) { seen += 1; seen == n } else false
    }.getOrElse(fail(s"fourcc $cc #$n not found"))
  }

  test("hostile headers: biHeight=0, negative height flag, huge declared sizes never emit degenerate frames") {
    val good = aviFor(9L, nFrames = 2)
    // biHeight := 0 in the vids strf (BITMAPINFOHEADER: biSize at data+0, biWidth at data+4,
    // biHeight at data+8 = chunk+16): the guard must reject the 00db frames entirely — an
    // empty-pixels Frame would crash resize downstream
    val zeroH = good.clone()
    val strf = fourccAt(zeroH, "strf")
    for (j <- 0 until 4) zeroH(strf + 16 + j) = 0
    assert(Multimodal.decodeAviBytes(9L, zeroH).isEmpty, "biHeight=0 must emit no frames")
    locally {
      import spark.implicits._
      val ds = Seq(MediaRow(9L, "video", zeroH, Map.empty)).toDS()
      assert(Multimodal.resize(Multimodal.decodeFrames(ds), 4, 4).count() === 0L,
        "decodeFrames → resize must not throw on the degenerate header")
    }
    // declared chunk size near Int.MaxValue: the long-arithmetic walk must neither wrap negative
    // nor throw, and must keep frames decoded before the hostile chunk
    val hugeSz = good.clone()
    val secondDb = fourccAt(hugeSz, "00db", 1)
    hugeSz(secondDb + 4) = -1; hugeSz(secondDb + 5) = -1; hugeSz(secondDb + 6) = -1; hugeSz(secondDb + 7) = 0x7f
    val kept = Multimodal.decodeAviBytes(9L, hugeSz)
    assert(kept.length === 1, "frame before the hostile-size chunk is kept")
    assert(kept.head.pixels.toSeq === rgbFrame(9L, 0, 8, 8).toSeq)
    // 20k nested 12-byte LIST headers: the walk must hit its depth cap, not StackOverflowError
    // (an Error the decoder's Exception-only catch deliberately does not swallow)
    val levels = 20000
    val nested = new Array[Byte](12 + 12 * levels)
    def put(o: Int, cc: String, sz: Int, t: String): Unit = {
      System.arraycopy(cc.getBytes("US-ASCII"), 0, nested, o, 4)
      nested(o + 4) = (sz & 0xff).toByte; nested(o + 5) = ((sz >> 8) & 0xff).toByte
      nested(o + 6) = ((sz >> 16) & 0xff).toByte; nested(o + 7) = ((sz >> 24) & 0xff).toByte
      System.arraycopy(t.getBytes("US-ASCII"), 0, nested, o + 8, 4)
    }
    put(0, "RIFF", nested.length - 8, "AVI ")
    var o = 12
    while (o < nested.length) { put(o, "LIST", nested.length - o - 8, "hdrl"); o += 12 }
    assert(Multimodal.decodeAviBytes(9L, nested).isEmpty, "deep LIST nesting must be benign")
  }

  test("rotten mid-stream MJPEG chunk is skipped; frames before AND after it survive") {
    val frames = (0 until 3).map(rgbFrame(11L, _, 16, 8))
    val avi = Multimodal.encodeAvi(16, 8, 10, frames, codec = "mjpeg")
    val rotten = avi.clone()
    val midChunk = fourccAt(rotten, "00dc", 1)
    for (j <- 0 until 8) rotten(midChunk + 8 + j) = 0x55 // destroy the JPEG magic of frame 1
    val out = Multimodal.decodeAviBytes(11L, rotten)
    assert(out.length === 2, "frames 0 and 2 must survive a bit-rotted frame 1")
    assert(out.map(_.frameIdx) === Seq(0, 1), "kept frames are re-indexed densely")
    assert(out.forall(f => f.width == 16 && f.height == 8 && f.pixels.length == 16 * 8 * 3))
  }

  test("decode → sample → resize → features keeps shapes and is deterministic") {
    val frames = Multimodal.decodeFrames(media, frameCount = 6)
    assert(frames.count() === 120)
    val sampled = Multimodal.sampleFrames(frames, stride = 2)
    assert(sampled.count() === 60)
    val resized = Multimodal.resize(sampled, 4, 4)
    val r = resized.head()
    assert(r.width === 4 && r.height === 4 && r.pixels.length === 4 * 4 * 3)
    val feats = Multimodal.features(resized, dims = 16)
    assert(feats.count() === 60)
    val v = feats.orderBy("id", "frame_idx").head().getAs[scala.collection.Seq[Float]]("vec").toList
    assert(v.length === 16)
    assert(math.abs(v.sum - 1.0f) < 1e-4, "histogram features are normalized")
    // determinism: same input → same features
    val v2 = Multimodal.features(Multimodal.resize(
      Multimodal.sampleFrames(Multimodal.decodeFrames(media, 6), 2), 4, 4), 16)
      .orderBy("id", "frame_idx").head().getAs[scala.collection.Seq[Float]]("vec").toList
    assert(v === v2)
  }

  test("REAL image decode: PNG roundtrip returns exact pixels; corrupt bytes emit no frame") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val originals = (0L until 10L).map { id =>
      val w = 5 + rnd.nextInt(12); val h = 3 + rnd.nextInt(9)
      val px = Array.fill(w * h * 3)(rnd.nextInt(256).toByte)
      (id, w, h, px, Multimodal.encodePng(w, h, px))
    }
    val mediaDs = originals.map { case (id, _, _, _, png) => MediaRow(id, "image", png, Map.empty) }
      .toDS()
    val corrupt = Seq(MediaRow(99L, "image", Array[Byte](1, 2, 3, 4), Map.empty),
      MediaRow(98L, "image", Array.empty[Byte], Map.empty)).toDS()
    val frames = Multimodal.decodeFrames(mediaDs.union(corrupt)).collect().sortBy(_.id)
    assert(frames.length === 10, "corrupt payloads must emit no frame, real PNGs exactly one")
    frames.zip(originals).foreach { case (f, (id, w, h, px, _)) =>
      assert(f.id === id && f.width === w && f.height === h && f.channels === 3)
      assert(f.pixels.toSeq === px.toSeq, s"PNG decode must be lossless (id=$id)")
    }
  }

  test("real decoded image flows through resize + features into similarity") {
    import spark.implicits._
    // two identical images and one very different one: nearest neighbor must pick the twin
    val a = Array.tabulate(16 * 16 * 3)(j => (j % 251).toByte)
    val b = Array.tabulate(16 * 16 * 3)(j => (255 - j % 13).toByte)
    val ds = Seq(MediaRow(0L, "image", Multimodal.encodePng(16, 16, a), Map.empty),
      MediaRow(1L, "image", Multimodal.encodePng(16, 16, a), Map.empty),
      MediaRow(2L, "image", Multimodal.encodePng(16, 16, b), Map.empty)).toDS()
    val feats = Multimodal.features(Multimodal.resize(Multimodal.decodeFrames(ds), 8, 8), dims = 8)
      .select(col("id"), col("vec"))
    val top = graft.functions.Similarity.bruteForceTopK(feats, feats.filter(col("id") === 0), k = 2)
      .orderBy("rank").collect()
    assert(top(0).getAs[Long]("neighbor_id") === 1L, "identical image must rank first")
  }

  test("feature vectors plug into the similarity ops") {
    val feats = Multimodal.features(Multimodal.decodeFrames(media, 2), dims = 8)
      .filter(col("frame_idx") === 0)
      .select((col("id")).as("id"), col("vec"))
    val top = graft.functions.Similarity.bruteForceTopK(feats, feats.filter(col("id") < 2), k = 3)
    assert(top.count() === 6)
  }

  test("REAL audio decode: WAV roundtrip is sample-exact (mono + stereo); corrupt bytes → None") {
    val rnd = new scala.util.Random(31)
    for (channels <- Seq(1, 2); rate <- Seq(8000, 44100)) {
      val samples = Array.fill(256 * channels)(rnd.nextInt(65536).toShort)
      val wav = Multimodal.encodeWav(rate, channels, samples)
      val clip = Multimodal.decodeWavBytes(7L, wav).getOrElse(fail("WAV must decode"))
      assert(clip.sampleRate === rate && clip.channels === channels)
      assert(clip.samples === samples, s"PCM roundtrip must be lossless (ch=$channels rate=$rate)")
    }
    assert(Multimodal.decodeWavBytes(8L, Array[Byte](1, 2, 3, 4)).isEmpty)
    assert(Multimodal.decodeWavBytes(9L, Array.empty[Byte]).isEmpty)
  }

  test("audio kind in decodeFrames: real WAV decode windowed into frames, byte-exact PCM") {
    import spark.implicits._
    val samples = Array.tabulate(100)(i => (i * 300 - 15000).toShort)
    val wav = Multimodal.encodeWav(16000, 1, samples)
    val ds = spark.createDataset(Seq(
      MediaRow(1L, "audio", wav, Map.empty),
      MediaRow(2L, "audio", Array[Byte](9, 9, 9), Map.empty))) // corrupt → 0 frames
    val frames = Multimodal.decodeFrames(ds, frameCount = 4).collect().sortBy(_.frameIdx)
    assert(frames.forall(_.id == 1L), "corrupt audio payload must emit no frames")
    assert(frames.length === 4 && frames.forall(_.height == 1) && frames.forall(_.channels == 1))
    // reassemble the PCM stream from the frame windows and compare sample-exactly
    val back = frames.flatMap { f =>
      (0 until f.width).map(j => ((f.pixels(2 * j) & 0xff) | (f.pixels(2 * j + 1) << 8)).toShort)
    }
    assert(back === samples)
  }

  test("stereo audio windows never split an interleaved channel pair; Frame contract holds") {
    import spark.implicits._
    // 50 stereo frames = 100 interleaved samples; frameCount 4 → 13,13,13,11 frames per window
    val samples = Array.tabulate(100)(i => (i * 123 - 6000).toShort)
    val wav = Multimodal.encodeWav(16000, 2, samples)
    val ds = spark.createDataset(Seq(MediaRow(1L, "audio", wav, Map.empty)))
    val frames = Multimodal.decodeFrames(ds, frameCount = 4).collect().sortBy(_.frameIdx)
    assert(frames.map(_.width).sum === 50, "windows must cover all 50 audio frames")
    frames.foreach { f =>
      assert(f.channels === 2)
      assert(f.pixels.length === f.width * f.height * f.channels * 2,
        "pixels must be width × height × channels × 2 bytes (the image-frame contract)")
    }
    val back = frames.flatMap { f =>
      (0 until f.width * 2).map(j => ((f.pixels(2 * j) & 0xff) | (f.pixels(2 * j + 1) << 8)).toShort)
    }
    assert(back === samples, "reassembled interleaved stream must be sample-exact")
  }
}
