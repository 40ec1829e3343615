package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Opaque media payload with typed metadata — the multimodal column convention: media travels as
  * `binary`, structure lives in columns.
  */
final case class MediaRow(
    id: Long,
    kind: String, // image | audio | video
    payload: Array[Byte],
    meta: Map[String, String])

/** Decoded-frame record (the batch shape a real decoder would emit). */
final case class Frame(
    id: Long,
    frameIdx: Int,
    width: Int,
    height: Int,
    channels: Int,
    pixels: Array[Byte])

/** Decoded audio: 16-bit signed PCM samples (interleaved when multi-channel). */
final case class AudioClip(id: Long, sampleRate: Int, channels: Int, samples: Array[Short])

/** Multimodal plumbing for training-data pipelines.
  *
  * IMAGE decode is REAL (`javax.imageio`: PNG/BMP/JPEG/GIF) and AUDIO decode is REAL
  * (`javax.sound.sampled`: WAV/AU/AIFF PCM — also in-JDK). VIDEO is the one remaining STUB (no
  * video codec ships in the JDK or this container), implemented as a deterministic pseudo-decode
  * so the Spark-side contract stays real and testable for every kind: schemas, `mapPartitions`
  * batching (one decoder init per partition, the JVM analog of a Pandas `mapInPandas` UDF),
  * partition sizing, and the feature-extraction shapes downstream ops consume.
  * Corrupt/undecodable image/audio payloads emit no frame (at 10^12-row scale corrupt media is
  * routine; a throwing decoder would kill the stage).
  */
object Multimodal {

  /** Decode one image payload to an RGB [[Frame]] (frameIdx 0). None on undecodable bytes. */
  def decodeImageBytes(id: Long, bytes: Array[Byte]): Option[Frame] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val (w, h) = (img.getWidth, img.getHeight)
        val px = new Array[Byte](w * h * 3)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y) // sRGB int — lossless for PNG/BMP sources
            val o = (y * w + x) * 3
            px(o) = ((rgb >> 16) & 0xff).toByte
            px(o + 1) = ((rgb >> 8) & 0xff).toByte
            px(o + 2) = (rgb & 0xff).toByte
            x += 1
          }
          y += 1
        }
        Some(Frame(id, 0, w, h, 3, px))
      }
    } catch { case _: Exception => None }

  /** Encode an RGB pixel buffer as PNG bytes (lossless — decode(encode(px)) == px). */
  def encodePng(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == w * h * 3, s"expected ${w * h * 3} RGB bytes, got ${rgb.length}")
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val o = (y * w + x) * 3
        val rgbInt = ((rgb(o) & 0xff) << 16) | ((rgb(o + 1) & 0xff) << 8) | (rgb(o + 2) & 0xff)
        img.setRGB(x, y, rgbInt)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Decode one audio payload (WAV/AU/AIFF — any format `javax.sound.sampled` recognizes) to
    * 16-bit signed PCM, preserving sample rate and channel count (non-16-bit / big-endian /
    * float sources are converted through the JDK's codec chain). None on undecodable bytes.
    */
  def decodeWavBytes(id: Long, bytes: Array[Byte]): Option[AudioClip] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val base = in.getFormat
      val target = new javax.sound.sampled.AudioFormat(
        javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
        base.getSampleRate, 16, base.getChannels, base.getChannels * 2, base.getSampleRate,
        /* bigEndian = */ false)
      val pcm = javax.sound.sampled.AudioSystem.getAudioInputStream(target, in)
      val raw = pcm.readAllBytes()
      val samples = new Array[Short](raw.length / 2)
      var i = 0
      while (i < samples.length) {
        samples(i) = ((raw(2 * i) & 0xff) | (raw(2 * i + 1) << 8)).toShort
        i += 1
      }
      Some(AudioClip(id, target.getSampleRate.toInt, target.getChannels, samples))
    } catch { case _: Exception => None }

  /** Encode 16-bit PCM samples as a WAV payload (lossless — decodeWav(encodeWav(s)) == s). */
  def encodeWav(sampleRate: Int, channels: Int, samples: Array[Short]): Array[Byte] = {
    require(samples.length % channels == 0, "sample count must be a multiple of channels")
    val raw = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      raw(2 * i) = (samples(i) & 0xff).toByte
      raw(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate.toFloat, 16, channels,
      /* signed = */ true, /* bigEndian = */ false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(raw), fmt, (samples.length / channels).toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** Frame decoder, routed by `kind`:
    *  - `image` → REAL javax.imageio decode, one RGB frame per payload (undecodable → 0 frames);
    *  - `audio` → REAL javax.sound.sampled decode to 16-bit PCM, windowed into up to
    *    `frameCount` equal sample windows: width = window length in samples, height = 1,
    *    channels = audio channels, pixels = little-endian PCM bytes (undecodable → 0 frames);
    *  - `video` → STUB pseudo-decode (no JDK video codec), `frameCount` deterministic frames.
    */
  def decodeFrames(ds: Dataset[MediaRow], frameCount: Int = 4): Dataset[Frame] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      // per-partition decoder init (once, not per row): no disk-backed ImageIO scratch cache —
      // executor-local tmp on a busy node is a straggler source, and frames fit in memory
      javax.imageio.ImageIO.setUseCache(false)
      rows.flatMap {
        case m if m.kind == "image" => decodeImageBytes(m.id, m.payload).iterator
        case m if m.kind == "audio" =>
          decodeWavBytes(m.id, m.payload).iterator.flatMap { clip =>
            // window in whole AUDIO FRAMES (one sample per channel), never splitting an
            // interleaved channel group: width = frames per window, so the Frame contract
            // pixels.length == width × height × channels × 2 holds like it does for images
            val ch = math.max(1, clip.channels)
            val audioFrames = clip.samples.length / ch
            val perWindow = math.max(1, (audioFrames + frameCount - 1) / math.max(1, frameCount))
            // trim to whole channel groups FIRST: a malformed stream whose PCM byte count isn't
            // frame-aligned would otherwise give the last window a length not divisible by ch,
            // breaking the pixels.length == width*height*channels*2 contract
            val aligned =
              if (clip.samples.length == audioFrames * ch) clip.samples
              else clip.samples.take(audioFrames * ch)
            aligned.grouped(perWindow * ch).zipWithIndex.map { case (w, i) =>
              val b = new Array[Byte](w.length * 2)
              var j = 0
              while (j < w.length) {
                b(2 * j) = (w(j) & 0xff).toByte
                b(2 * j + 1) = ((w(j) >> 8) & 0xff).toByte
                j += 1
              }
              Frame(m.id, i, w.length / ch, 1, clip.channels, b)
            }
          }
        case m => // video pseudo-decode (STUB, no JDK video codec)
          val w = 8 + math.floorMod(m.payload.length, 8)
          val h = 8
          (0 until frameCount).iterator.map { i =>
            val px = Array.tabulate(w * h * 3)(j =>
              (m.payload(math.floorMod(i * 31 + j, math.max(1, m.payload.length))) ^ i).toByte)
            Frame(m.id, i, w, h, 3, px)
          }
      }
    }
  }

  /** Nearest-neighbor resize over the RGB pixel buffer — real on decoded image frames,
    * partition-parallel.
    */
  def resize(frames: Dataset[Frame], outW: Int, outH: Int): Dataset[Frame] = {
    import frames.sparkSession.implicits._
    frames.map { f =>
      val px = Array.tabulate(outW * outH * f.channels) { j =>
        val c = j % f.channels
        val xy = j / f.channels
        val sx = (xy % outW) * f.width / outW
        val sy = (xy / outW) * f.height / outH
        f.pixels((sy * f.width + sx) * f.channels + c)
      }
      Frame(f.id, f.frameIdx, outW, outH, f.channels, px)
    }
  }

  /** Frame sampling: keep every `stride`-th frame (pure column op, no decode). */
  def sampleFrames(frames: Dataset[Frame], stride: Int): Dataset[Frame] =
    frames.filter(f => f.frameIdx % stride == 0)

  /** Feature extraction: per-frame byte-histogram as a fixed-width Float vector — the
    * `Array[Float]` embedding shape the Similarity ops consume (real pixels in, real features
    * out for images; a learned featurizer would slot in behind the same signature).
    */
  def features(frames: Dataset[Frame], dims: Int = 16): DataFrame = {
    import frames.sparkSession.implicits._
    frames.map { f =>
      val v = new Array[Float](dims)
      var j = 0
      while (j < f.pixels.length) { v(math.floorMod(f.pixels(j), dims)) += 1.0f; j += 1 }
      val n = math.max(1, f.pixels.length).toFloat
      (f.id, f.frameIdx, v.map(_ / n))
    }.toDF("id", "frame_idx", "vec")
  }

  /** Wrap any (id, binary) DataFrame into MediaRows. */
  def fromBinary(df: DataFrame, kind: String): Dataset[MediaRow] = {
    import df.sparkSession.implicits._
    df.select(col("id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .map { case (id, b) => MediaRow(id, kind, b, Map("bytes" -> b.length.toString)) }
  }
}
